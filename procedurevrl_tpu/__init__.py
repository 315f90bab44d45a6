"""TPU-native ProcedureVRL: procedure-aware video-language pretraining in JAX.

A ground-up JAX/XLA/Pallas/pjit re-design of facebookresearch/ProcedureVRL
(CVPR 2023): TimeSformer / MViT-v2 video encoders aligned to a CLIP text
space, a diffusion transformer over step sequences, and the COIN /
EPIC-Kitchens zero-shot + finetuning evaluation suite.
"""

__version__ = "0.1.0"
