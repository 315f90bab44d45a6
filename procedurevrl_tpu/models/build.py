"""Model registry and builder (reference ``lib/models/build.py:8-54``).

``build_model(cfg)`` returns ``(module, label_emb)`` where ``label_emb`` is
the L2-normalized step-candidate bank (or None).  Instead of DDP-wrapping,
distribution happens at the train-step level via pjit sharding
(``parallel/mesh.py``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def load_embedding_bank(path: str) -> np.ndarray:
    """Load a step-candidate embedding bank (.pth via torch, or .npy/.npz).

    The reference stores CLIP text embeddings as torch tensors
    (``data/clip_step_emb_coin.pth``, 778x512; reference
    ``lib/models/vit.py:232,239``).
    """
    if path.endswith((".npy",)):
        arr = np.load(path)
    elif path.endswith(".npz"):
        arr = np.load(path)["emb"]
    else:
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        arr = t.detach().float().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.asarray(arr, dtype=np.float32)


def normalize_bank(arr: np.ndarray) -> np.ndarray:
    """L2-normalize rows (the reference normalizes the bank once on device
    transfer, ``lib/models/vit.py:435-440``)."""
    return arr / np.linalg.norm(arr, axis=1, keepdims=True)


def _common_kwargs(cfg) -> dict:
    is_pretrain = cfg.TRAIN.LABEL_EMB != ""
    match_lang = bool(cfg.DEV.MATCH_LANG_EMB or is_pretrain)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return dict(
        num_classes=cfg.MODEL.NUM_CLASSES,
        temp=cfg.DEV.TEMP,
        match_lang_emb=match_lang,
        order_pretrain=cfg.DEV.ORDER_PRETRAIN_ENABLED,
        order_max_len=cfg.DEV.ORDER_PRETRAIN_MAX_LEN,
        order_tfm_layers=cfg.DEV.ORDER_TFM_LAYERS,
        order_recog_batch=cfg.DEV.ORDER_RECOG_BATCH,
        num_seg=cfg.MODEL.NUM_SEG,
        with_text_model=cfg.MODEL.TEXT_MODEL == "clip_vit_b_16",
        text_layers=cfg.DEV.TEXT_LAYERS,
        epic_heads=cfg.TRAIN.DATASET == "Epickitchens" and not match_lang,
        drop_e=cfg.MODEL.DROP_E,
        dtype=dtype,
        use_pallas=cfg.TPU.USE_PALLAS_ATTENTION,
        remat=cfg.TPU.REMAT,
        remat_save_qkv=cfg.TPU.REMAT_SAVE_QKV,
        remat_save_attn=cfg.TPU.REMAT_SAVE_ATTN,
        remat_save_temporal=cfg.TPU.REMAT_SAVE_TEMPORAL,
    )


@register_model("vit_base_patch16_224_develop")
def _build_timesformer(cfg):
    """TimeSformer-B ProcedureVRL (reference ``lib/models/vit.py:473-506``)."""
    from procedurevrl_tpu.models.procedurevrl import ProcedureVRL

    return ProcedureVRL(
        encoder_name="timesformer",
        img_size=cfg.DATA.TRAIN_CROP_SIZE,
        patch_size=16,
        embed_dim=768,
        depth=cfg.TIMESFORMER.DEPTH,
        num_heads=12,
        num_frames=cfg.DATA.NUM_FRAMES,
        attention_type=cfg.TIMESFORMER.ATTENTION_TYPE,
        drop_path_rate=cfg.MODEL.DROP_PATH,
        **_common_kwargs(cfg),
    )


@register_model("MViT")
def _build_mvit(cfg):
    """MViT-v2 ProcedureVRL (reference ``lib/models/mvit.py:231-264``)."""
    from procedurevrl_tpu.models.mvit import MViTConfig
    from procedurevrl_tpu.models.procedurevrl import ProcedureVRL

    return ProcedureVRL(
        encoder_name="mvit",
        num_frames=cfg.DATA.NUM_FRAMES,
        mvit_cfg=MViTConfig.from_cfg(cfg),
        **_common_kwargs(cfg),
    )


def _build_resnet_family(cls_name):
    def build(cfg):
        from procedurevrl_tpu.models import resnet_video as rv

        dtype = (
            jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        )
        cls = {"SlowFast": rv.SlowFastModel, "ResNet": rv.ResNetModel,
               "X3D": rv.X3DModel}[cls_name]
        return cls(rc=rv.ResNetFamilyConfig.from_cfg(cfg), dtype=dtype)

    return build


# Dormant-in-reference backbones, carried for full capability parity
# (reference ``lib/models/video_model_builder.py:152,424,623``).
MODEL_REGISTRY["SlowFast"] = _build_resnet_family("SlowFast")
MODEL_REGISTRY["ResNet"] = _build_resnet_family("ResNet")
MODEL_REGISTRY["X3D"] = _build_resnet_family("X3D")


def build_model(cfg) -> Tuple[object, Optional[np.ndarray]]:
    name = cfg.MODEL.MODEL_NAME
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model {name}; registered: {list(MODEL_REGISTRY)}")
    model = MODEL_REGISTRY[name](cfg)

    label_emb = None
    emb_path = cfg.TRAIN.LABEL_EMB or cfg.DEV.TEST_LANG_EMB
    if getattr(model, "match_lang_emb", False) and emb_path:
        if os.path.exists(emb_path):
            label_emb = normalize_bank(load_embedding_bank(emb_path))
        elif cfg.DEV.LOAD_DUMMY_DATA:
            rng = np.random.RandomState(0)
            label_emb = normalize_bank(
                rng.randn(cfg.MODEL.NUM_CLASSES, 512).astype(np.float32)
            )
        else:
            raise FileNotFoundError(f"Step bank not found: {emb_path}")
    return model, label_emb
