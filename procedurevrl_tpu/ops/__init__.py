from procedurevrl_tpu.ops.attention import attention_core, mhsa, mhsa_xla
from procedurevrl_tpu.ops.pallas_attention import flash_attention_headfused, flash_mhsa

__all__ = [
    "attention_core",
    "mhsa",
    "mhsa_xla",
    "flash_attention_headfused",
    "flash_mhsa",
]
