"""Environment setup hook (reference ``lib/utils/env.py:10-15``).

The reference exposes a no-op ``setup_environment`` for downstream forks to
patch; preserved here, plus the TPU-relevant setup that IS needed: platform
selection and the persistent compilation cache.
"""

from __future__ import annotations


def setup_environment() -> None:
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()
