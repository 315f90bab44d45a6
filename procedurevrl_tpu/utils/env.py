"""Environment setup hook (reference ``lib/utils/env.py:10-15``).

The reference exposes a no-op ``setup_environment`` for downstream forks to
patch; preserved here, plus the TPU-relevant setup that IS needed: platform
selection and the persistent compilation cache.
"""

from __future__ import annotations

import os
import warnings


def setup_environment() -> None:
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()


_warned: set = set()


def env_flag(name: str, default: bool) -> bool:
    """Read a boolean 0/1 env knob; warn ONCE on any other value.

    The perf knobs (``MVIT_SAVE_PROBS``, ``SPATIAL_FUSED_QKV``, ...) accept
    exactly "0"/"1" — a stale ``true`` left in a queue script would
    otherwise silently select the default path."""
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    if raw in ("0", "1"):
        return raw == "1"
    if name not in _warned:
        _warned.add(name)
        warnings.warn(
            f"{name}={raw!r} is not '0' or '1'; using the default "
            f"({int(default)}). Set {name}=0 or {name}=1 explicitly.",
            stacklevel=2,
        )
    return default
