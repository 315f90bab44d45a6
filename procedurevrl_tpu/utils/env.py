"""Environment setup hook (reference ``lib/utils/env.py:10-15``).

The reference exposes a no-op ``setup_environment`` for downstream forks to
patch; preserved here, plus the TPU-relevant setup that IS needed: platform
selection and the persistent compilation cache.
"""

from __future__ import annotations

import os


def setup_environment() -> None:
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()


_TRUE = ("1", "true", "yes", "on")
_FALSE = ("0", "false", "no", "off")


def env_flag(name: str, default: bool) -> bool:
    """Read a boolean env knob; RAISE on an unrecognized value.

    The perf knobs (``MVIT_SAVE_PROBS``, ``SPATIAL_FUSED_QKV``, ...) accept
    0/1/true/false/yes/no/on/off (case-insensitive).  Anything else raises:
    a malformed knob silently selecting the default path would invalidate a
    measurement round (a stale ``tru`` in a queue script must fail loudly,
    not measure the wrong variant)."""
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    low = raw.strip().lower()
    if low in _TRUE:
        return True
    if low in _FALSE:
        return False
    raise ValueError(
        f"{name}={raw!r} is not a recognized boolean "
        f"({'/'.join(_TRUE)} or {'/'.join(_FALSE)}). Refusing to guess — "
        f"a wrong perf knob invalidates the measurement."
    )
