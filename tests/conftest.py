"""Test configuration: run on 8 virtual CPU devices.

Multi-chip behavior (pjit sharding, psum metrics, all_gather) is validated on
a host-platform device mesh, substituting for a real TPU pod slice
(SURVEY.md §4).  Must set flags before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A plugin may have imported jax before this conftest ran; the config update
# still takes effect as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: XLA:CPU caches executables on this image;
# repeat suite runs skip the multi-minute model-step compiles.  CPU entries
# live in a host-feature-keyed subdir (compilation_cache_dir) so an
# executable built for another driver host's ISA can never be handed back
# here (the SIGILL-risk warning in MULTICHIP_r04.json).
try:
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    from procedurevrl_tpu.utils.parser import compilation_cache_dir

    _cache = compilation_cache_dir()
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # cache is an optimization, never a test dependency
    pass

