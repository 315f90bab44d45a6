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

