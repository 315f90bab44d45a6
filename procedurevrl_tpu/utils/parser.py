"""CLI argument parsing and config loading.

Same public surface as the reference ``lib/utils/parser.py:12-93``:
``parse_args()`` exposing ``--cfg YAML`` plus trailing ``KEY VALUE`` override
pairs, and ``load_config(args)`` performing defaults -> YAML -> CLI merge.
"""

from __future__ import annotations

import argparse
import sys

from procedurevrl_tpu.config import get_cfg


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native ProcedureVRL training and testing pipeline."
    )
    parser.add_argument(
        "--shard_id",
        help="The shard id of the current host (0-based).",
        default=0,
        type=int,
    )
    parser.add_argument(
        "--num_shards",
        help="Number of hosts in the job.",
        default=1,
        type=int,
    )
    parser.add_argument(
        "--init_method",
        help="Coordinator address for jax.distributed (host:port).",
        default="",
        type=str,
    )
    parser.add_argument(
        "--cfg",
        dest="cfg_file",
        help="Path to the config file.",
        default=None,
        type=str,
    )
    parser.add_argument(
        "opts",
        help="See procedurevrl_tpu/config/defaults.py for all options.",
        default=None,
        nargs=argparse.REMAINDER,
    )
    if argv is None:
        argv = sys.argv[1:]
    if len(argv) == 0:
        parser.print_help()
    return parser.parse_args(argv)


def load_config(args):
    """Build the config: defaults -> YAML overlay -> CLI KEY VALUE overrides."""
    import os

    # Honor JAX_PLATFORMS even when a platform plugin (axon) is registered:
    # the env var alone doesn't always win, the config flag does.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    enable_compilation_cache()

    cfg = get_cfg()
    if getattr(args, "cfg_file", None):
        cfg.merge_from_file(args.cfg_file)
    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)

    if hasattr(args, "num_shards") and hasattr(args, "shard_id"):
        cfg.NUM_SHARDS = args.num_shards
        cfg.SHARD_ID = args.shard_id
    if getattr(args, "init_method", ""):
        cfg.TPU.COORDINATOR_ADDRESS = args.init_method

    if cfg.TPU.MESH_MODEL > 1:
        # tensor parallelism keeps the split-q/k/v spatial kernel: its
        # channel axis shards by whole head groups, while the fused-qkv
        # window layout (ops/attention.py:mhsa_cls, default path) would
        # replicate lanes.  Centralized here so EVERY tool (train, test,
        # feat_extract, profile_bench, ...) sees the same gating;
        # setdefault keeps an explicit user override in force.
        os.environ.setdefault("SPATIAL_FUSED_QKV", "0")

    # re-validate the MERGED config: get_cfg() only validated the defaults,
    # before the YAML/CLI overrides landed
    from procedurevrl_tpu.config.defaults import _assert_and_infer_cfg

    return _assert_and_infer_cfg(cfg)


def _current_platform() -> str:
    """First configured JAX platform ('' when unset and no env override)."""
    import os

    import jax

    return (jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS") or "").split(",")[0]


def compilation_cache_dir(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """Platform- and host-feature-keyed persistent-cache directory.

    XLA:CPU executables embed host ISA features (AVX level etc.); a cache
    shared across driver host types can hand a foreign executable back
    ("could lead to execution errors such as SIGILL" warning in
    MULTICHIP_r04.json).  CPU entries therefore live in a subdir keyed on
    machine + a hash of the CPU feature flags.  TPU entries stay at the
    base dir (they execute on the chip, not the host, and moving them
    would cold-start the 10-25 min full-model compiles)."""
    import hashlib
    import os
    import platform as _platform

    base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    if _current_platform() != "cpu":
        return base
    # Key on the flag set AND the model identity: LLVM tuning features
    # (e.g. prefer-no-scatter/prefer-no-gather) are derived from the CPU
    # model, so two hosts with identical cpuinfo flags but different
    # models still produce incompatible AOT executables (observed: the
    # feature-mismatch warning recurred inside a flags-keyed dir).
    parts = []
    try:
        with open(cpuinfo_path) as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "vendor_id", "cpu family", "model",
                           "model name", "stepping"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())
                                          if key == "flags"
                                          else line.split(":", 1)[1].split()))
                if len(parts) == 6:
                    break
    except OSError:
        pass
    feat = hashlib.sha1("|".join(parts).encode()).hexdigest()[:8]
    return os.path.join(base, f"cpu-{_platform.machine()}-{feat}")


def enable_compilation_cache():
    """Persistent XLA compilation cache: full-model train steps take minutes
    to compile; cache hits make reruns near-instant."""
    import os

    import jax

    cache_dir = compilation_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
