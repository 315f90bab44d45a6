"""Logging (reference ``lib/utils/logging.py:18-95``).

Master-process-only python logging to stdout + ``OUTPUT_DIR/stdout.log``,
JSON stats lines in the reference's ``json_stats: {...}`` format so existing
log-scraping tooling keeps working.  "Master" is ``jax.process_index() == 0``
(the reference used torch.distributed rank).
"""

from __future__ import annotations

import builtins
import decimal
import functools
import logging
import os
import sys
from typing import Any, Dict

import simplejson


def _suppress_print():
    def ignore(*args, **kwargs):
        pass

    builtins.print = ignore


def _is_master() -> bool:
    """Master check WITHOUT initializing a jax backend: get_logger() runs at
    module-import time (before load_config selects the platform), and
    ``jax.process_index()`` would eagerly initialize the highest-priority
    backend — on this image the axon TPU plugin, which blocks every CLI tool
    (even pure-CPU runs) whenever the tunnel is unreachable.  The distributed
    global state carries the process id (0 unless ``jax.distributed`` is up)
    with no backend involvement."""
    from jax._src import distributed

    return getattr(distributed.global_state, "process_id", 0) in (0, None)


@functools.lru_cache(maxsize=None)
def _configure(output_dir: str = ""):
    is_master = _is_master()
    logger = logging.getLogger("procedurevrl_tpu")
    logger.setLevel(logging.DEBUG if is_master else logging.ERROR)
    logger.propagate = False
    # reconfiguring (e.g. get_logger() warmed the bare config, then
    # setup_logging(OUTPUT_DIR) runs) replaces handlers instead of stacking
    for h in list(logger.handlers):
        logger.removeHandler(h)
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    if is_master:
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        _suppress_print()
    return logger


def setup_logging(output_dir: str = "") -> logging.Logger:
    return _configure(output_dir)


def get_logger(name: str = "") -> logging.Logger:
    base = logging.getLogger("procedurevrl_tpu")
    if not base.handlers:
        _configure("")
    return base


def log_json_stats(stats: Dict[str, Any]) -> None:
    """reference ``lib/utils/logging.py:83-95``."""
    stats = {
        k: decimal.Decimal(f"{v:.5f}") if isinstance(v, float) else v
        for k, v in stats.items()
    }
    json_stats = simplejson.dumps(stats, sort_keys=True, use_decimal=True)
    get_logger().info("json_stats: {:s}".format(json_stats))
