"""Cross-cutting helpers (reference ``lib/utils/misc.py``).

``launch_job`` is intentionally simpler than the reference's
``torch.multiprocessing.spawn`` (one process per GPU,
reference ``:272-300``): on TPU one process drives all local chips, so the
"launcher" is just ``jax.distributed`` initialization for multi-host plus a
direct call.  Multi-host rendezvous uses the coordinator address from
``cfg.TPU`` (the reference's TCP init method).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np

from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


class NaNLossError(RuntimeError):
    pass


def check_nan_losses(loss: float) -> None:
    """Hard abort on NaN loss (reference ``lib/utils/misc.py:25-32``)."""
    if math.isnan(loss):
        raise NaNLossError("ERROR: Got NaN losses")


def params_count(params) -> int:
    """Total parameter count (reference ``:35-46``)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flops_count_timesformer(cfg) -> float:
    """Analytic forward GFLOPs for the TimeSformer encoder (the reference
    counts with fvcore at startup, ``:126-158``; here closed-form)."""
    T = cfg.DATA.NUM_FRAMES
    S = (cfg.DATA.TRAIN_CROP_SIZE // 16) ** 2
    D, depth = 768, cfg.TIMESFORMER.DEPTH
    per_block = (
        # qkv + proj for two attentions
        2 * (S * T) * 4 * D * D * 2
        # temporal attention scores+values
        + 2 * S * T * T * D * 2
        # spatial attention
        + 2 * T * (S + 1) * (S + 1) * D * 2
        # mlp
        + 2 * (S * T) * 8 * D * D
    )
    stem = 2 * (S * T) * (16 * 16 * 3) * D
    return (stem + depth * per_block) / 1e9


def log_model_info(params, cfg) -> None:
    """reference ``:161-186``."""
    logger.info("Params: {:,}".format(params_count(params)))
    logger.info("Encoder fwd GFLOPs/clip: {:.1f}".format(flops_count_timesformer(cfg)))
    mem = 0.0
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem = stats.get("bytes_in_use", 0) / 1024 ** 3
    except Exception:
        pass
    logger.info("Mem: {:,} GB".format(mem))


def is_eval_epoch(cfg, cur_epoch: int) -> bool:
    """reference ``:189-203`` (no multigrid)."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def init_distributed(cfg) -> None:
    """Multi-host bring-up: the reference's process-group init
    (reference ``lib/utils/multiprocessing.py:44-58``) becomes
    ``jax.distributed.initialize``."""
    if cfg.TPU.NUM_PROCESSES > 1 and cfg.TPU.COORDINATOR_ADDRESS:
        jax.distributed.initialize(
            coordinator_address=cfg.TPU.COORDINATOR_ADDRESS,
            num_processes=cfg.TPU.NUM_PROCESSES,
            process_id=cfg.TPU.PROCESS_ID,
        )
        logger.info(
            "jax.distributed up: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )


def launch_job(cfg, init_method: Optional[str], func, daemon: bool = False):
    """reference ``lib/utils/misc.py:272-300``; on TPU the per-device spawn
    collapses to a single call after distributed init."""
    del init_method, daemon
    init_distributed(cfg)
    func(cfg=cfg)


def get_class_names(path: str):
    """reference ``:303-341`` (json {name: id} or newline list)."""
    import json
    import os

    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        if path.endswith(".json"):
            mapping = json.load(f)
            names = [None] * len(mapping)
            for k, v in mapping.items():
                names[int(v)] = k
            return names
        return [l.strip() for l in f if l.strip()]


def plot_input(tensor, bboxes=(), texts=(), path="./tmp_vis.png"):
    """Plot input frames (with optional boxes/texts) to a PNG
    (reference ``lib/utils/misc.py:213-240``). Accepts [T, H, W, C] in
    [0, 1] or normalized floats (min-max rescaled)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    tensor = np.asarray(tensor, dtype=np.float32)
    lo, hi = float(tensor.min()), float(tensor.max())
    if lo < 0 or hi > 1:
        tensor = (tensor - lo) / max(hi - lo, 1e-8)
    f, ax = plt.subplots(nrows=1, ncols=tensor.shape[0], figsize=(50, 20))
    if tensor.shape[0] == 1:
        ax = [ax]
    for i in range(tensor.shape[0]):
        ax[i].axis("off")
        ax[i].imshow(tensor[i])
        if bboxes is not None and len(bboxes) > i:
            for box in bboxes[i]:
                x1, y1, x2, y2 = box
                ax[i].vlines(x1, y1, y2, colors="g", linestyles="solid")
                ax[i].vlines(x2, y1, y2, colors="g", linestyles="solid")
                ax[i].hlines(y1, x1, x2, colors="g", linestyles="solid")
                ax[i].hlines(y2, x1, x2, colors="g", linestyles="solid")
        if texts is not None and len(texts) > i:
            ax[i].text(0, 0, texts[i])
    f.savefig(path)
    plt.close(f)
