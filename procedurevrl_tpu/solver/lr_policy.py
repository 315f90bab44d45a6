"""Learning-rate policies (reference ``lib/utils/lr_policy.py:8-87``).

Two forms of each policy: a python-float version for logging
(``get_lr_at_epoch``) and a traced version usable inside ``jit`` as an
optax schedule over the global step (``lr_schedule``), so the per-iteration
LR update lives inside the compiled train step instead of a host round-trip
(the reference sets LR on the host every iteration,
``tools/train_net.py:123-124``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np


def _cosine(cfg, cur_epoch):
    assert cfg.SOLVER.COSINE_END_LR < cfg.SOLVER.BASE_LR
    return (
        cfg.SOLVER.COSINE_END_LR
        + (cfg.SOLVER.BASE_LR - cfg.SOLVER.COSINE_END_LR)
        * (math.cos(math.pi * cur_epoch / cfg.SOLVER.MAX_EPOCH) + 1.0)
        * 0.5
    )


def _steps_with_relative_lrs(cfg, cur_epoch):
    steps = list(cfg.SOLVER.STEPS) + [cfg.SOLVER.MAX_EPOCH]
    ind = 0
    for ind, step in enumerate(steps):
        if cur_epoch < step:
            break
    return cfg.SOLVER.LRS[ind - 1] * cfg.SOLVER.BASE_LR


_POLICIES = {"cosine": _cosine, "steps_with_relative_lrs": _steps_with_relative_lrs}


def get_lr_at_epoch(cfg, cur_epoch: float) -> float:
    """LR at a (fractional) epoch, with linear warmup
    (reference ``lib/utils/lr_policy.py:9-28``)."""
    policy = _POLICIES[cfg.SOLVER.LR_POLICY]
    lr = policy(cfg, cur_epoch)
    if cur_epoch < cfg.SOLVER.WARMUP_EPOCHS:
        lr_start = cfg.SOLVER.WARMUP_START_LR
        lr_end = policy(cfg, cfg.SOLVER.WARMUP_EPOCHS)
        alpha = (lr_end - lr_start) / cfg.SOLVER.WARMUP_EPOCHS
        lr = cur_epoch * alpha + lr_start
    return lr


def lr_schedule(cfg, steps_per_epoch: int) -> Callable:
    """Traced step -> LR function (identical math to ``get_lr_at_epoch``)."""
    policy_name = cfg.SOLVER.LR_POLICY
    base_lr = cfg.SOLVER.BASE_LR
    end_lr = cfg.SOLVER.COSINE_END_LR
    max_epoch = cfg.SOLVER.MAX_EPOCH
    warmup_epochs = cfg.SOLVER.WARMUP_EPOCHS
    warmup_start = cfg.SOLVER.WARMUP_START_LR

    if policy_name == "cosine":
        def policy(epoch):
            return end_lr + (base_lr - end_lr) * (
                jnp.cos(jnp.pi * epoch / max_epoch) + 1.0
            ) * 0.5
    elif policy_name == "steps_with_relative_lrs":
        steps = jnp.asarray(list(cfg.SOLVER.STEPS) + [max_epoch], jnp.float32)
        lrs = jnp.asarray(np.asarray(cfg.SOLVER.LRS, np.float32))

        def policy(epoch):
            # index of the first step > epoch, minus one
            ind = jnp.sum((steps <= epoch).astype(jnp.int32)) - 1
            # epoch < steps[0] -> reference loop breaks at ind=0 -> LRS[-1];
            # replicate by wrapping
            return lrs[ind % len(lrs)] * base_lr
    else:
        raise NotImplementedError(policy_name)

    def sched(step):
        epoch = step.astype(jnp.float32) / float(steps_per_epoch)
        lr = policy(epoch)
        if warmup_epochs > 0:
            lr_end = policy(jnp.asarray(warmup_epochs, jnp.float32))
            alpha = (lr_end - warmup_start) / warmup_epochs
            lr = jnp.where(epoch < warmup_epochs, epoch * alpha + warmup_start, lr)
        return lr

    return sched
