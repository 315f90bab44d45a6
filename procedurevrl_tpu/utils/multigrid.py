"""Multigrid training schedules (reference ``lib/utils/multigrid.py:12-239``).

Long-cycle schedule computation: vary (batch multiplier, temporal span,
spatial crop) over training so early epochs run cheap low-res/short clips.
Dormant in the shipped ProcedureVRL configs (no config enables it), carried
for parity and available through ``MULTIGRID.LONG_CYCLE``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


class MultigridSchedule:
    """reference ``lib/utils/multigrid.py:12-150``."""

    def init_multigrid(self, cfg):
        self.schedule = None
        # snapshot the base shape before any cycle mutates it (reference
        # lib/utils/multigrid.py:35-42); DEFAULT_* default to 0 in the
        # config and everything downstream divides by them
        cfg.MULTIGRID.DEFAULT_B = cfg.TRAIN.BATCH_SIZE
        cfg.MULTIGRID.DEFAULT_T = cfg.DATA.NUM_FRAMES
        cfg.MULTIGRID.DEFAULT_S = cfg.DATA.TRAIN_CROP_SIZE
        if cfg.MULTIGRID.LONG_CYCLE:
            self.schedule = self.get_long_cycle_schedule(cfg)
            cfg.SOLVER.STEPS = [0] + [s[-1] for s in self.schedule]
            cfg.SOLVER.LRS = [
                cfg.SOLVER.GAMMA ** s[0] * s[1][0] for s in self.schedule
            ]
            cfg.SOLVER.MAX_EPOCH = self.schedule[-1][-1]
        elif cfg.MULTIGRID.SHORT_CYCLE:
            cfg.SOLVER.STEPS = [
                int(s * cfg.MULTIGRID.EPOCH_FACTOR) for s in cfg.SOLVER.STEPS
            ]
            cfg.SOLVER.MAX_EPOCH = int(
                cfg.SOLVER.MAX_EPOCH * cfg.MULTIGRID.EPOCH_FACTOR
            )
        return cfg

    def update_long_cycle(self, cfg, cur_epoch: int):
        """Set (NUM_FRAMES, SAMPLING_RATE, CROP, BATCH) for the phase
        containing cur_epoch; returns (cfg, changed)."""
        base_b, base_t, base_s = get_current_long_cycle_shape(
            self.schedule, cur_epoch
        )
        if (
            base_s != cfg.DATA.TRAIN_CROP_SIZE
            or base_t != cfg.DATA.NUM_FRAMES
        ):
            cfg.DATA.NUM_FRAMES = base_t
            cfg.DATA.TRAIN_CROP_SIZE = base_s
            cfg.DATA.SAMPLING_RATE = cfg.MULTIGRID.DEFAULT_T * (
                cfg.MULTIGRID.DEFAULT_S // base_t if base_t else 1
            )
            cfg.TRAIN.BATCH_SIZE = base_b * cfg.MULTIGRID.DEFAULT_B
            return cfg, True
        return cfg, False

    def get_long_cycle_schedule(self, cfg) -> List:
        """reference ``lib/utils/multigrid.py:151-239``."""
        steps = cfg.SOLVER.STEPS
        default_size = float(
            cfg.DATA.NUM_FRAMES * cfg.DATA.TRAIN_CROP_SIZE ** 2
        )
        default_iters = steps[-1]

        # compute per-shape (batch multiplier, [t, s]) options
        shapes = []
        for t_factor, s_factor in cfg.MULTIGRID.LONG_CYCLE_FACTORS:
            base_t = int(round(cfg.DATA.NUM_FRAMES * t_factor))
            base_s = int(round(cfg.DATA.TRAIN_CROP_SIZE * s_factor))
            if cfg.MULTIGRID.SHORT_CYCLE:
                option = [
                    [
                        base_t,
                        int(round(
                            base_s * cfg.MULTIGRID.SHORT_CYCLE_FACTORS[0]
                        )),
                    ],
                    [
                        base_t,
                        int(round(
                            base_s * cfg.MULTIGRID.SHORT_CYCLE_FACTORS[1]
                        )),
                    ],
                    [base_t, base_s],
                ]
                avg_size = float(
                    sum(t * s ** 2 for t, s in option) / len(option)
                )
            else:
                option = [[base_t, base_s]]
                avg_size = float(base_t * base_s ** 2)
            batch_factor = default_size / avg_size
            shapes.append([batch_factor, option[-1]])

        total_iters = 0
        schedule = []
        for step_index in range(len(steps) - 1):
            step_epochs = steps[step_index + 1] - steps[step_index]
            for long_cycle_index, (batch_factor, shape) in enumerate(shapes):
                cur_epochs = step_epochs * batch_factor / sum(
                    s[0] for s in shapes
                )
                cur_iters = cur_epochs / batch_factor
                total_iters += cur_iters
                schedule.append(
                    (step_index, (int(round(batch_factor)), shape), cur_epochs)
                )
        iter_saving = default_iters / total_iters
        final_step_epochs = cfg.SOLVER.MAX_EPOCH - steps[-1]
        ft_epochs = final_step_epochs / iter_saving * shapes[-1][0]
        schedule.append((len(steps) - 1, (shapes[-1][0], shapes[-1][1]), ft_epochs))

        # cumulative epochs, scaled by EPOCH_FACTOR
        x = (
            cfg.SOLVER.MAX_EPOCH * cfg.MULTIGRID.EPOCH_FACTOR
            / sum(s[-1] for s in schedule)
        )
        final = []
        total_epochs = 0.0
        for s in schedule:
            epochs = s[2] * x
            total_epochs += epochs
            final.append((s[0], s[1], int(round(total_epochs))))
        logger.info("Long cycle schedule: %s", final)
        return final


def get_current_long_cycle_shape(schedule, epoch: int) -> Tuple:
    """reference ``lib/utils/multigrid.py`` helper."""
    for s in schedule:
        if epoch < s[-1]:
            return s[1][0], s[1][1][0], s[1][1][1]
    return schedule[-1][1][0], schedule[-1][1][1][0], schedule[-1][1][1][1]
