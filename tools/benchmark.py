"""Data-loading benchmark (reference ``tools/benchmark.py``,
``lib/utils/benchmark.py:20-103``): measures host-pipeline throughput
(batches/sec, clips/sec) without touching the device."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import psutil  # noqa: E402

from procedurevrl_tpu.datasets import loader as loader_mod  # noqa: E402
from procedurevrl_tpu.utils import logging as logging_util  # noqa: E402
from procedurevrl_tpu.utils.parser import load_config, parse_args  # noqa: E402

logger = logging_util.get_logger(__name__)


def benchmark_data_loading(cfg):
    """reference ``lib/utils/benchmark.py:20-103``."""
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    loader = loader_mod.construct_loader(cfg, "train")
    n_epochs = cfg.BENCHMARK.NUM_EPOCHS
    log_period = cfg.BENCHMARK.LOG_PERIOD
    total = 0
    t0 = time.perf_counter()
    for epoch in range(n_epochs):
        loader_mod.shuffle_dataset(loader, epoch)
        t_ep = time.perf_counter()
        for cur_iter, (batch, n_valid, _) in enumerate(loader):
            total += batch["frames"].shape[0]
            if (cur_iter + 1) % log_period == 0:
                dt = time.perf_counter() - t_ep
                ram = psutil.virtual_memory()
                logger.info(
                    "epoch %d iter %d: %.2f batches/s, %.1f clips/s, RAM %.1f/%.1f GB",
                    epoch, cur_iter + 1, (cur_iter + 1) / dt,
                    total / (time.perf_counter() - t0),
                    (ram.total - ram.available) / 1024 ** 3,
                    ram.total / 1024 ** 3,
                )
    dt = time.perf_counter() - t0
    logger.info("Loaded %d clips in %.1fs (%.1f clips/s)", total, dt, total / dt)
    return total / dt


def main():
    args = parse_args()
    cfg = load_config(args)
    benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
