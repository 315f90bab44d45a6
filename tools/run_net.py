"""Main CLI entry (reference ``tools/run_net.py:15-44``).

Usage: ``python tools/run_net.py --cfg configs/... [KEY VALUE ...]``.
Dispatches train and/or test per ``TRAIN.ENABLE`` / ``TEST.ENABLE``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procedurevrl_tpu.utils.parser import load_config, parse_args  # noqa: E402
from procedurevrl_tpu.utils.misc import launch_job  # noqa: E402


def get_func(cfg):
    from tools.test_net import test
    from tools.train_net import train

    train_func = train
    test_func = test
    return train_func, test_func


def main():
    args = parse_args()
    cfg = load_config(args)
    train, test = get_func(cfg)

    if cfg.TRAIN.ENABLE:
        launch_job(cfg=cfg, init_method=args.init_method, func=train)
    if cfg.TEST.ENABLE:
        launch_job(cfg=cfg, init_method=args.init_method, func=test)


if __name__ == "__main__":
    main()
