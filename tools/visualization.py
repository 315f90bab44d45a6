"""Prediction visualization (reference ``tools/visualization.py``; the
reference version has stale ``slowfast.*`` imports and is not runnable —
this one drives the working subset: confusion matrices and per-class
histograms from a saved predictions pickle, plus live eval visualization).
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from procedurevrl_tpu.utils import logging as logging_util
from procedurevrl_tpu.utils.misc import get_class_names, launch_job
from procedurevrl_tpu.utils.parser import load_config, parse_args
from procedurevrl_tpu.visualization import TensorboardWriter

logger = logging_util.get_logger(__name__)


def run_visualization(cfg):
    """Visualize saved predictions (``TENSORBOARD.PREDICTIONS_PATH``) or run
    the test pass and visualize its outputs."""
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    writer = TensorboardWriter(cfg)
    class_names = get_class_names(cfg.TENSORBOARD.CLASS_NAMES_PATH)

    path = cfg.TENSORBOARD.PREDICTIONS_PATH
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        preds, labels = np.asarray(blob["preds"]), np.asarray(blob["labels"])
    else:
        from tools.test_net import test

        cfg.TEST.SAVE_RESULTS_PATH = cfg.TEST.SAVE_RESULTS_PATH or "preds_vis.pkl"
        test(cfg)
        with open(os.path.join(cfg.OUTPUT_DIR, cfg.TEST.SAVE_RESULTS_PATH), "rb") as f:
            blob = pickle.load(f)
        preds, labels = np.asarray(blob["preds"]), np.asarray(blob["labels"])

    if cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE:
        writer.add_confusion_matrix(preds, labels, class_names=class_names)
    if cfg.TENSORBOARD.HISTOGRAM.ENABLE:
        topk = cfg.TENSORBOARD.HISTOGRAM.TOPK
        for c in np.unique(labels)[: topk]:
            writer.add_histogram(
                f"class_{int(c)}_scores", preds[labels == c].max(axis=-1)
            )
    writer.close()
    logger.info("Visualization done.")


def main():
    args = parse_args()
    cfg = load_config(args)
    launch_job(cfg=cfg, init_method=args.init_method, func=run_visualization)


if __name__ == "__main__":
    main()
