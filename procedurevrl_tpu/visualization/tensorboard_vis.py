"""TensorBoard writer (reference ``lib/visualization/tensorboard_vis.py:19-428``).

Scalars, confusion matrices, histograms of per-class predictions, and video
grids, gated by ``TENSORBOARD.ENABLE``.  Master host only.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


def get_confusion_matrix(preds: np.ndarray, labels: np.ndarray,
                         num_classes: int, normalize: str = "true") -> np.ndarray:
    """Row-normalized confusion matrix (reference
    ``lib/visualization/utils.py:15-60``)."""
    cmtx = np.zeros((num_classes, num_classes), np.float64)
    pred_cls = preds.argmax(axis=-1) if preds.ndim == 2 else preds
    for p, l in zip(pred_cls, labels):
        cmtx[int(l), int(p)] += 1
    if normalize == "true":
        rows = cmtx.sum(axis=1, keepdims=True)
        cmtx = np.divide(cmtx, rows, out=np.zeros_like(cmtx), where=rows != 0)
    return cmtx


def plot_confusion_matrix(cmtx: np.ndarray, num_classes: int,
                          class_names: Optional[List[str]] = None,
                          figsize=(8, 8)):
    """matplotlib figure (reference ``lib/visualization/utils.py:63-119``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if class_names is None or not isinstance(class_names, list):
        class_names = [str(i) for i in range(num_classes)]
    fig = plt.figure(figsize=figsize)
    plt.imshow(cmtx, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    tick_marks = np.arange(len(class_names))
    plt.xticks(tick_marks, class_names, rotation=45)
    plt.yticks(tick_marks, class_names)
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    plt.tight_layout()
    return fig


class TensorboardWriter:
    """reference ``tensorboard_vis.py:19-180`` (scalars + plots subset)."""

    def __init__(self, cfg):
        import os

        from torch.utils.tensorboard import SummaryWriter

        self._cfg = cfg
        log_dir = cfg.TENSORBOARD.LOG_DIR or "runs-{}".format(
            cfg.TRAIN.DATASET
        )
        log_dir = os.path.join(cfg.OUTPUT_DIR, log_dir)
        self.writer = SummaryWriter(log_dir=log_dir)
        logger.info(
            "To see logged results in Tensorboard, please launch using the command "
            "`tensorboard --port=<port-number> --logdir %s`", log_dir
        )

    def add_scalars(self, data_dict: Dict[str, float], global_step: Optional[int] = None):
        for key, item in data_dict.items():
            self.writer.add_scalar(key, item, global_step)

    def add_confusion_matrix(self, preds, labels, global_step=None,
                             class_names=None, tag="Confusion Matrix",
                             figsize=None):
        num_classes = self._cfg.MODEL.NUM_CLASSES
        cmtx = get_confusion_matrix(np.asarray(preds), np.asarray(labels),
                                    num_classes)
        fig = plot_confusion_matrix(
            cmtx, num_classes, class_names,
            figsize=figsize or self._cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE,
        )
        self.writer.add_figure(tag=tag, figure=fig, global_step=global_step)

    def add_histogram(self, tag: str, values, global_step=None):
        self.writer.add_histogram(tag, np.asarray(values), global_step)

    def add_video(self, vid_tensor, tag: str = "Video Input", global_step=None,
                  fps: int = 4):
        """vid_tensor: [B, T, H, W, C] uint8/float -> tensorboard NTCHW."""
        import torch

        v = np.asarray(vid_tensor)
        v = torch.from_numpy(v).permute(0, 1, 4, 2, 3)
        self.writer.add_video(tag, v, global_step=global_step, fps=fps)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.flush()
        self.writer.close()
