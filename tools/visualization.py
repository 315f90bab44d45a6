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


def run_model_vis(cfg, writer, class_names):
    """Weights / activations / Grad-CAM over a few eval batches
    (reference ``tools/visualization.py:31-141``)."""
    import jax

    from procedurevrl_tpu.datasets import loader as loader_mod
    from procedurevrl_tpu.engine.steps import TrainState, normalize_frames
    from procedurevrl_tpu.models.build import build_model
    from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
    from procedurevrl_tpu.utils import checkpoint as cu
    from procedurevrl_tpu.visualization.model_vis import (
        GradCAM, get_activations, get_layer_weights,
    )
    from tools.train_net import init_params

    mv = cfg.TENSORBOARD.MODEL_VIS
    # remat off: Grad-CAM's interceptor must capture the target module's
    # output as a plain traced value, not a remat-internal tracer (and this
    # is a one-batch eval pass — no memory pressure)
    cfg = cfg.clone() if hasattr(cfg, "clone") else cfg
    cfg.TPU.REMAT = False
    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ),
        cfg, lr_schedule(cfg, 1),
    )
    state = cu.load_test_checkpoint(cfg, TrainState.create(params, tx))
    variables = {"params": state.params}
    import jax.numpy as jnp

    bank = None if label_emb is None else jnp.asarray(label_emb)

    if mv.MODEL_WEIGHTS and mv.LAYER_LIST:
        for name, w in get_layer_weights(state.params, mv.LAYER_LIST).items():
            writer.add_histogram(f"Layer Weights/{name}", w.reshape(-1))

    loader = loader_mod.construct_loader(cfg, "test")
    gradcam = None
    if mv.GRAD_CAM.ENABLE and mv.GRAD_CAM.LAYER_LIST:
        # grid inferred from the captured activation (any patch size /
        # pooled token stream), seeded with the frame count
        gradcam = GradCAM(model, mv.GRAD_CAM.LAYER_LIST[0],
                          num_frames=cfg.DATA.NUM_FRAMES)
    for cur_iter, (batch, n_valid, _extra) in enumerate(loader):
        if cur_iter >= 1:  # a single batch is enough for inspection
            break
        frames = normalize_frames(jnp.asarray(batch["frames"]), cfg)
        kwargs = dict(train=False)
        if bank is not None:
            kwargs["label_emb"] = bank
        if mv.ACTIVATIONS and mv.LAYER_LIST:
            acts, _preds = get_activations(
                model, variables, frames, mv.LAYER_LIST, **kwargs)
            for name, a in acts.items():
                writer.add_histogram(f"Activations/{name}", a.reshape(-1))
        if gradcam is not None:
            labels = (jnp.asarray(batch["labels"].reshape(-1))
                      if mv.GRAD_CAM.USE_TRUE_LABEL else None)
            cam, _ = gradcam(variables, frames, labels=labels, **kwargs)
            heat = (cam[..., None] * 255.0).astype("uint8")
            writer.add_video(heat.repeat(3, axis=-1), tag="GradCAM")
    logger.info("Model visualization done.")


def run_visualization(cfg):
    """Visualize saved predictions (``TENSORBOARD.PREDICTIONS_PATH``) or run
    the test pass and visualize its outputs."""
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    writer = TensorboardWriter(cfg)
    class_names = get_class_names(cfg.TENSORBOARD.CLASS_NAMES_PATH)

    if cfg.TENSORBOARD.MODEL_VIS.ENABLE:
        run_model_vis(cfg, writer, class_names)

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
