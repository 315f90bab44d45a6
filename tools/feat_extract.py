"""Per-view feature/prediction extraction (reference ``tools/feat_extract.py``).

test_net variant that accumulates raw per-view prediction arrays (no
per-video ensembling) and dumps them with labels and clip indices — used
for offline analysis and retrieval experiments.
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from procedurevrl_tpu.datasets import loader as loader_mod
from procedurevrl_tpu.engine.steps import TrainState, make_eval_step
from procedurevrl_tpu.models.build import build_model
from procedurevrl_tpu.parallel.mesh import batch_sharding, build_mesh, replicated, shard_batch
from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
from procedurevrl_tpu.utils import checkpoint as cu
from procedurevrl_tpu.utils import logging as logging_util
from procedurevrl_tpu.utils.misc import launch_job
from procedurevrl_tpu.utils.parser import load_config, parse_args

logger = logging_util.get_logger(__name__)


def perform_extract(test_loader, state, eval_step, cfg, mesh):
    """reference ``tools/feat_extract.py:50-60`` accumulation."""
    all_preds, all_labels, all_idx = [], [], []
    for cur_iter, (batch, n_valid, _extra) in enumerate(test_loader):
        dev_batch = shard_batch(mesh, {"frames": batch["frames"]})
        preds = jax.device_get(eval_step(state.eval_variables, dev_batch))
        if isinstance(preds, tuple):
            preds = np.concatenate([np.asarray(p) for p in preds], axis=1)
        all_preds.append(np.asarray(preds)[:n_valid])
        key = "labels" if "labels" in batch else "verb"
        all_labels.append(batch[key][:n_valid])
        all_idx.append(batch["index"][:n_valid])
        if (cur_iter + 1) % cfg.LOG_PERIOD == 0:
            logger.info("extract iter %d/%d", cur_iter + 1, len(test_loader))
    return (
        np.concatenate(all_preds),
        np.concatenate(all_labels),
        np.concatenate(all_idx),
    )


def extract(cfg):
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)
    from tools.train_net import init_variables

    params, model_state = init_variables(cfg, model, label_emb)
    tx = construct_optimizer(jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params), cfg, lr_schedule(cfg, 1))
    state = cu.load_test_checkpoint(cfg, TrainState.create(params, tx, model_state))
    state = jax.device_put(state, replicated(mesh))
    eval_step = jax.jit(
        make_eval_step(model, cfg, label_emb),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
    )
    test_loader = loader_mod.construct_loader(cfg, "test")
    preds, labels, idx = perform_extract(test_loader, state, eval_step, cfg, mesh)
    out = os.path.join(cfg.OUTPUT_DIR, cfg.TEST.SAVE_PREDICT_PATH or "features.pkl")
    if jax.process_index() == 0:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        with open(out, "wb") as f:
            pickle.dump({"preds": preds, "labels": labels, "index": idx}, f)
        logger.info("Saved %s (%s preds)", out, preds.shape)


def main():
    args = parse_args()
    cfg = load_config(args)
    launch_job(cfg=cfg, init_method=args.init_method, func=extract)


if __name__ == "__main__":
    main()
