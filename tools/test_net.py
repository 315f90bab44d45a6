"""Multi-view testing (reference ``tools/test_net.py``).

Each test video contributes ``NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS`` clips;
per-clip softmax predictions are ensembled per video by the TestMeter
(sum/max), then top-1/top-5 finalized.  Zero-shot COIN step classification /
forecasting runs through the same path with the CLIP step-embedding bank as
the classifier.

The reference's cross-GPU ``all_gather`` of predictions
(``tools/test_net.py:87-113``) is unnecessary here: the eval step runs on a
global sharded batch, and fetching the result gives the full global batch.
"""

from __future__ import annotations

import os
import pickle

import jax

from procedurevrl_tpu.datasets import loader as loader_mod
from procedurevrl_tpu.engine.steps import TrainState, make_eval_step
from procedurevrl_tpu.models.build import build_model
from procedurevrl_tpu.parallel.mesh import batch_sharding, build_mesh, replicated, shard_batch
from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
from procedurevrl_tpu.utils import checkpoint as cu
from procedurevrl_tpu.utils import logging as logging_util
from procedurevrl_tpu.utils import meters as meters_mod
from procedurevrl_tpu.utils import misc

logger = logging_util.get_logger(__name__)


def perform_test(test_loader, state, eval_step, test_meter, cfg, mesh):
    """reference ``tools/test_net.py:31-158``."""
    test_meter.iter_tic()
    is_epic = cfg.TEST.DATASET == "Epickitchens"
    prefetched = loader_mod.prefetch_to_device(
        test_loader, mesh, size=cfg.TPU.PREFETCH_DEPTH
    )
    for cur_iter, (dev_batch, n_valid, extra, batch) in enumerate(prefetched):
        preds = jax.device_get(
            eval_step(state.eval_variables, {"frames": dev_batch["frames"]})
        )
        idx = batch["index"][:n_valid]
        if is_epic:
            test_meter.update_stats(
                (preds[0][:n_valid], preds[1][:n_valid]),
                (batch["verb"][:n_valid], batch["noun"][:n_valid]),
                extra.get("narration_id"),
                idx,
            )
        else:
            test_meter.update_stats(
                preds[:n_valid], batch["labels"][:n_valid], idx
            )
        test_meter.iter_toc()
        test_meter.log_iter_stats(cur_iter)
        test_meter.iter_tic()
    stats = test_meter.finalize_metrics()

    if cfg.TEST.SAVE_RESULTS_PATH and jax.process_index() == 0:
        out = os.path.join(cfg.OUTPUT_DIR, cfg.TEST.SAVE_RESULTS_PATH)
        with open(out, "wb") as f:
            if is_epic:
                pickle.dump(
                    {"verb": test_meter.verb_preds, "noun": test_meter.noun_preds},
                    f,
                )
            else:
                pickle.dump({"preds": test_meter.video_preds,
                             "labels": test_meter.video_labels}, f)
        logger.info("Saved results to %s", out)
    if cfg.TEST.SAVE_PREDICT_PATH and jax.process_index() == 0:
        # torch-format prediction dump, drop-in for the reference's
        # vis_pred_zeroshot_step_cls.pth (reference tools/test_net.py:146)
        import torch

        out = os.path.join(cfg.OUTPUT_DIR, cfg.TEST.SAVE_PREDICT_PATH)
        torch.save(
            {
                "preds": torch.from_numpy(test_meter.video_preds.copy()),
                "labels": torch.from_numpy(test_meter.video_labels.copy()),
            },
            out,
        )
        logger.info("Saved predictions to %s", out)
    return stats


def test(cfg):
    """Test entry (reference ``tools/test_net.py:161-220``)."""
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:")
    logger.info(cfg)

    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)

    from tools.train_net import init_variables

    params, model_state = init_variables(cfg, model, label_emb)
    sched = lr_schedule(cfg, 1)
    tx = construct_optimizer(jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params), cfg, sched)
    state = TrainState.create(params, tx, model_state)
    state = cu.load_test_checkpoint(cfg, state)
    misc.log_model_info(state.params, cfg)

    state = jax.device_put(state, replicated(mesh))
    eval_step = jax.jit(
        make_eval_step(model, cfg, label_emb),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
    )

    test_loader = loader_mod.construct_loader(cfg, "test")
    dataset = test_loader.dataset
    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    assert len(dataset) % num_clips == 0, (
        f"test size {len(dataset)} not divisible by views*crops {num_clips}"
    )
    num_videos = len(dataset) // num_clips
    if cfg.TEST.DATASET == "Epickitchens":
        test_meter = meters_mod.EPICTestMeter(
            num_videos, num_clips, [97, 300], len(test_loader)
        )
    else:
        test_meter = meters_mod.TestMeter(
            num_videos, num_clips, cfg.MODEL.NUM_CLASSES, len(test_loader),
            multi_label=cfg.DATA.MULTI_LABEL,
            ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
        )
    return perform_test(test_loader, state, eval_step, test_meter, cfg, mesh)
