"""MViT ProcedureVRL end-to-end: registry build + pretraining train step on
the 8-device CPU mesh with a tiny MViT config."""

import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.engine.steps import TrainState, make_train_step
from procedurevrl_tpu.models.build import build_model
from procedurevrl_tpu.parallel.mesh import batch_sharding, build_mesh, replicated, shard_batch
from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
from tools.train_net import init_params


def _tiny_mvit_cfg():
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.DEV.MATCH_LANG_EMB = True
    cfg.DEV.ORDER_PRETRAIN_ENABLED = True
    cfg.DEV.ORDER_PRETRAIN_MAX_LEN = 3
    cfg.DEV.ORDER_RECOG_BATCH = 2
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.TRAIN.TEXT = "/synthetic/"
    cfg.TRAIN.LABEL_EMB = "/synthetic/bank.pth"
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 16
    cfg.MODEL.LOSS_FUNC = "kldiv"
    cfg.MODEL.TEXT_MODEL = ""  # no text tower: zero teacher text term
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    return cfg


def test_mvit_pretrain_step_runs_without_text_model():
    """MViT variant without the CLIP text tower: the teacher is the
    precomputed visual features alone (reference MViT configs still carry
    TEXT_MODEL, but the model must also run without it — text_emb term
    becomes zero)."""
    cfg = _tiny_mvit_cfg()
    mesh = build_mesh()
    model, label_emb = build_model(cfg)
    assert label_emb is not None
    # with_text_model False -> pseudo labels use clip_vis_feat only
    assert model.with_text_model is False

    params = init_params(cfg, model, label_emb)
    sched = lr_schedule(cfg, 10)
    tx = construct_optimizer(jax.device_get(params), cfg, sched)
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_train_step(model, tx, cfg, label_emb, sched, 1),
        in_shardings=(replicated(mesh), batch_sharding(mesh), replicated(mesh)),
    )
    B, M, T, S = 8, 3, 4, 32
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "frames": rng.randn(B, M, T, S, S, 3).astype(np.float32),
        "labels": np.zeros((B,), np.int32),
        "clip_text_ids": rng.randint(1, 49000, (B, M, 77)).astype(np.int32),
        "clip_vis_feat": rng.randn(B, M, 512).astype(np.float32),
    })
    key = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))
    state = jax.device_put(state, replicated(mesh))
    state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.step)) == 1
