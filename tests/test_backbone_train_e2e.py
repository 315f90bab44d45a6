"""tools/train_net.train() end-to-end for the BatchNorm backbone family
(SlowFast on dummy Kinetics): one epoch + precise-BN + checkpoint with
batch_stats + AUTO_RESUME restoring them (reference
``tools/train_net.py:505-521``, ``lib/models/video_model_builder.py:152``)."""

import os

import numpy as np
import pytest

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.utils import checkpoint as cu


def _tiny_cfg(tmp_path, model="SlowFast"):
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TEST.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.TEST.ENABLE = False
    cfg.MODEL.MODEL_NAME = model
    cfg.MODEL.ARCH = "slowfast" if model == "SlowFast" else "slow"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.PRETRAINED = False
    cfg.RESNET.WIDTH_PER_GROUP = 8
    if model == "SlowFast":
        cfg.SLOWFAST.ALPHA = 4
        cfg.SLOWFAST.BETA_INV = 8
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
        cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
        cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
        cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[], []], [[], []]]
        cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
        cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.BN.USE_PRECISE_STATS = True
    cfg.BN.NUM_BATCHES_PRECISE = 2
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.DATA.PATH_TO_DATA_DIR = "/nonexistent"
    cfg.LOG_PERIOD = 4
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_slowfast_train_tool_end_to_end(tmp_path):
    from tools.train_net import train

    cfg = _tiny_cfg(tmp_path)
    state = train(cfg)
    assert state.model_state is not None
    assert cu.has_checkpoint(str(tmp_path))

    # resume restores the BN running statistics bit-exactly
    import jax

    cfg2 = _tiny_cfg(tmp_path)
    state2 = train(cfg2)  # MAX_EPOCH reached -> restore only
    a = jax.device_get(state.model_state)
    b = jax.device_get(state2.model_state)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_long_cycle_multigrid_train_e2e(tmp_path):
    """MULTIGRID.LONG_CYCLE end-to-end: the schedule rewrites
    SOLVER.STEPS/LRS/MAX_EPOCH and each phase change rebuilds the loader /
    train step at the phase's (T, S, B) shape while weights carry over
    (reference tools/train_net.py:487-506)."""
    from tools.train_net import train
    from procedurevrl_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TEST.ENABLE = False
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 8
    cfg.MODEL.MODEL_NAME = "vit_base_patch16_224_develop"
    cfg.MODEL.ARCH = "vit"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.PRETRAINED = False
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.TRAIN_JITTER_SCALES = [72, 80]
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = [0, 2, 4]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    cfg.SOLVER.MAX_EPOCH = 5
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.EPOCH_FACTOR = 1.0
    # patch-aligned factors (the reference's 1/sqrt(2) spatial factor is
    # convnet-only; ViT crops must stay multiples of the patch size)
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 0.5], [1, 1]]
    cfg.TRAIN.EVAL_PERIOD = 100
    cfg.TRAIN.CHECKPOINT_PERIOD = 100
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    state = train(cfg)
    assert int(state.step) > 0
