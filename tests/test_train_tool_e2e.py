"""tools/train_net.train() end-to-end on the CPU mesh: tiny COIN finetune,
one epoch, eval epoch, checkpoint write + AUTO_RESUME."""

import os

import pytest

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.utils import checkpoint as cu


def _tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "COIN",
                     "step_classification.yaml")
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TEST.ENABLE = False
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.DATA.PATH_TO_DATA_DIR = "/nonexistent"  # force synthetic index
    cfg.LOG_PERIOD = 4
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_train_tool_end_to_end(tmp_path):
    from tools.train_net import train

    cfg = _tiny_cfg(tmp_path)
    state = train(cfg)
    assert int(state.step) == 8  # 64 synthetic samples / batch 8
    assert cu.has_checkpoint(str(tmp_path))

    # AUTO_RESUME: restarting continues from epoch 1 == MAX_EPOCH -> no-op
    cfg2 = _tiny_cfg(tmp_path)
    state2 = train(cfg2)
    assert int(state2.step) == 8  # restored, no extra epochs run


def test_train_tool_with_grad_accumulation(tmp_path):
    """GLOBAL_BATCH_SIZE = 2x per-step batch -> streaming accumulation path
    (reference tools/train_net.py:176-192 semantics)."""
    from tools.train_net import train

    cfg = _tiny_cfg(tmp_path)
    cfg.GLOBAL_BATCH_SIZE = 16  # accum = 2
    cfg.TRAIN.EVAL_PERIOD = 10  # skip eval
    state = train(cfg)
    # 8 micro-batches -> 4 optimizer steps
    assert int(state.step) == 4
