"""Meter semantics: multi-view ensembling, scalar windows, EPIC triplets."""

import numpy as np

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.utils.meters import (
    EPICTestMeter, ScalarMeter, TestMeter, TrainMeter,
)


def test_test_meter_sum_ensembling():
    num_videos, num_clips, num_cls = 3, 2, 4
    m = TestMeter(num_videos, num_clips, num_cls, overall_iters=1)
    rng = np.random.RandomState(0)
    preds = rng.rand(num_videos * num_clips, num_cls).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    clip_ids = np.arange(6)
    m.update_stats(preds[:3], labels[:3], clip_ids[:3])
    m.update_stats(preds[3:], labels[3:], clip_ids[3:])
    expect = preds.reshape(num_videos, num_clips, num_cls).sum(1)
    np.testing.assert_allclose(m.video_preds, expect, rtol=1e-6)
    assert (m.clip_count == num_clips).all()
    stats = m.finalize_metrics()
    assert "top1_acc" in stats


def test_test_meter_max_ensembling():
    m = TestMeter(2, 2, 3, overall_iters=1, ensemble_method="max")
    preds = np.array([[1, 0, 0], [0, 2, 0], [0, 0, 3], [4, 0, 0]], np.float32)
    m.update_stats(preds, np.array([0, 0, 2, 2]), np.arange(4))
    np.testing.assert_array_equal(m.video_preds[0], [1, 2, 0])
    np.testing.assert_array_equal(m.video_preds[1], [4, 0, 3])


def test_scalar_meter_window_median():
    m = ScalarMeter(window_size=3)
    for v in [1.0, 100.0, 2.0, 3.0]:
        m.add_value(v)
    assert m.get_win_median() == 3.0  # window = [100, 2, 3]
    assert m.get_global_avg() == (1 + 100 + 2 + 3) / 4


def test_train_meter_epoch_stats():
    cfg = get_cfg()
    cfg.LOG_PERIOD = 100
    cfg.SOLVER.MAX_EPOCH = 2
    m = TrainMeter(epoch_iters=10, cfg=cfg)
    m.iter_tic()
    m.update_stats(top1_err=50.0, top5_err=10.0, loss=2.0, lr=0.1, mb_size=8)
    m.update_stats(top1_err=30.0, top5_err=5.0, loss=1.0, lr=0.1, mb_size=8)
    assert m.num_samples == 16
    assert abs(m.loss_total / m.num_samples - 1.5) < 1e-6
    m.log_epoch_stats(0)


def test_epic_test_meter():
    m = EPICTestMeter(2, 2, [3, 4], overall_iters=1)
    verb = np.eye(3, dtype=np.float32)[[0, 0, 1, 1]]
    noun = np.eye(4, dtype=np.float32)[[2, 2, 3, 3]]
    m.update_stats((verb, noun), (np.array([0, 0, 1, 1]), np.array([2, 2, 3, 3])),
                   None, np.arange(4))
    stats = m.finalize_metrics()
    assert stats["verb_top1_acc"] == "100.00"
    assert stats["noun_top1_acc"] == "100.00"
    assert stats["action_top1_acc"] == "100.00"
