"""Train / val / test meters (reference ``lib/utils/meters.py``).

Same JSON-stats schema as the reference (``dt``, ``dt_data``, ``dt_net``,
``eta``, windowed-median scalars) minus the CUDA memory fields; device
memory is reported from ``jax.local_devices()[0].memory_stats()`` when the
backend exposes it.

``TestMeter`` reproduces the multi-view ensembling contract exactly
(reference ``lib/utils/meters.py:21-204``): per-video score accumulation
(sum or max) over ``num_clips = views x crops``, duplicate-clip detection,
finalize into top-1/top-5.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, List, Optional

import numpy as np

from procedurevrl_tpu.utils import logging as logging_util
from procedurevrl_tpu.utils import metrics

logger = logging_util.get_logger(__name__)


def gpu_mem_usage() -> float:
    """Device HBM usage in GB (best-effort)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1024 ** 3
    except Exception:
        pass
    return 0.0


class Timer:
    """Minimal fvcore-style timer."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._paused: Optional[float] = None
        self._total_paused = 0.0

    def pause(self):
        if self._paused is None:
            self._paused = time.perf_counter()

    def resume(self):
        if self._paused is not None:
            self._total_paused += time.perf_counter() - self._paused
            self._paused = None

    def seconds(self) -> float:
        end = self._paused if self._paused is not None else time.perf_counter()
        return end - self._start - self._total_paused


class ScalarMeter:
    """Windowed-median scalar (reference ``lib/utils/meters.py:206-254``)."""

    def __init__(self, window_size: int):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def reset(self):
        self.deque.clear()
        self.total = 0.0
        self.count = 0

    def add_value(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    def get_win_median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    def get_win_avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    def get_global_avg(self) -> float:
        return self.total / max(self.count, 1)


class TrainMeter:
    """reference ``lib/utils/meters.py:257-420``."""

    def __init__(self, epoch_iters: int, cfg):
        self._cfg = cfg
        self.epoch_iters = epoch_iters
        self.max_iter = cfg.SOLVER.MAX_EPOCH * epoch_iters
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()
        self.loss = ScalarMeter(cfg.LOG_PERIOD)
        self.loss_total = 0.0
        self.lr = None
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.extra = defaultdict(lambda: ScalarMeter(cfg.LOG_PERIOD))

    def reset(self):
        self.loss.reset()
        self.loss_total = 0.0
        self.lr = None
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.extra.clear()

    def iter_tic(self):
        self.iter_timer.reset()
        self.data_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()
        self.net_timer.pause()

    def data_toc(self):
        self.data_timer.pause()
        self.net_timer.reset()

    def update_stats(self, top1_err, top5_err, loss, lr, mb_size, extra=None):
        self.loss.add_value(loss)
        self.lr = lr
        self.loss_total += loss * mb_size
        self.num_samples += mb_size
        if top1_err is not None:
            self.mb_top1_err.add_value(top1_err)
            self.mb_top5_err.add_value(top5_err)
            self.num_top1_mis += top1_err * mb_size
            self.num_top5_mis += top5_err * mb_size
        for k, v in (extra or {}).items():
            self.extra[k].add_value(v)

    def log_iter_stats(self, cur_epoch: int, cur_iter: int):
        if (cur_iter + 1) % self._cfg.LOG_PERIOD != 0:
            return
        eta_sec = self.iter_timer.seconds() * (
            self.max_iter - (cur_epoch * self.epoch_iters + cur_iter + 1)
        )
        stats = {
            "_type": "train_iter",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "iter": "{}/{}".format(cur_iter + 1, self.epoch_iters),
            "dt": self.iter_timer.seconds(),
            "dt_data": self.data_timer.seconds(),
            "dt_net": self.net_timer.seconds(),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "loss": self.loss.get_win_median(),
            "lr": self.lr,
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
        }
        if self.mb_top1_err.count > 0:
            stats["top1_err"] = self.mb_top1_err.get_win_median()
            stats["top5_err"] = self.mb_top5_err.get_win_median()
        for k, m in self.extra.items():
            stats[k] = m.get_win_median()
        logging_util.log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch: int):
        stats = {
            "_type": "train_epoch",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "dt": self.iter_timer.seconds(),
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
            "loss": self.loss_total / max(self.num_samples, 1),
            "lr": self.lr,
        }
        if self.num_top1_mis:
            stats["top1_err"] = self.num_top1_mis / max(self.num_samples, 1)
            stats["top5_err"] = self.num_top5_mis / max(self.num_samples, 1)
        logging_util.log_json_stats(stats)


class ValMeter:
    """reference ``lib/utils/meters.py:423-537``."""

    def __init__(self, max_iter: int, cfg):
        self._cfg = cfg
        self.max_iter = max_iter
        self.iter_timer = Timer()
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.min_top1_err = 100.0
        self.min_top5_err = 100.0

    def reset(self):
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def update_stats(self, top1_err, top5_err, mb_size):
        self.mb_top1_err.add_value(top1_err)
        self.mb_top5_err.add_value(top5_err)
        self.num_top1_mis += top1_err * mb_size
        self.num_top5_mis += top5_err * mb_size
        self.num_samples += mb_size

    def log_iter_stats(self, cur_epoch: int, cur_iter: int):
        if (cur_iter + 1) % self._cfg.LOG_PERIOD != 0:
            return
        eta_sec = self.iter_timer.seconds() * (self.max_iter - cur_iter - 1)
        logging_util.log_json_stats({
            "_type": "val_iter",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "iter": "{}/{}".format(cur_iter + 1, self.max_iter),
            "time_diff": self.iter_timer.seconds(),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "top1_err": self.mb_top1_err.get_win_median(),
            "top5_err": self.mb_top5_err.get_win_median(),
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
        })

    def log_epoch_stats(self, cur_epoch: int):
        top1 = self.num_top1_mis / max(self.num_samples, 1)
        top5 = self.num_top5_mis / max(self.num_samples, 1)
        self.min_top1_err = min(self.min_top1_err, top1)
        self.min_top5_err = min(self.min_top5_err, top5)
        logging_util.log_json_stats({
            "_type": "val_epoch",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "top1_err": top1,
            "top5_err": top5,
            "min_top1_err": self.min_top1_err,
            "min_top5_err": self.min_top5_err,
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
        })


class EPICValMeter:
    """Verb/noun/action validation meter (reference
    ``lib/utils/meters.py:798-978``): accuracy-based (not error-based),
    tracking the max over epochs; ``update_stats`` takes the
    (verb, noun, action) top-1 and top-5 accuracy triplets."""

    _KEYS = ("verb", "noun", "action")

    def __init__(self, max_iter: int, cfg):
        self._cfg = cfg
        self.max_iter = max_iter
        self.iter_timer = Timer()
        self.mb = {
            f"{k}_top{j}": ScalarMeter(cfg.LOG_PERIOD)
            for k in self._KEYS for j in (1, 5)
        }
        self.num_cor = {k: 0.0 for k in self.mb}
        self.max_acc = {k: 0.0 for k in self.mb}
        self.num_samples = 0

    def reset(self):
        for m in self.mb.values():
            m.reset()
        self.num_cor = {k: 0.0 for k in self.mb}
        self.num_samples = 0

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def update_stats(self, top1_acc, top5_acc, mb_size):
        """top1_acc / top5_acc: (verb, noun, action) accuracy triplets."""
        for i, k in enumerate(self._KEYS):
            self.mb[f"{k}_top1"].add_value(top1_acc[i])
            self.mb[f"{k}_top5"].add_value(top5_acc[i])
            self.num_cor[f"{k}_top1"] += top1_acc[i] * mb_size
            self.num_cor[f"{k}_top5"] += top5_acc[i] * mb_size
        self.num_samples += mb_size

    @staticmethod
    def _stat_name(key: str) -> str:
        # the reference logs the action metrics as plain top{k}_acc
        return key.replace("action_", "") + "_acc"

    def log_iter_stats(self, cur_epoch: int, cur_iter: int):
        if (cur_iter + 1) % self._cfg.LOG_PERIOD != 0:
            return
        eta_sec = self.iter_timer.seconds() * (self.max_iter - cur_iter - 1)
        stats = {
            "_type": "val_iter",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "iter": "{}/{}".format(cur_iter + 1, self.max_iter),
            "time_diff": self.iter_timer.seconds(),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
        }
        for k, m in self.mb.items():
            stats[self._stat_name(k)] = m.get_win_median()
        logging_util.log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch: int) -> bool:
        """Returns is_best_epoch (action top-1 improved), as the reference."""
        n = max(self.num_samples, 1)
        accs = {k: self.num_cor[k] / n for k in self.num_cor}
        is_best = accs["action_top1"] > self.max_acc["action_top1"]
        for k in accs:
            self.max_acc[k] = max(self.max_acc[k], accs[k])
        stats = {
            "_type": "val_epoch",
            "epoch": "{}/{}".format(cur_epoch + 1, self._cfg.SOLVER.MAX_EPOCH),
            "time_diff": self.iter_timer.seconds(),
            "gpu_mem": "{:.2f}G".format(gpu_mem_usage()),
        }
        for k in accs:
            stats[self._stat_name(k)] = accs[k]
            stats["max_" + self._stat_name(k)] = self.max_acc[k]
        logging_util.log_json_stats(stats)
        self.stats = stats
        return is_best


class TestMeter:
    """Multi-view test ensembling (reference ``lib/utils/meters.py:21-204``)."""

    def __init__(
        self,
        num_videos: int,
        num_clips: int,
        num_cls: int,
        overall_iters: int,
        multi_label: bool = False,
        ensemble_method: str = "sum",
    ):
        assert ensemble_method in ("sum", "max")
        self.num_clips = num_clips
        self.overall_iters = overall_iters
        self.multi_label = multi_label
        self.ensemble_method = ensemble_method
        self.iter_timer = Timer()
        self.video_preds = np.zeros((num_videos, num_cls), np.float32)
        if multi_label:
            self.video_preds -= 1e10
        self.video_labels = np.zeros(
            (num_videos, num_cls) if multi_label else (num_videos,), np.int64
        )
        self.clip_count = np.zeros((num_videos,), np.int64)
        self.stats: Dict = {}

    def reset(self):
        self.clip_count[:] = 0
        self.video_preds[:] = -1e10 if self.multi_label else 0
        self.video_labels[:] = 0

    def update_stats(self, preds, labels, clip_ids):
        """preds [N, C]; labels [N]; clip_ids [N] global clip indices."""
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        clip_ids = np.asarray(clip_ids)
        for ind in range(preds.shape[0]):
            vid_id = int(clip_ids[ind]) // self.num_clips
            if self.video_labels[vid_id].sum() > 0:
                assert (self.video_labels[vid_id] == labels[ind]).all()
            self.video_labels[vid_id] = labels[ind]
            if self.ensemble_method == "sum":
                self.video_preds[vid_id] += preds[ind]
            else:
                self.video_preds[vid_id] = np.maximum(
                    self.video_preds[vid_id], preds[ind]
                )
            self.clip_count[vid_id] += 1

    def log_iter_stats(self, cur_iter: int):
        eta_sec = self.iter_timer.seconds() * (self.overall_iters - cur_iter)
        logging_util.log_json_stats({
            "split": "test_iter",
            "cur_iter": "{}".format(cur_iter + 1),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "time_diff": self.iter_timer.seconds(),
        })

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def finalize_metrics(self, ks=(1, 5)) -> Dict:
        if not all(self.clip_count == self.num_clips):
            mismatch = np.argwhere(self.clip_count != self.num_clips).flatten()
            logger.warning(
                "clip count {} ~= num clips {}".format(
                    ", ".join("{}: {}".format(i, int(self.clip_count[i]))
                              for i in mismatch[:20]),
                    self.num_clips,
                )
            )
        stats = {"split": "test_final"}
        import jax.numpy as jnp

        num_correct = metrics.topks_correct(
            jnp.asarray(self.video_preds), jnp.asarray(self.video_labels), ks
        )
        for k, nc in zip(ks, num_correct):
            stats["top{}_acc".format(k)] = "{:.2f}".format(
                float(nc) / self.video_preds.shape[0] * 100.0
            )
        logging_util.log_json_stats(stats)
        self.stats = stats
        return stats


class EPICTestMeter:
    """Verb/noun/action multi-view test meter (reference ``meters.py:608+``)."""

    def __init__(self, num_videos: int, num_clips: int, num_cls: List[int],
                 overall_iters: int):
        self.num_clips = num_clips
        self.overall_iters = overall_iters
        self.iter_timer = Timer()
        self.verb_preds = np.zeros((num_videos, num_cls[0]), np.float32)
        self.noun_preds = np.zeros((num_videos, num_cls[1]), np.float32)
        self.verb_labels = np.zeros((num_videos,), np.int64)
        self.noun_labels = np.zeros((num_videos,), np.int64)
        self.metadata = np.zeros(num_videos, dtype=object)
        self.clip_count = np.zeros((num_videos,), np.int64)
        self.stats: Dict = {}

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def reset(self):
        self.clip_count[:] = 0
        self.verb_preds[:] = 0
        self.noun_preds[:] = 0
        self.verb_labels[:] = 0
        self.noun_labels[:] = 0

    def update_stats(self, preds, labels, metadata, clip_ids):
        verb_p, noun_p = np.asarray(preds[0]), np.asarray(preds[1])
        verb_l, noun_l = np.asarray(labels[0]), np.asarray(labels[1])
        clip_ids = np.asarray(clip_ids)
        for ind in range(verb_p.shape[0]):
            vid_id = int(clip_ids[ind]) // self.num_clips
            self.verb_labels[vid_id] = verb_l[ind]
            self.noun_labels[vid_id] = noun_l[ind]
            self.verb_preds[vid_id] += verb_p[ind]
            self.noun_preds[vid_id] += noun_p[ind]
            if metadata is not None:
                self.metadata[vid_id] = metadata[ind]
            self.clip_count[vid_id] += 1

    def log_iter_stats(self, cur_iter: int):
        eta_sec = self.iter_timer.seconds() * (self.overall_iters - cur_iter)
        logging_util.log_json_stats({
            "split": "test_iter",
            "cur_iter": "{}".format(cur_iter + 1),
            "eta": str(datetime.timedelta(seconds=int(eta_sec))),
            "time_diff": self.iter_timer.seconds(),
        })

    def finalize_metrics(self, ks=(1, 5)) -> Dict:
        import jax.numpy as jnp

        stats = {"split": "test_final"}
        verb = metrics.topk_accuracies(
            jnp.asarray(self.verb_preds), jnp.asarray(self.verb_labels), ks)
        noun = metrics.topk_accuracies(
            jnp.asarray(self.noun_preds), jnp.asarray(self.noun_labels), ks)
        action = metrics.multitask_topk_accuracies(
            (jnp.asarray(self.verb_preds), jnp.asarray(self.noun_preds)),
            (jnp.asarray(self.verb_labels), jnp.asarray(self.noun_labels)), ks)
        for k, v, n, a in zip(ks, verb, noun, action):
            stats[f"verb_top{k}_acc"] = "{:.2f}".format(float(v))
            stats[f"noun_top{k}_acc"] = "{:.2f}".format(float(n))
            stats[f"action_top{k}_acc"] = "{:.2f}".format(float(a))
        logging_util.log_json_stats(stats)
        self.stats = stats
        return stats
