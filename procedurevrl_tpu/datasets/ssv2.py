"""Something-Something-v2 frame-list dataset
(reference ``lib/datasets/ssv2_m.py:26-360``).

Loads per-video RGB frame directories listed in frame-list CSVs
(``{train,val}.csv`` with rows ``original_vido_id video_id frame_id path
labels``), samples NUM_FRAMES uniformly over the frame sequence
(SSv2's temporally-deterministic protocol), and applies the shared
normalize + spatial sampling pipeline.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from procedurevrl_tpu.datasets import transform
from procedurevrl_tpu.datasets.build import register_dataset
from procedurevrl_tpu.datasets.rng import EpochRNG, stable_hash
from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


@register_dataset("Ssv2_m")
class Ssv2(EpochRNG):
    def __init__(self, cfg, mode: str, num_retries: int = 10):
        assert mode in ("train", "val", "test")
        self.cfg = cfg
        self.mode = "val" if mode == "test" else mode
        self._test = mode == "test"
        self._num_clips = (
            cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
            if self._test else 1
        )
        self.dummy = cfg.DEV.LOAD_DUMMY_DATA
        self._construct_loader()

    def _construct_loader(self):
        self._video_frames = []  # list of (frame paths, label)
        self._spatial_temporal_idx = []
        csv = os.path.join(
            self.cfg.DATA.PATH_TO_DATA_DIR, f"{self.mode}.csv"
        )
        if self.dummy:
            for i in range(64):
                for idx in range(self._num_clips):
                    self._video_frames.append(
                        ([f"synthetic://s{i}/{j}" for j in range(32)],
                         i % self.cfg.MODEL.NUM_CLASSES)
                    )
                    self._spatial_temporal_idx.append(idx)
            return
        assert os.path.exists(csv), csv
        by_video = defaultdict(list)
        labels = {}
        with open(csv) as f:
            header = f.readline()
            for line in f.read().splitlines():
                parts = line.split()
                vid, _vid2, _fid, path, label = (
                    parts[0], parts[1], parts[2], parts[3], parts[-1]
                )
                by_video[vid].append(os.path.join(self.cfg.DATA.PATH_PREFIX, path))
                labels[vid] = int(label.strip('"'))
        for vid, frames in by_video.items():
            for idx in range(self._num_clips):
                self._video_frames.append((sorted(frames), labels[vid]))
                self._spatial_temporal_idx.append(idx)
        assert self._video_frames, f"empty split {csv}"

    def __len__(self):
        return len(self._video_frames)

    def _load_frame(self, path: str) -> np.ndarray:
        if path.startswith("synthetic://"):
            r = np.random.RandomState(stable_hash(path))
            return r.randint(0, 256, (240, 320, 3), np.uint8)
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise RuntimeError(f"cannot read {path}")
        return img[:, :, ::-1]

    def __getitem__(self, index: int):
        rng = self.sample_rng(index, 104729, deterministic=self._test)
        paths, label = self._video_frames[index]
        T = self.cfg.DATA.NUM_FRAMES
        n = len(paths)
        if self.mode == "train":
            # jittered segment sampling (reference ssv2_m.py:200-230)
            seg_size = float(n - 1) / T
            idx = [
                int(round(seg_size * i)) + rng.randint(
                    0, max(int(round(seg_size * (i + 1))) - int(round(seg_size * i)), 1)
                )
                for i in range(T)
            ]
        else:
            idx = np.linspace(0, n - 1, T).round().astype(int).tolist()
        frames = np.stack([self._load_frame(paths[min(i, n - 1)]) for i in idx])

        if self.mode == "train":
            spatial_idx = -1
            min_s, max_s = self.cfg.DATA.TRAIN_JITTER_SCALES
            crop = self.cfg.DATA.TRAIN_CROP_SIZE
        else:
            spatial_idx = (
                self._spatial_temporal_idx[index] % self.cfg.TEST.NUM_SPATIAL_CROPS
                if self._test and self.cfg.TEST.NUM_SPATIAL_CROPS > 1 else 1
            )
            min_s = max_s = crop = self.cfg.DATA.TEST_CROP_SIZE
        frames = transform.tensor_normalize(
            frames, self.cfg.DATA.MEAN, self.cfg.DATA.STD
        )
        frames = transform.spatial_sampling(
            frames, spatial_idx=spatial_idx, min_scale=min_s, max_scale=max_s,
            crop_size=crop,
            random_horizontal_flip=False,  # SSv2 labels are direction-sensitive
            rng=rng,
        ).astype(np.float32)
        return frames, label, index, {}
