"""Kinetics loader (reference ``lib/datasets/kinetics.py:18-294``).

Registered default (``TRAIN.DATASET = "kinetics"``); CSV rows
``path label``.  Same multi-view test protocol as HowTo100M.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from procedurevrl_tpu.datasets import decoder, transform
from procedurevrl_tpu.datasets.build import register_dataset
from procedurevrl_tpu.datasets.rng import EpochRNG, stable_hash
from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


@register_dataset("Kinetics")
class Kinetics(EpochRNG):
    def __init__(self, cfg, mode: str, num_retries: int = 10):
        assert mode in ("train", "val", "test")
        self.cfg = cfg
        self.mode = mode
        self._num_retries = num_retries
        self._num_clips = (
            cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
            if mode == "test" else 1
        )
        self.dummy = cfg.DEV.LOAD_DUMMY_DATA
        self._construct_loader()

    def _construct_loader(self):
        self._path_to_videos = []
        self._labels = []
        self._spatial_temporal_idx = []
        csv = os.path.join(self.cfg.DATA.PATH_TO_DATA_DIR, f"{self.mode}.csv")
        if self.dummy:
            for i in range(64):
                for idx in range(self._num_clips):
                    self._path_to_videos.append(f"synthetic://k{i}")
                    self._labels.append(i % self.cfg.MODEL.NUM_CLASSES)
                    self._spatial_temporal_idx.append(idx)
            return
        assert os.path.exists(csv), csv
        with open(csv) as f:
            for line in f.read().splitlines():
                path, label = line.split(self.cfg.DATA.PATH_LABEL_SEPARATOR)[:2]
                for idx in range(self._num_clips):
                    self._path_to_videos.append(
                        os.path.join(self.cfg.DATA.PATH_PREFIX, path)
                    )
                    self._labels.append(int(label))
                    self._spatial_temporal_idx.append(idx)
        assert self._path_to_videos, f"empty split {csv}"

    def __len__(self):
        return len(self._path_to_videos)

    def __getitem__(self, index):
        short_cycle_idx = None
        if isinstance(index, tuple):  # multigrid short cycle
            index, short_cycle_idx = index
        rng = self.sample_rng(index, 999983, deterministic=self.mode == "test")
        if self.mode in ("train", "val"):
            temporal_idx, spatial_idx = -1, -1
            min_s, max_s = self.cfg.DATA.TRAIN_JITTER_SCALES
            crop = self.cfg.DATA.TRAIN_CROP_SIZE
            if short_cycle_idx in (0, 1):
                # reference kinetics.py:142-158: shrink the crop for the two
                # short-cycle phases; scale shrinks proportionally.
                # DEFAULT_S is snapshotted by init_multigrid; fall back to
                # the configured crop for standalone loaders
                default_s = self.cfg.MULTIGRID.DEFAULT_S or crop
                crop = int(round(
                    self.cfg.MULTIGRID.SHORT_CYCLE_FACTORS[short_cycle_idx]
                    * default_s
                ))
            if self.cfg.MULTIGRID.DEFAULT_S > 0:
                min_s = int(round(
                    float(min_s) * crop / self.cfg.MULTIGRID.DEFAULT_S
                ))
        else:
            temporal_idx = (
                self._spatial_temporal_idx[index] // self.cfg.TEST.NUM_SPATIAL_CROPS
            )
            spatial_idx = (
                self._spatial_temporal_idx[index] % self.cfg.TEST.NUM_SPATIAL_CROPS
            )
            min_s = max_s = crop = self.cfg.DATA.TEST_CROP_SIZE

        for i_try in range(self._num_retries):
            path = self._path_to_videos[index]
            try:
                if path.startswith("synthetic://"):
                    r = np.random.RandomState(stable_hash(path))
                    frames = r.randint(
                        0, 256, (self.cfg.DATA.NUM_FRAMES, 240, 320, 3), np.uint8
                    )
                else:
                    frames = decoder.decode_full(
                        path,
                        self.cfg.DATA.SAMPLING_RATE,
                        self.cfg.DATA.NUM_FRAMES,
                        temporal_idx,
                        self.cfg.TEST.NUM_ENSEMBLE_VIEWS,
                        target_fps=self.cfg.DATA.TARGET_FPS,
                        rng=rng,
                    )
            except Exception:
                frames = None
            if frames is None:
                index = int(rng.randint(0, len(self._path_to_videos)))
                continue
            frames = transform.tensor_normalize(
                frames, self.cfg.DATA.MEAN, self.cfg.DATA.STD
            )
            frames = transform.spatial_sampling(
                frames, spatial_idx=spatial_idx, min_scale=min_s,
                max_scale=max_s, crop_size=crop,
                random_horizontal_flip=self.cfg.DATA.RANDOM_FLIP, rng=rng,
            ).astype(np.float32)
            return frames, self._labels[index], index, {}
        raise RuntimeError(f"Failed to fetch video after {self._num_retries} retries.")
