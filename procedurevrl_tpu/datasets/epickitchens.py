"""EPIC-Kitchens-100 dataset (reference ``lib/datasets/epickitchens.py:30-390``).

Pickle annotations -> records with (participant, video_id, start/stop
timestamps, verb/noun labels); decode the [start, stop] window by timestamp
(the reference uses pytorchvideo ``EncodedVideo.get_clip``; here the
timestamp window goes straight to the decoder backends).  Color
jitter/grayscale augmentation per reference ``:373-389``; RandAugment is
applied when ``DATA.USE_RAND_AUGMENT`` via the simplified policy in
``transform.py``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from procedurevrl_tpu.datasets import decoder, transform
from procedurevrl_tpu.datasets.build import register_dataset
from procedurevrl_tpu.datasets.rng import EpochRNG
from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


def timestamp_to_sec(ts: str) -> float:
    """'HH:MM:SS.ff' -> seconds (reference ``epickitchens_record.py:9-14``)."""
    h, m, s = ts.split(":")
    return int(h) * 3600 + int(m) * 60 + float(s)


class EpicKitchensVideoRecord:
    """reference ``lib/datasets/epickitchens_record.py``."""

    def __init__(self, tup):
        self._index = str(tup[0])
        self._series = tup[1]

    @property
    def participant(self):
        return self._series["participant_id"]

    @property
    def untrimmed_video_name(self):
        return self._series["video_id"]

    @property
    def start_frame(self):
        return int(round(timestamp_to_sec(self._series["start_timestamp"]) * self.fps))

    @property
    def end_frame(self):
        return int(round(timestamp_to_sec(self._series["stop_timestamp"]) * self.fps))

    @property
    def start_sec(self):
        return timestamp_to_sec(self._series["start_timestamp"])

    @property
    def end_sec(self):
        return timestamp_to_sec(self._series["stop_timestamp"])

    @property
    def fps(self):
        is_100 = len(self.untrimmed_video_name.split("_")[1]) == 3
        return 50 if is_100 else 60

    @property
    def num_frames(self):
        return self.end_frame - self.start_frame

    @property
    def label(self) -> Dict[str, int]:
        return {
            "verb": self._series["verb_class"] if "verb_class" in self._series else -1,
            "noun": self._series["noun_class"] if "noun_class" in self._series else -1,
        }

    @property
    def metadata(self):
        return {"narration_id": self._index}


@register_dataset("Epickitchens")
class Epickitchens(EpochRNG):
    def __init__(self, cfg, mode: str):
        assert mode in ("train", "val", "test", "train+val")
        self.cfg = cfg
        self.mode = mode
        self.target_fps = 60
        self._num_clips = (
            cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
            if mode == "test" else 1
        )
        self.dummy = cfg.DEV.LOAD_DUMMY_DATA
        self._construct_loader()

    def _annotation_files(self):
        c = self.cfg.EPICKITCHENS
        return {
            "train": [c.TRAIN_LIST],
            "val": [c.VAL_LIST],
            "test": [c.TEST_LIST],
            "train+val": [c.TRAIN_LIST, c.VAL_LIST],
        }[self.mode]

    def _construct_loader(self):
        self._video_records = []
        self._spatial_temporal_idx = []
        files = [
            os.path.join(self.cfg.EPICKITCHENS.ANNOTATIONS_DIR, f)
            for f in self._annotation_files()
        ]
        if self.dummy:
            import pandas as pd

            n = 64
            rows = {
                "participant_id": ["P01"] * n,
                "video_id": ["P01_101"] * n,
                "start_timestamp": ["00:00:%05.2f" % (i * 2.0) for i in range(n)],
                "stop_timestamp": ["00:00:%05.2f" % (i * 2.0 + 2.0) for i in range(n)],
                "verb_class": [i % 97 for i in range(n)],
                "noun_class": [i % 300 for i in range(n)],
            }
            df = pd.DataFrame(rows)
            for tup in df.iterrows():
                for idx in range(self._num_clips):
                    self._video_records.append(EpicKitchensVideoRecord(tup))
                    self._spatial_temporal_idx.append(idx)
            return
        import pandas as pd

        for f in files:
            for tup in pd.read_pickle(f).iterrows():
                for idx in range(self._num_clips):
                    self._video_records.append(EpicKitchensVideoRecord(tup))
                    self._spatial_temporal_idx.append(idx)
        assert self._video_records, "empty EPIC split"

    def __len__(self):
        return len(self._video_records)

    def _video_path(self, record) -> str:
        return os.path.join(
            self.cfg.EPICKITCHENS.VISUAL_DATA_DIR, record.participant,
            "videos", record.untrimmed_video_name + ".MP4",
        )

    def __getitem__(self, index: int):
        rng = self.sample_rng(index, 7919, deterministic=self.mode == "test")
        record = self._video_records[index]
        if self.mode in ("train", "val", "train+val"):
            spatial_idx = -1
            min_s, max_s = self.cfg.DATA.TRAIN_JITTER_SCALES
            crop = self.cfg.DATA.TRAIN_CROP_SIZE
        else:
            spatial_idx = (
                self._spatial_temporal_idx[index] % self.cfg.TEST.NUM_SPATIAL_CROPS
            )
            min_s = max_s = crop = self.cfg.DATA.TEST_CROP_SIZE

        path = self._video_path(record)
        if self.dummy and not os.path.exists(path):
            r = np.random.RandomState(index % 2 ** 31)
            frames = r.randint(
                0, 256, (self.cfg.DATA.NUM_FRAMES, 256, 456, 3), np.uint8
            )
        elif self.cfg.DEV.EPIC_USE_FRAME_LOADER:
            frames = self._pack_frames_from_dir(record, rng)
        else:
            frames = decoder.decode_window(
                path, record.start_sec, record.end_sec, self.cfg.DATA.NUM_FRAMES
            )
        if self.mode == "train" and self.cfg.DATA.USE_RAND_AUGMENT:
            # clip-consistent RandAugment on uint8 frames
            # (reference epickitchens.py:149-162)
            from procedurevrl_tpu.datasets.rand_augment import RandAugment

            if not hasattr(self, "_rand_aug"):
                policy = self.cfg.DATA.AUTO_AUGMENT or "rand-m9-n2-mstd0.5"
                self._rand_aug = RandAugment.from_config_str(policy)
            frames = self._rand_aug(frames.astype(np.uint8), rng)
        frames = transform.tensor_normalize(
            frames, self.cfg.DATA.MEAN, self.cfg.DATA.STD
        )
        if self.mode == "train" and (
            self.cfg.DATA.COLORJITTER or self.cfg.DATA.GRAYSCALE
        ):
            frames = self._frames_augmentation(frames, rng)
        frames = transform.spatial_sampling(
            frames, spatial_idx=spatial_idx, min_scale=min_s, max_scale=max_s,
            crop_size=crop, random_horizontal_flip=self.cfg.DATA.RANDOM_FLIP,
            rng=rng,
        ).astype(np.float32)
        label = record.label
        return (
            frames,
            {"verb": label["verb"], "noun": label["noun"]},
            index,
            record.metadata,
        )

    def _pack_frames_from_dir(self, record, rng):
        """RGB-frame-directory loader (reference ``lib/datasets/frame_loader.py:31-63``):
        sample NUM_FRAMES at SAMPLING_RATE within the action segment, clamped
        to the segment, and read ``frame_{:010d}.jpg`` files."""
        import cv2

        fps = record.fps
        T = self.cfg.DATA.NUM_FRAMES
        sr = self.cfg.DATA.SAMPLING_RATE
        seg_len = record.end_frame - record.start_frame
        clip_len = T * sr * fps / self.target_fps
        if self.mode in ("train", "train+val"):
            offset = rng.uniform(0, max(seg_len - clip_len, 0))
        else:
            offset = max(seg_len - clip_len, 0) / 2.0
        idx = record.start_frame + offset + np.arange(T) * sr * fps / self.target_fps
        idx = np.clip(np.round(idx), record.start_frame,
                      record.end_frame - 1).astype(int)
        frame_dir = os.path.join(
            self.cfg.EPICKITCHENS.VISUAL_DATA_DIR, record.participant,
            "rgb_frames", record.untrimmed_video_name,
        )
        frames = []
        for i in idx:
            img = cv2.imread(os.path.join(frame_dir, f"frame_{i + 1:010d}.jpg"))
            if img is None:
                raise RuntimeError(f"missing frame {i} in {frame_dir}")
            frames.append(img[:, :, ::-1])
        return np.stack(frames)

    def _frames_augmentation(self, frames, rng):
        """Color jitter + random grayscale (reference ``epickitchens.py:373-389``)."""
        if self.cfg.DATA.COLORJITTER:
            frames = transform.color_jitter(frames, 0.4, 0.4, 0.4, rng=rng)
        if self.cfg.DATA.GRAYSCALE and rng.uniform() < 0.2:
            frames = transform.grayscale(frames)
        return frames
