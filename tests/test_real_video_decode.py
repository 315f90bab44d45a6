"""Real-video decode integration: actual encoded bytes through the decode
stack (VERDICT round-4: the ffmpeg-pipe/cv2 contract had never decoded a
real video in this image).

Writes real mp4v MP4s with ``cv2.VideoWriter`` (frame index encoded as the
frame's gray level so temporal sampling is checkable through the lossy
codec), then drives:

1. ``datasets/decoder.decode_window`` (cv2 backend) directly — frame
   count, dtype, window placement, temporal monotonicity;
2. ``Howto100m.__getitem__`` end-to-end in non-dummy finetune mode (real
   CSV index -> real decode -> scale jitter -> crop -> normalize), the
   contract of reference ``lib/datasets/howto100m.py:497-533``;
3. the threaded ``Loader`` over the real files — full host-pipeline batch.

Also emits a decode+preproc throughput number (clips/sec/core) via
``tools/loader_bench.py`` (run manually; BASELINE.md host-pipeline row).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.datasets import decoder
from procedurevrl_tpu.datasets.build import build_dataset
from procedurevrl_tpu.datasets.loader import Loader

FPS = 30.0
W, H = 64, 48
DUR = 12  # seconds
N_VIDEOS = 3


def _write_video(path: str) -> None:
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    assert w.isOpened(), "cv2.VideoWriter cannot open (no mp4v support?)"
    for idx in range(int(FPS * DUR)):
        # gray level = floor(idx * 0.6): recoverable through JPEG to +-3
        val = int(idx * 0.6)
        w.write(np.full((H, W, 3), val, np.uint8))
    w.release()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    rows = []
    for i in range(N_VIDEOS):
        name = f"clip{i}.mp4"
        _write_video(str(d / name))
        # 5-column windowed row: path,label,duration,start,end
        rows.append(f"clip{i},{i},{DUR},2,10")
    (d / "train.csv").write_text("\n".join(rows) + "\n")
    (d / "val.csv").write_text("\n".join(rows) + "\n")
    return str(d)


def _mean_gray(frame: np.ndarray) -> float:
    return float(np.asarray(frame, np.float64).mean())


def test_decode_window_cv2_real_bytes(video_dir):
    path = os.path.join(video_dir, "clip0.mp4")
    frames = decoder.decode_window(path, 2.0, 10.0, 8, backend="cv2")
    assert frames.shape == (8, H, W, 3) and frames.dtype == np.uint8
    grays = [_mean_gray(f) for f in frames]
    # window [2, 10) at 0.6 gray/frame: first sample >= ~2s*30fps*0.6 - tol
    assert grays[0] >= 2 * FPS * 0.6 - 5, grays
    assert grays[-1] <= 10 * FPS * 0.6 + 5, grays
    # temporal order survives encode/decode
    assert all(b > a for a, b in zip(grays, grays[1:])), grays


def _real_cfg(video_dir, **overrides):
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = False
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.TEST.DATASET = "howto100m_develop"
    cfg.TRAIN.TEXT = []          # finetune mode: no ASR/tokenizer
    cfg.DATA.PATH_TO_DATA_DIR = video_dir
    cfg.DATA.PATH_PREFIX = video_dir
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.DECODING_BACKEND = "cv2"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.FD = 8
    cfg.DATA.TRAIN_CROP_SIZE = 48
    cfg.DATA.TEST_CROP_SIZE = 48
    cfg.DATA.TRAIN_JITTER_SCALES = [52, 56]
    cfg.MODEL.NUM_CLASSES = N_VIDEOS
    for k, v in overrides.items():
        node = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            node = getattr(node, p)
        setattr(node, leaf, v)
    return cfg


def test_howto100m_getitem_real_decode_uint8(video_dir):
    """Default contract: TPU.HOST_UINT8 ships raw uint8 frames (the device
    normalizes in-jit)."""
    cfg = _real_cfg(video_dir)
    ds = build_dataset("howto100m_develop", cfg, "train")
    assert len(ds) == N_VIDEOS
    frames, label, index, extra = ds[1]
    assert frames.shape == (8, 48, 48, 3) and frames.dtype == np.uint8
    assert label == 1 and extra == {}
    # frames sampled across the [2, 10) s window: mean gray ~= frame 180's
    mid_gray = 6 * FPS * 0.6
    assert abs(float(frames.mean()) - mid_gray) < 15


def test_howto100m_getitem_real_decode_float(video_dir):
    """HOST_UINT8 off: host-side normalize to (x/255 - mean)/std."""
    cfg = _real_cfg(video_dir, **{"TPU.HOST_UINT8": False})
    ds = build_dataset("howto100m_develop", cfg, "train")
    frames, label, index, extra = ds[1]
    assert frames.shape == (8, 48, 48, 3) and frames.dtype == np.float32
    mid_gray = 6 * FPS * 0.6 / 255.0
    expect = (mid_gray - np.asarray(cfg.DATA.MEAN)) / np.asarray(cfg.DATA.STD)
    got = frames.mean(axis=(0, 1, 2))
    np.testing.assert_allclose(got, expect, atol=0.25)


def test_loader_over_real_videos(video_dir):
    cfg = _real_cfg(video_dir)
    ds = build_dataset("howto100m_develop", cfg, "train")
    loader = Loader(ds, global_batch_size=N_VIDEOS, shuffle=True,
                    drop_last=True, num_workers=2, prefetch_depth=1,
                    seed=0)
    loader.set_epoch(0)
    batches = list(iter(loader))
    assert len(batches) == 1
    batch, n_valid, _ = batches[0]
    assert batch["frames"].shape == (N_VIDEOS, 8, 48, 48, 3)
    assert sorted(np.asarray(batch["labels"]).tolist()) == list(range(N_VIDEOS))
    assert n_valid == N_VIDEOS


def test_decode_retry_on_corrupt_file(video_dir, tmp_path):
    """A truncated file must trip the retry-and-resample path, not crash
    (reference howto100m.py decode retries <= 20)."""
    import shutil

    d = tmp_path / "mixed"
    d.mkdir()
    for i in range(N_VIDEOS):
        shutil.copy(os.path.join(video_dir, f"clip{i}.mp4"),
                    d / f"clip{i}.mp4")
    # corrupt one video: keep the header-less tail only
    raw = (d / "clip1.mp4").read_bytes()
    (d / "clip1.mp4").write_bytes(raw[len(raw) // 2:])
    rows = [f"clip{i},{i},{DUR},2,10" for i in range(N_VIDEOS)]
    (d / "train.csv").write_text("\n".join(rows) + "\n")

    cfg = _real_cfg(str(d))
    ds = build_dataset("howto100m_develop", cfg, "train")
    frames, label, index, _ = ds[1]  # corrupt index resamples a good one
    assert frames.shape == (8, 48, 48, 3)
    assert label in range(N_VIDEOS)
