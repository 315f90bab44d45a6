"""Native fused preprocessing vs the numpy/cv2 reference path."""

import numpy as np
import pytest

from procedurevrl_tpu.datasets import transform, videoproc


pytestmark = pytest.mark.skipif(
    not videoproc.available(), reason="native toolchain unavailable"
)

MEAN = [0.45, 0.45, 0.45]
STD = [0.225, 0.225, 0.225]


def test_resize_matches_cv2():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, 36, 64, 3), np.uint8)
    ours = videoproc.resize_bilinear(frames, 72, 128)
    ref = transform._resize_clip(frames.astype(np.float32), 72, 128)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_fused_matches_numpy_chain():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (4, 40, 60, 3), np.uint8)
    new_h, new_w = 48, 72
    y, x, crop = 5, 9, 32
    for flip in (False, True):
        ours = videoproc.fused_preprocess(
            frames, new_h, new_w, y, x, crop, flip, MEAN, STD
        )
        ref = transform._resize_clip(frames.astype(np.float32), new_h, new_w)
        ref = ref[:, y : y + crop, x : x + crop, :]
        if flip:
            ref = ref[:, :, ::-1, :]
        ref = (ref / 255.0 - np.asarray(MEAN, np.float32)) / np.asarray(
            STD, np.float32
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_spatial_sampling_fused_matches_fallback_random_path():
    """Same RNG seed -> same geometric decisions -> numerically equal output
    (up to resize backend tolerance)."""
    rng_a = np.random.RandomState(7)
    rng_b = np.random.RandomState(7)
    frames = np.random.RandomState(2).randint(0, 256, (2, 50, 70, 3), np.uint8)
    fused = transform.spatial_sampling_fused(
        frames, spatial_idx=-1, min_scale=56, max_scale=64, crop_size=48,
        mean=MEAN, std=STD, rng=rng_a,
    )
    ref = transform.tensor_normalize(frames, MEAN, STD)
    ref = transform.spatial_sampling(
        ref, spatial_idx=-1, min_scale=56, max_scale=64, crop_size=48,
        rng=rng_b,
    )
    assert fused.shape == ref.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(fused, ref, atol=1e-2)


def test_spatial_sampling_fused_uniform_crops():
    frames = np.random.RandomState(3).randint(0, 256, (2, 50, 70, 3), np.uint8)
    for idx in (0, 1, 2):
        fused = transform.spatial_sampling_fused(
            frames, spatial_idx=idx, min_scale=56, max_scale=56, crop_size=48,
            mean=MEAN, std=STD, rng=np.random.RandomState(0),
        )
        ref = transform.tensor_normalize(frames, MEAN, STD)
        ref = transform.spatial_sampling(
            ref, spatial_idx=idx, min_scale=56, max_scale=56, crop_size=48,
            rng=np.random.RandomState(0),
        )
        np.testing.assert_allclose(fused, ref, atol=1e-2)
