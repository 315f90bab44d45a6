"""uint8 host pipeline: dataset ships uint8 crops, the step normalizes on
device; numerics match the float path up to 8-bit quantization."""

import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.datasets import transform
from procedurevrl_tpu.datasets.build import build_dataset
from procedurevrl_tpu.engine.steps import normalize_frames

MEAN = [0.45] * 3
STD = [0.225] * 3


def test_uint8_vs_float_path_quantization_bound():
    frames = np.random.RandomState(0).randint(0, 256, (2, 50, 70, 3), np.uint8)
    kw = dict(spatial_idx=1, min_scale=56, max_scale=56, crop_size=48,
              mean=MEAN, std=STD)
    f32 = transform.spatial_sampling_fused(
        frames, rng=np.random.RandomState(3), **kw
    )
    u8 = transform.spatial_sampling_fused(
        frames, rng=np.random.RandomState(3), output_uint8=True, **kw
    )
    assert u8.dtype == np.uint8
    cfg = get_cfg()
    cfg.DATA.MEAN, cfg.DATA.STD = MEAN, STD
    dev = np.asarray(normalize_frames(jnp.asarray(u8), cfg))
    # 8-bit quantization of the bilinear output: |err| <= 0.5/255/std
    np.testing.assert_allclose(dev, f32, atol=0.5 / 255 / 0.225 + 1e-5)


def test_dummy_dataset_ships_uint8():
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.TPU.HOST_UINT8 = True
    ds = build_dataset("howto100m_develop", cfg, "train")
    frames, *_ = ds[0]
    assert frames.dtype == np.uint8

    cfg.TPU.HOST_UINT8 = False
    ds = build_dataset("howto100m_develop", cfg, "train")
    frames, *_ = ds[0]
    assert frames.dtype == np.float32
