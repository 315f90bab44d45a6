"""Data pipeline: transforms parity vs torch, loader sharding semantics,
tokenizer framing, dataset smoke, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.datasets import loader as loader_mod
from procedurevrl_tpu.datasets import transform
from procedurevrl_tpu.datasets.build import build_dataset
from procedurevrl_tpu.datasets.decoder import get_start_end_idx, temporal_sampling
from procedurevrl_tpu.datasets.tokenizer import EOT, SOT, HashTokenizer, tokenize


def _dummy_cfg(**overrides):
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.TEST.DATASET = "howto100m_develop"
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.MODEL.NUM_CLASSES = 7
    for k, v in overrides.items():
        node = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            node = getattr(node, p)
        setattr(node, leaf, v)
    return cfg


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_temporal_sampling_matches_torch():
    frames = np.arange(17 * 2).reshape(17, 2).astype(np.float32)
    ours = temporal_sampling(frames, 3, 30, 8)
    index = torch.clamp(torch.linspace(3, 30, 8), 0, 16).long()
    ref = torch.index_select(torch.tensor(frames), 0, index).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_uniform_crop_matches_reference_geometry():
    frames = np.random.RandomState(0).rand(2, 40, 60, 3).astype(np.float32)
    for idx in (0, 1, 2):
        out = transform.uniform_crop(frames, 32, idx)
        assert out.shape == (2, 32, 32, 3)
    # width > height: spatial_idx moves the x offset
    left = transform.uniform_crop(frames, 32, 0)
    right = transform.uniform_crop(frames, 32, 2)
    np.testing.assert_array_equal(left, frames[:, 4:36, 0:32, :])
    np.testing.assert_array_equal(right, frames[:, 4:36, 28:60, :])


def test_resize_matches_torch_bilinear():
    rng = np.random.RandomState(1)
    frames = rng.rand(2, 24, 32, 3).astype(np.float32)
    ours = transform._resize_clip(frames, 48, 64)
    t = torch.from_numpy(frames).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=(48, 64), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_tensor_normalize():
    frames = (np.ones((1, 4, 4, 3)) * 255).astype(np.uint8)
    out = transform.tensor_normalize(frames, [0.45] * 3, [0.225] * 3)
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-6)


# ---------------------------------------------------------------------------
# decoder helpers
# ---------------------------------------------------------------------------


def test_get_start_end_idx_deterministic():
    start, end = get_start_end_idx(300, 64, 2, 10)
    assert start == (300 - 64) * 2 / 10
    assert end == start + 63


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_tokenize_framing_and_truncation():
    tok = HashTokenizer()
    ids = tokenize(tok, ["hello world"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == SOT
    assert ids[0, 3] == EOT  # [SOT, hello, world, EOT, ...]
    assert ids[0, 4] == 0  # padded
    assert EOT in ids[0]
    # determinism
    np.testing.assert_array_equal(ids, tokenize(tok, ["hello world"]))
    long = " ".join(["word"] * 200)
    ids = tokenize(tok, [long], truncate=True)
    assert ids[0, -1] == EOT


# ---------------------------------------------------------------------------
# datasets + loader
# ---------------------------------------------------------------------------


def test_dummy_howto100m_pretrain_sample():
    cfg = _dummy_cfg(**{
        "TRAIN.TEXT": "/synthetic/",
        "TRAIN.LABEL_EMB": "/synthetic/bank.pth",
        "DEV.ORDER_PRETRAIN_ENABLED": True,
        "DEV.CLIP_VIS_FEAT_PATH": "/synthetic/feat/",
    })
    ds = build_dataset("howto100m_develop", cfg, "train")
    frames, label, idx, meta = ds[0]
    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    assert frames.shape == (M, 2, 32, 32, 3)
    assert meta["clip_text_ids"].shape == (M, 77)
    assert meta["clip_vis_feat"].shape == (M, 512)


def test_dummy_epickitchens_sample():
    cfg = _dummy_cfg(**{"TRAIN.DATASET": "Epickitchens"})
    ds = build_dataset("Epickitchens", cfg, "train")
    frames, label, idx, meta = ds[0]
    assert frames.shape == (2, 32, 32, 3)
    assert set(label) == {"verb", "noun"}


def test_dummy_ssv2_sample():
    cfg = _dummy_cfg()
    ds = build_dataset("Ssv2_m", cfg, "train")
    frames, label, idx, meta = ds[0]
    assert frames.shape == (2, 32, 32, 3)


def test_loader_host_sharding_partition():
    """Two hosts together cover each global batch exactly once."""
    cfg = _dummy_cfg()
    ds = build_dataset("howto100m_develop", cfg, "train")
    loaders = [
        loader_mod.Loader(ds, global_batch_size=16, shuffle=True,
                          drop_last=True, num_workers=2, num_hosts=2,
                          host_id=h, seed=3)
        for h in (0, 1)
    ]
    for l in loaders:
        l.set_epoch(1)
    batches = [list(iter(l)) for l in loaders]
    assert len(batches[0]) == len(batches[1]) == 4
    for b0, b1 in zip(*batches):
        ids = np.concatenate([b0[0]["index"], b1[0]["index"]])
        assert len(set(ids.tolist())) == 16  # disjoint halves of the batch


def test_loader_final_batch_padding():
    cfg = _dummy_cfg()
    ds = build_dataset("howto100m_develop", cfg, "train")  # 64 samples
    l = loader_mod.Loader(ds, global_batch_size=48, shuffle=False,
                          drop_last=False, num_workers=2)
    out = list(iter(l))
    assert len(out) == 2
    assert out[0][1] == 48 and out[1][1] == 16  # n_valid of padded last batch
    assert out[1][0]["frames"].shape[0] == 48  # static shape


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from procedurevrl_tpu.engine.steps import TrainState
    from procedurevrl_tpu.utils import checkpoint as cu

    cfg = _dummy_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    cu.save_checkpoint(str(tmp_path), state, cfg, epoch=4)
    assert cu.has_checkpoint(str(tmp_path))

    fresh = TrainState.create(
        {"w": jnp.zeros((2, 3), jnp.float32)}, tx
    )
    restored, epoch = cu.load_checkpoint(
        cu.get_last_checkpoint(str(tmp_path)), fresh
    )
    assert epoch == 4
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))


def test_rand_augment_shapes():
    from procedurevrl_tpu.datasets.rand_augment import RandAugment

    ra = RandAugment.from_config_str("rand-m9-n2-mstd0.5")
    frames = np.random.RandomState(0).randint(
        0, 256, (3, 32, 32, 3), np.uint8
    )
    out = ra(frames, np.random.RandomState(1))
    assert out.shape == frames.shape and out.dtype == np.uint8
    # clip-consistency: same op applied to identical frames gives identical out
    same = np.repeat(frames[:1], 3, axis=0)
    out2 = ra(same, np.random.RandomState(2))
    np.testing.assert_array_equal(out2[0], out2[1])
