"""Elementwise primitive parity vs torch (the checkpoint-numerics 'hard
parts' from SURVEY.md §7: GELU form, fp32 LayerNorm, nearest interpolation,
sinusoidal time embeddings)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from procedurevrl_tpu.ops import common as C


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ref = torch.nn.GELU()(torch.tensor(x)).numpy()
    out = np.asarray(C.gelu_exact(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # and that the tanh approximation would NOT match (guards the footgun)
    approx = np.asarray(jax.nn.gelu(jnp.asarray(x)))
    assert np.abs(approx - ref).max() > 1e-4


def test_quick_gelu_matches_clip():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ref = (torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))).numpy()
    np.testing.assert_allclose(np.asarray(C.quick_gelu(jnp.asarray(x))), ref,
                               atol=1e-6)


def test_layer_norm_fp32_matches_torch_in_bf16():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 32).astype(np.float32)
    w = rng.randn(32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    ref = F.layer_norm(torch.tensor(x), (32,), torch.tensor(w),
                       torch.tensor(b), eps=1e-6).numpy()
    out = np.asarray(C.layer_norm_fp32(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), 1e-6))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # bf16 input: still accumulated in fp32
    out_bf = C.layer_norm_fp32(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w),
                               jnp.asarray(b), 1e-6)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_bf, np.float32), ref, atol=3e-2)


@pytest.mark.parametrize("in_len,out_len", [(8, 16), (16, 8), (14, 9), (5, 13)])
def test_interpolate_nearest_1d_matches_torch(in_len, out_len):
    x = np.arange(in_len * 3, dtype=np.float32).reshape(1, 3, in_len)
    ref = F.interpolate(torch.tensor(x), size=out_len, mode="nearest").numpy()
    out = np.asarray(C.interpolate_nearest_1d(jnp.asarray(x), out_len, axis=2))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape,out_hw", [((14, 14), (7, 7)), ((7, 7), (14, 14)),
                                          ((14, 14), (9, 11))])
def test_interpolate_nearest_2d_matches_torch(shape, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, *shape).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), size=out_hw, mode="nearest").numpy()
    out = np.asarray(C.interpolate_nearest_2d(jnp.asarray(x), out_hw,
                                              axes=(2, 3)))
    np.testing.assert_array_equal(out, ref)


def test_sinusoidal_time_embedding_matches_reference_math():
    """reference lib/models/diffusion_model.py:34-47 restated in torch."""
    dim = 128
    t = torch.tensor([0.0, 1.0, 3.0])
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = torch.exp(torch.arange(half) * -emb)
    args = t[:, None] * freqs[None, :]
    ref = torch.cat((args.sin(), args.cos()), dim=-1).numpy()
    out = np.asarray(C.sinusoidal_time_embedding(jnp.asarray([0.0, 1.0, 3.0]),
                                                 dim))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_drop_path_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000, 4))
    out = C.drop_path(x, 0.3, False, key)
    kept = np.asarray(out[:, 0]) != 0
    # survivors are rescaled by 1/keep
    np.testing.assert_allclose(np.asarray(out)[kept][:, 0], 1 / 0.7, rtol=1e-5)
    assert 0.6 < kept.mean() < 0.8


def test_grouped_layer_norm_matches_reshape_reference():
    """grouped_layer_norm_fp32 (per-head stats via structured MXU dots in
    the head-last layout) == LayerNorm over a [.., H, d] reshape view,
    values and grads."""
    import jax
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.common import (
        grouped_layer_norm_fp32, layer_norm_fp32_vpu,
    )

    rng = np.random.RandomState(11)
    H, d = 4, 96
    x = jnp.asarray(rng.randn(3, 50, H * d).astype(np.float32))
    sc = jnp.asarray(rng.randn(d).astype(np.float32))
    bi = jnp.asarray(rng.randn(d).astype(np.float32))
    ref = layer_norm_fp32_vpu(
        x.reshape(3, 50, H, d), sc, bi, 1e-6).reshape(3, 50, H * d)
    out = grouped_layer_norm_fp32(x, sc, bi, H, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    f1 = lambda x, s, b: jnp.sum(jnp.sin(
        grouped_layer_norm_fp32(x, s, b, H, 1e-6)))
    f2 = lambda x, s, b: jnp.sum(jnp.sin(
        layer_norm_fp32_vpu(x.reshape(3, 50, H, d), s, b, 1e-6)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(x, sc, bi)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b).reshape(np.asarray(a).shape),
            atol=3e-5, rtol=3e-5)


def test_gelu_exact_stored_matches_gelu_exact():
    """gelu_exact_stored: identical values, autodiff-identical gradients
    (fp32), and a remat policy keeps the stored derivative (the backward
    under jax.checkpoint must NOT re-run erf when 'gelu_grad' is saved)."""
    import procedurevrl_tpu.ops.common as C

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(37, 130).astype(np.float32) * 2.0)
    np.testing.assert_allclose(np.asarray(C.gelu_exact_stored(x)),
                               np.asarray(C.gelu_exact(x)),
                               atol=1e-7, rtol=1e-7)
    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(C.gelu_exact_stored(x))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(C.gelu_exact(x))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-6, rtol=2e-6)

    # under remat with the policy, the saved residual is used (grad still
    # exact) — mirrors the model block policies
    f = jax.checkpoint(
        lambda x: jnp.sum(jnp.sin(C.gelu_exact_stored(x))),
        policy=jax.checkpoint_policies.save_only_these_names("gelu_grad"),
    )
    g3 = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2),
                               atol=2e-6, rtol=2e-6)

    # bf16: value path matches the plain bf16 gelu to bf16 resolution
    xb = x.astype(jnp.bfloat16)
    a = np.asarray(C.gelu_exact_stored(xb).astype(jnp.float32))
    b = np.asarray(C.gelu_exact(xb).astype(jnp.float32))
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)
