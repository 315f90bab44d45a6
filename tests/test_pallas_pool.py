"""Pallas depthwise 3-D pool vs. the XLA depthwise conv (interpret mode).

``ops/pallas_pool.depthwise_pool3d`` replaces the ``lax.conv_general_dilated``
in ``models/mvit.DepthwisePool3D`` (reference
``lib/models/slowfast_mvit/attention.py:236-276``).  Oracle here IS that
conv; forward + both gradients, every supported stride, both the Pallas
kernel and the pure-XLA tap formulation, plus the model-level knob.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procedurevrl_tpu.ops.pallas_pool import (
    depthwise_pool3d, depthwise_pool3d_taps, max_pool3d_taps,
    max_pool_supported, out_hw, supported,
)


def _conv_oracle(x5, w27, s):
    """The DepthwisePool3D conv formulation (NDHWC, groups=C)."""
    C = x5.shape[-1]
    w = w27.reshape(3, 3, 3, 1, C)
    return jax.lax.conv_general_dilated(
        x5, w, window_strides=(1, s, s), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C,
    )


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


# (B, T, H, W, C) covering an MViT-ish spread: non-square HW, W not a
# multiple of 8, C both 128-aligned and not.
GEOMS = [(2, 8, 14, 14, 96), (1, 4, 13, 10, 128), (2, 2, 7, 7, 256)]


@pytest.mark.parametrize("s", [1, 2, 4, 8])
@pytest.mark.parametrize("geom", GEOMS)
@pytest.mark.parametrize("use_kernel", [True, False])
def test_pool_forward_matches_conv(s, geom, use_kernel):
    rng = np.random.RandomState(s)
    x = _rand(rng, *geom)
    w = _rand(rng, 27, geom[-1])
    ref = _conv_oracle(x, w, s)
    out = depthwise_pool3d(x, w, s, use_kernel)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("s", [1, 2, 4])
@pytest.mark.parametrize("use_kernel", [True, False])
def test_pool_grads_match_conv(s, use_kernel):
    rng = np.random.RandomState(10 + s)
    B, T, H, W, C = 1, 4, 9, 11, 128
    x = _rand(rng, B, T, H, W, C)
    w = _rand(rng, 27, C)

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_conv_oracle(x, w, s)))

    def loss_pool(x, w):
        return jnp.sum(jnp.sin(depthwise_pool3d(x, w, s, use_kernel)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gp = jax.grad(loss_pool, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_pool_bf16_close():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 14, 14, 128).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, 128).astype(np.float32), jnp.bfloat16)
    ref = _conv_oracle(x, w, 1)
    out = depthwise_pool3d(x, w, 1, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.08)


def test_taps_forward_alias():
    rng = np.random.RandomState(4)
    x = _rand(rng, 1, 2, 8, 8, 64)
    w = _rand(rng, 27, 64)
    np.testing.assert_allclose(
        np.asarray(depthwise_pool3d_taps(x, w, (1, 2, 2))),
        np.asarray(_conv_oracle(x, w, 2)), atol=2e-5, rtol=2e-5)


def test_supported_gate():
    assert supported((3, 3, 3), (1, 2, 2))
    assert supported((3, 3, 3), (1, 1, 1))
    assert not supported((3, 3, 3), (2, 2, 2))     # temporal stride
    assert not supported((3, 3, 3), (1, 3, 3))     # stride not in {1,2,4,8}
    assert not supported((1, 3, 3), (1, 2, 2))     # non-3x3x3 kernel
    assert not supported((3, 3, 3), (1, 2, 4))     # anisotropic


@pytest.mark.parametrize("kernel,stride", [
    ((1, 3, 3), (1, 2, 2)),   # the skip pool at stage transitions
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2)),
    ((1, 1, 1), (1, 2, 2)),
])
def test_max_pool_taps_matches_reduce_window(kernel, stride):
    rng = np.random.RandomState(7)
    x = _rand(rng, 2, 4, 13, 11, 96)
    assert max_pool_supported(kernel, stride)

    def ref(x):
        window = (1,) + kernel + (1,)
        strides = (1,) + stride + (1,)
        pads = ((0, 0),) + tuple((k // 2, k // 2) for k in kernel) + ((0, 0),)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window,
                                     strides, pads)

    out = max_pool3d_taps(x, kernel, stride)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x)),
                               atol=0, rtol=0)
    # gradients: continuous random input -> unique argmax -> identical
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(ref(x))))(x)
    gt = jax.grad(lambda x: jnp.sum(jnp.sin(max_pool3d_taps(
        x, kernel, stride))))(x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                               atol=2e-6, rtol=2e-6)


def test_max_pool_supported_gate():
    assert max_pool_supported((1, 3, 3), (1, 2, 2))
    assert not max_pool_supported((1, 5, 5), (1, 4, 4))  # k=5 skip pool


@pytest.mark.parametrize("mode", ["kernel", "taps"])
def test_model_pool_knob_matches_conv(mode, monkeypatch):
    """DepthwisePool3D under MVIT_POOL={kernel,taps} == the conv default,
    values and parameter/input grads, with head-tiled weights.  Stride 1:
    the model routes only stride-1 pools through the knob (strided pools
    measured negative at kernel level, BASELINE.md round 4)."""
    from procedurevrl_tpu.models.mvit import DepthwisePool3D

    rng = np.random.RandomState(5)
    heads, hd = 2, 64
    m = DepthwisePool3D(hd, (3, 3, 3), (1, 1, 1), jnp.float32, heads=heads)
    x = _rand(rng, 2, 4, 14, 14, heads * hd)
    params = m.init(jax.random.PRNGKey(0), x)

    def run(x, params):
        return m.apply(params, x)

    monkeypatch.delenv("MVIT_POOL", raising=False)
    ref = run(x, params)
    gr = jax.grad(lambda x, p: jnp.sum(jnp.cos(run(x, p))),
                  argnums=(0, 1))(x, params)
    monkeypatch.setenv("MVIT_POOL", mode)
    out = run(x, params)
    gp = jax.grad(lambda x, p: jnp.sum(jnp.cos(run(x, p))),
                  argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=5e-5, rtol=5e-5)
    pw_ref = jax.tree_util.tree_leaves(gr[1])[0]
    pw = jax.tree_util.tree_leaves(gp[1])[0]
    np.testing.assert_allclose(np.asarray(pw), np.asarray(pw_ref),
                               atol=5e-5, rtol=5e-5)
