"""Flash-attention kernel vs. the XLA einsum path (interpret mode on CPU).

Covers the TimeSformer spatial-pass geometry (N=197, D=64) including the
non-128-aligned padding path, forward and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procedurevrl_tpu.ops.attention import attention_core
from procedurevrl_tpu.ops.pallas_attention import flash_mhsa


@pytest.mark.parametrize("n", [197, 128, 130])
def test_flash_forward_matches_xla(n):
    rng = np.random.RandomState(0)
    b, h, d = 2, 4, 64  # d*2 = 128 lanes -> 2 heads per block
    q, k, v = (
        jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) for _ in range(3)
    )
    scale = d ** -0.5
    ref = attention_core(q, k, v, scale)
    out = flash_mhsa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grad_matches_xla():
    rng = np.random.RandomState(1)
    b, h, n, d = 1, 2, 197, 64
    q, k, v = (
        jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) for _ in range(3)
    )
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_core(q, k, v, scale)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_mhsa(q, k, v, scale)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5)


def test_flash_bf16_close():
    rng = np.random.RandomState(2)
    b, h, n, d = 2, 2, 197, 64
    qf, kf, vf = (rng.randn(b, h, n, d).astype(np.float32) for _ in range(3))
    scale = d ** -0.5
    ref = attention_core(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16), scale,
    )
    out = flash_mhsa(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16), scale,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )
