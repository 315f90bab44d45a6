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


# ---------------------------------------------------------------------------
# CLS-split kernel (frame stream + separate cls stream)
# ---------------------------------------------------------------------------


def _cls_ref(q, k, v, qc, kc, vc, scale):
    """Reference: concat cls in front, plain attention, split."""
    qq = jnp.concatenate([qc, q], axis=2)
    kk = jnp.concatenate([kc, k], axis=2)
    vv = jnp.concatenate([vc, v], axis=2)
    out = attention_core(qq, kk, vv, scale)
    return out[:, :, 1:], out[:, :, :1]


def _fold(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _unfold(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("n", [196, 128, 130])
def test_flash_cls_forward_matches_xla(n):
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_cls

    rng = np.random.RandomState(3)
    b, h, d = 2, 4, 64
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32) for _ in range(3))
    qc, kc, vc = (jnp.asarray(rng.randn(b, h, 1, d), jnp.float32) for _ in range(3))
    scale = d ** -0.5
    ref_f, ref_c = _cls_ref(q, k, v, qc, kc, vc, scale)
    out_f, out_c = flash_attention_cls(
        _fold(q), _fold(k), _fold(v), _fold(qc), _fold(kc), _fold(vc), h, scale
    )
    np.testing.assert_allclose(
        np.asarray(_unfold(out_f, h)), np.asarray(ref_f), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(_unfold(out_c, h)), np.asarray(ref_c), atol=2e-5, rtol=2e-5
    )


def test_flash_cls_grad_matches_xla():
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_cls

    rng = np.random.RandomState(4)
    b, h, n, d = 1, 2, 196, 64
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32) for _ in range(3))
    qc, kc, vc = (jnp.asarray(rng.randn(b, h, 1, d), jnp.float32) for _ in range(3))
    scale = d ** -0.5

    def loss_ref(*args):
        f, c = _cls_ref(*args, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(c))

    def loss_flash(q, k, v, qc, kc, vc):
        f, c = flash_attention_cls(
            _fold(q), _fold(k), _fold(v), _fold(qc), _fold(kc), _fold(vc),
            h, scale,
        )
        return jnp.sum(jnp.sin(_unfold(f, h))) + 2.0 * jnp.sum(
            jnp.cos(_unfold(c, h))
        )

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(q, k, v, qc, kc, vc)
    g_out = jax.grad(loss_flash, argnums=tuple(range(6)))(q, k, v, qc, kc, vc)
    for a, b_ in zip(g_out, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5
        )


def test_mhsa_cls_pallas_matches_fallback():
    """Full mhsa_cls dispatcher: pallas path vs XLA concat fallback."""
    from procedurevrl_tpu.ops.attention import mhsa_cls

    rng = np.random.RandomState(5)
    b, n, c, heads = 2, 196, 128, 2
    x = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    cls_x = jnp.asarray(rng.randn(b, 1, c), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32)
    qkv_b = jnp.asarray(rng.randn(3 * c) * 0.05, jnp.float32)
    proj_w = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
    proj_b = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    args = (qkv_w, qkv_b, proj_w, proj_b, heads)
    f0, c0 = mhsa_cls(x, cls_x, *args, use_pallas=False)
    f1, c1 = mhsa_cls(x, cls_x, *args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-5, rtol=2e-5)


def test_flash_cls_fused_qkv_matches_split_kernel():
    """flash_attention_cls_qkv (single window-permuted [B, N, 3C] operand)
    reproduces flash_attention_cls (separate q/k/v), values and grads."""
    from procedurevrl_tpu.ops.attention import qkv_window_perm
    from procedurevrl_tpu.ops.pallas_attention import (
        _heads_per_block, flash_attention_cls, flash_attention_cls_qkv,
    )

    rng = np.random.RandomState(6)
    b, n, heads, d = 2, 196, 4, 64
    c = heads * d
    scale = d ** -0.5
    q, k, v = (jnp.asarray(rng.randn(b, n, c), jnp.float32) for _ in range(3))
    qc, kc, vc = (jnp.asarray(rng.randn(b, 1, c), jnp.float32)
                  for _ in range(3))
    perm = np.asarray(qkv_window_perm(c, heads, _heads_per_block(d, heads)))

    def to_windows(qq, kk, vv):
        return jnp.concatenate([qq, kk, vv], axis=-1)[..., perm]

    def loss_split(q, k, v, qc, kc, vc):
        f, cl = flash_attention_cls(q, k, v, qc, kc, vc, heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    def loss_fused(q, k, v, qc, kc, vc):
        f, cl = flash_attention_cls_qkv(
            to_windows(q, k, v), to_windows(qc, kc, vc), heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    args = (q, k, v, qc, kc, vc)
    v_ref, g_ref = jax.value_and_grad(loss_split, argnums=tuple(range(6)))(*args)
    v_new, g_new = jax.value_and_grad(loss_fused, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for i, (a, b_) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_mhsa_cls_fused_qkv_matches_split_path(monkeypatch):
    """mhsa_cls with SPATIAL_FUSED_QKV on vs off: same outputs and same
    gradients through the projection weights (the permutation is applied to
    the weight columns, so d(qkv_w) must come back in standard order)."""
    from procedurevrl_tpu.ops.attention import mhsa_cls

    rng = np.random.RandomState(7)
    b, n, c, heads = 2, 196, 128, 2
    x = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    cls_x = jnp.asarray(rng.randn(b, 1, c), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32)
    qkv_b = jnp.asarray(rng.randn(3 * c) * 0.05, jnp.float32)
    proj_w = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
    proj_b = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)

    def loss(x, cls_x, qkv_w, qkv_b, proj_w, proj_b):
        f, cl = mhsa_cls(x, cls_x, qkv_w, qkv_b, proj_w, proj_b, heads,
                         use_pallas=True)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    args = (x, cls_x, qkv_w, qkv_b, proj_w, proj_b)
    monkeypatch.setenv("SPATIAL_FUSED_QKV", "0")
    v_ref, g_ref = jax.value_and_grad(loss, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("SPATIAL_FUSED_QKV", "1")
    v_new, g_new = jax.value_and_grad(loss, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for i, (a, b_) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


# ---------------------------------------------------------------------------
# temporal kernel (layout-native attention over T)
# ---------------------------------------------------------------------------


def _temporal_ref(qkv, h, scale):
    b, t, n, c3 = qkv.shape
    c = c3 // 3
    q, k, v = jnp.split(qkv.reshape(b, t * n, c3), 3, axis=-1)
    resh = lambda x: x.reshape(b, t, n, h, c // h).transpose(0, 2, 3, 1, 4)
    q, k, v = resh(q), resh(k), resh(v)  # [b, n, h, t, d]
    out = attention_core(
        q.reshape(b * n, h, t, c // h), k.reshape(b * n, h, t, c // h),
        v.reshape(b * n, h, t, c // h), scale,
    )
    return out.reshape(b, n, h, t, c // h).transpose(0, 3, 1, 2, 4).reshape(
        b, t, n, c)


@pytest.mark.parametrize("t,n,heads", [(8, 196, 12), (4, 196, 4), (8, 50, 2)])
def test_flash_temporal_forward_matches_xla(t, n, heads):
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_temporal

    rng = np.random.RandomState(7)
    c = heads * 64
    qkv = jnp.asarray(rng.randn(2, t, n, 3 * c) * 0.3, jnp.float32)
    scale = 64 ** -0.5
    ref = _temporal_ref(qkv, heads, scale)
    out = flash_attention_temporal(qkv, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_temporal_grad_matches_xla():
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_temporal

    rng = np.random.RandomState(8)
    t, n, heads = 4, 60, 2
    c = heads * 64
    qkv = jnp.asarray(rng.randn(1, t, n, 3 * c) * 0.3, jnp.float32)
    scale = 64 ** -0.5

    def loss_ref(qkv):
        return jnp.sum(jnp.sin(_temporal_ref(qkv, heads, scale)))

    def loss_out(qkv):
        return jnp.sum(jnp.sin(flash_attention_temporal(qkv, heads, scale)))

    g_ref = jax.grad(loss_ref)(qkv)
    g_out = jax.grad(loss_out)(qkv)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


def test_mhsa_temporal_pallas_matches_fallback(monkeypatch):
    from procedurevrl_tpu.ops.attention import mhsa_temporal

    monkeypatch.setenv("TEMPORAL_PALLAS", "1")  # kernel is opt-in
    rng = np.random.RandomState(9)
    b, t, n, c, heads = 2, 8, 60, 128, 2
    x = jnp.asarray(rng.randn(b, t, n, c), jnp.float32)
    qkv_w = jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32)
    qkv_b = jnp.asarray(rng.randn(3 * c) * 0.05, jnp.float32)
    proj_w = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
    proj_b = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    a = mhsa_temporal(x, qkv_w, qkv_b, proj_w, proj_b, heads, use_pallas=False)
    b_ = mhsa_temporal(x, qkv_w, qkv_b, proj_w, proj_b, heads, use_pallas=True)
    np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                               atol=2e-5, rtol=2e-5)


def test_flash_temporal_batched_matches_v2(monkeypatch):
    """TEMPORAL_BATCHED=1 (v3 batched-dot kernels) reproduces the v2
    kernels, values and grads — same math, one K=T*w / N=T*w dot where v2
    issues T tiny dots."""
    from procedurevrl_tpu.ops.pallas_attention import (
        flash_attention_temporal,
    )

    rng = np.random.RandomState(11)
    b, t, n, heads, d = 2, 8, 196, 2, 64
    qkv = jnp.asarray(rng.randn(b, t, n, 3 * heads * d) * 0.3, jnp.float32)
    scale = d ** -0.5

    def loss(x):
        o = flash_attention_temporal(x, heads, scale)
        return jnp.sum(jnp.sin(o))

    monkeypatch.setenv("TEMPORAL_BATCHED", "0")
    v_ref, g_ref = jax.value_and_grad(loss)(qkv)
    monkeypatch.setenv("TEMPORAL_BATCHED", "1")
    v_new, g_new = jax.value_and_grad(loss)(qkv)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


def test_flash_cls_qkv_saved_probs_matches_recompute(monkeypatch):
    """SPATIAL_SAVE_PROBS=1 (backward from forward-saved probabilities)
    matches the recompute backward, values and grads."""
    from procedurevrl_tpu.ops.attention import qkv_window_perm
    from procedurevrl_tpu.ops.pallas_attention import (
        _heads_per_block, flash_attention_cls_qkv,
    )

    rng = np.random.RandomState(13)
    b, n, heads, d = 2, 196, 4, 64
    c = heads * d
    scale = d ** -0.5
    perm = np.asarray(qkv_window_perm(c, heads, _heads_per_block(d, heads)))
    qkv = jnp.asarray(rng.randn(b, n, 3 * c), jnp.float32)[..., perm]
    qkv_c = jnp.asarray(rng.randn(b, 1, 3 * c), jnp.float32)[..., perm]

    def loss(qkv, qkv_c):
        f, cl = flash_attention_cls_qkv(qkv, qkv_c, heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    # the saved-probs branch gates on a single-device runtime (multi-device
    # falls through to the partition-aware recompute path); under the
    # 8-virtual-device test mesh the gate must be forced open or this test
    # silently compares recompute to recompute
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    monkeypatch.setenv("SPATIAL_SAVE_PROBS", "0")
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    monkeypatch.setenv("SPATIAL_SAVE_PROBS", "1")
    v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for i, (a, b_) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_flash_cls_qkv_delta_backward_matches_default(monkeypatch):
    """SPATIAL_DELTA=1 (FlashAttention-2 jacobian-rowsum-from-output; a
    measured kernel-level NEGATIVE kept as a documented knob) matches the
    default saved-probs ones-dot backward, values and grads."""
    from procedurevrl_tpu.ops.attention import qkv_window_perm
    from procedurevrl_tpu.ops.pallas_attention import (
        _heads_per_block, flash_attention_cls_qkv,
    )

    rng = np.random.RandomState(17)
    b, n, heads, d = 2, 196, 4, 64
    c = heads * d
    scale = d ** -0.5
    perm = np.asarray(qkv_window_perm(c, heads, _heads_per_block(d, heads)))
    qkv = jnp.asarray(rng.randn(b, n, 3 * c), jnp.float32)[..., perm]
    qkv_c = jnp.asarray(rng.randn(b, 1, 3 * c), jnp.float32)[..., perm]

    def loss(qkv, qkv_c):
        f, cl = flash_attention_cls_qkv(qkv, qkv_c, heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    # force the single-device saved-probs gate open (see the saved-probs
    # test above): the delta kernel only exists on that path
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    monkeypatch.setenv("SPATIAL_SAVE_PROBS", "1")
    monkeypatch.setenv("SPATIAL_DELTA", "0")
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    monkeypatch.setenv("SPATIAL_DELTA", "1")
    v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for i, (a, b_) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_flash_cls_qkv_pipelined_matches_grid_kernel(monkeypatch):
    """The manually pipelined forward (SPATIAL_PIPE=1: HBM-resident
    operands, NBUF-deep rotating buffers, cls row DMA'd into the padding
    row) reproduces the auto-pipelined grid kernel — values and grads
    (the backward is shared; only the custom_vjp forward changes)."""
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_cls_qkv

    rng = np.random.RandomState(11)
    b, n, heads, d = 24, 49, 4, 64
    c = heads * d
    scale = d ** -0.5
    qkv = jnp.asarray(rng.randn(b, n, 3 * c) * 0.3, jnp.float32)
    qkv_c = jnp.asarray(rng.randn(b, 1, 3 * c) * 0.3, jnp.float32)

    def loss(qkv, qkv_c):
        f, cl = flash_attention_cls_qkv(qkv, qkv_c, heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    monkeypatch.delenv("SPATIAL_PIPE", raising=False)
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    monkeypatch.setenv("SPATIAL_PIPE", "1")
    v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for i, (a, b_) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_flash_cls_qkv_pipelined_production_geometry(monkeypatch):
    """Pipelined forward at the PRODUCTION head-group/buffer geometry:
    H=12 -> G=6 head windows (exercises the clsout double-buffer g-2
    waits, the range(G-2, G) drain) and b=36/gb=12 -> NBUF=3 slot
    rotation — the branches the small G=2/nbuf=2 test never enters."""
    from procedurevrl_tpu.ops import pallas_attention as pa

    rng = np.random.RandomState(13)
    b, n, heads, d = 36, 49, 12, 64
    c = heads * d
    scale = d ** -0.5
    qkv = jnp.asarray(rng.randn(b, n, 3 * c) * 0.3, jnp.float32)
    qkv_c = jnp.asarray(rng.randn(b, 1, 3 * c) * 0.3, jnp.float32)
    ref = pa._flash_cls_qkv_fwd(qkv, qkv_c, heads, scale)
    monkeypatch.setenv("SPATIAL_PIPE", "1")
    assert pa._pipe_nbuf() == 3 and b // pa._batch_group(b) == 3
    out = pa._flash_cls_qkv_fwd_pipe(qkv, qkv_c, heads, scale)
    for i, (a, b_) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"output {i}")


def test_flash_cls_qkv_shift_modes_match_reference(monkeypatch):
    """Every SPATIAL_SHIFT mode (max = reference-faithful row-max
    subtract, clamp = the default elementwise min(s, 80), none) and
    SPATIAL_RECIP=1 (reciprocal-multiply normalize) produce the same
    softmax values and grads — softmax is shift-invariant and the clamp
    never engages for bounded logits."""
    from procedurevrl_tpu.ops.attention import qkv_window_perm
    from procedurevrl_tpu.ops.pallas_attention import (
        _heads_per_block, flash_attention_cls_qkv,
    )

    rng = np.random.RandomState(17)
    b, n, heads, d = 2, 196, 4, 64
    c = heads * d
    scale = d ** -0.5
    perm = np.asarray(qkv_window_perm(c, heads, _heads_per_block(d, heads)))
    qkv = jnp.asarray(rng.randn(b, n, 3 * c), jnp.float32)[..., perm]
    qkv_c = jnp.asarray(rng.randn(b, 1, 3 * c), jnp.float32)[..., perm]

    def loss(qkv, qkv_c):
        f, cl = flash_attention_cls_qkv(qkv, qkv_c, heads, scale)
        return jnp.sum(jnp.sin(f)) + 2.0 * jnp.sum(jnp.cos(cl))

    monkeypatch.setenv("SPATIAL_SHIFT", "max")
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
    for knob, val in (("SPATIAL_SHIFT", "clamp"), ("SPATIAL_SHIFT", "none"),
                      ("SPATIAL_RECIP", "1")):
        monkeypatch.setenv(knob, val)
        v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(qkv, qkv_c)
        monkeypatch.setenv("SPATIAL_SHIFT", "max")
        monkeypatch.delenv("SPATIAL_RECIP", raising=False)
        np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5,
                                   err_msg=f"{knob}={val}")
        for i, (a, b_) in enumerate(zip(g_new, g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-5, rtol=5e-5,
                                       err_msg=f"{knob}={val} grad arg {i}")


def test_flash_temporal_shift_modes_match_reference(monkeypatch):
    """TEMPORAL_SHIFT=clamp|none match the roll-max chain (=max, default)
    in values and grads on the temporal v2 kernel — the clamp replaces the
    whole log2(128/hpb) roll-max-doubling sequence with one min."""
    from procedurevrl_tpu.ops.pallas_attention import flash_attention_temporal

    rng = np.random.RandomState(29)
    t, n, heads = 8, 60, 2
    c = heads * 64
    qkv = jnp.asarray(rng.randn(1, t, n, 3 * c) * 0.3, jnp.float32)
    scale = 64 ** -0.5

    def loss(qkv):
        return jnp.sum(jnp.sin(flash_attention_temporal(qkv, heads, scale)))

    monkeypatch.setenv("TEMPORAL_SHIFT", "max")
    v_ref = float(loss(qkv))
    g_ref = jax.grad(loss)(qkv)
    for mode in ("clamp", "none"):
        monkeypatch.setenv("TEMPORAL_SHIFT", mode)
        v_new = float(loss(qkv))
        g_new = jax.grad(loss)(qkv)
        np.testing.assert_allclose(v_new, v_ref, rtol=1e-5, err_msg=mode)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"{mode} grad")
