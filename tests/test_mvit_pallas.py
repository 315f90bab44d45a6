"""MViT fused pooled-attention kernel vs the XLA path (interpret on CPU).

Covers ragged query tiles (qN not a multiple of the tile), rel-pos bias
expansion, the spliced cls key, and gradients through q/k/v and the rel-pos
tables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.mvit import MultiScaleAttention


def _attn(use_pallas):
    return MultiScaleAttention(
        dim=64, dim_out=64, input_size=(2, 24, 24), num_heads=1,
        qkv_bias=True, kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(),
        stride_kv=(1, 3, 3), mode="conv", has_cls_embed=True,
        rel_pos_spatial=True, rel_pos_temporal=True, residual_pooling=True,
        use_pallas=use_pallas,
    )


@pytest.fixture(scope="module")
def setup():
    thw = (2, 24, 24)
    N = 1 + int(np.prod(thw))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, N, 64) * 0.5, jnp.float32)
    params = _attn(False).init(jax.random.PRNGKey(0), x, thw)["params"]
    return x, thw, params


def test_mvit_fused_forward_matches_xla(setup):
    x, thw, params = setup
    ref, thw_ref = _attn(False).apply({"params": params}, x, thw)
    out, thw_out = _attn(True).apply({"params": params}, x, thw)
    assert thw_ref == thw_out
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mvit_fused_grads_match_xla(setup):
    x, thw, params = setup

    def loss(use_pallas, params, x):
        out, _ = _attn(use_pallas).apply({"params": params}, x, thw)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(lambda p, x: loss(False, p, x), argnums=(0, 1))(params, x)
    g_out = jax.grad(lambda p, x: loss(True, p, x), argnums=(0, 1))(params, x)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = jax.tree_util.tree_leaves_with_path(g_out)
    for (path, a), (_, b) in zip(flat_out, flat_ref):
        # 2e-4: the fused path contracts the rel-pos bias in a different
        # order (expander matmuls vs XLA's 8-d reshape/add), so long fp32
        # reduction chains reassociate
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_mvit_saveprobs_matches_recompute_backward(monkeypatch):
    """The saved-probabilities backward (opt-in MVIT_SAVE_PROBS=1) and
    the default recompute-in-backward path (=0) produce matching grads
    through q/k/v/cls and the rel-pos tables."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit,
    )

    rng = np.random.RandomState(11)
    BH, d = 4, 96
    q_shape, k_shape = (2, 10, 10), (2, 7, 7)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    q, k, v = mk(BH, qn, d), mk(BH, kn, d), mk(BH, kn, d)
    kc, vc = mk(BH, 1, d), mk(BH, 1, d)
    rel = mk(BH, qn, sum(k_shape))  # concatenated [rt | rh | rw]
    args = (q, k, v, kc, vc, rel)
    scale = d ** -0.5

    def loss(*a):
        return jnp.sum(jnp.sin(flash_attention_mvit(*a, k_shape, scale)))

    monkeypatch.setenv("MVIT_SAVE_PROBS", "0")
    g_ref = jax.grad(loss, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("MVIT_SAVE_PROBS", "1")
    g_new = jax.grad(loss, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_mvit_delta_backward_matches_plain_recompute(monkeypatch):
    """The FlashAttention-2 delta backward (MVIT_DELTA=1: jacobian rowsum
    from the saved forward output) matches the plain recompute backward
    (=0) on BOTH kernel families (per-head and head-last)."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit, flash_attention_mvit_hl,
    )

    rng = np.random.RandomState(13)
    k_shape = (2, 7, 7)
    kn = int(np.prod(k_shape))
    qn = 2 * 10 * 10
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)

    # per-head family
    BH, d = 4, 96
    args = (mk(BH, qn, d), mk(BH, kn, d), mk(BH, kn, d), mk(BH, 1, d),
            mk(BH, 1, d), mk(BH, qn, sum(k_shape)))
    scale = d ** -0.5

    def loss_ph(*a):
        return jnp.sum(jnp.sin(flash_attention_mvit(*a, k_shape, scale)))

    monkeypatch.setenv("MVIT_DELTA", "0")
    g_ref = jax.grad(loss_ph, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("MVIT_DELTA", "1")
    g_new = jax.grad(loss_ph, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_new, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"ph grad arg {i}")

    # head-last family
    B, H, d2 = 2, 2, 64
    C = H * d2
    args_hl = (mk(B, qn, C), mk(B, kn, C), mk(B, kn, C), mk(B, 1, C),
               mk(B, 1, C), mk(B, qn, H * sum(k_shape)))
    scale2 = d2 ** -0.5

    def loss_hl(*a):
        return jnp.sum(jnp.sin(
            flash_attention_mvit_hl(*a, k_shape, H, scale2)))

    monkeypatch.setenv("MVIT_DELTA", "0")
    h_ref = jax.grad(loss_hl, argnums=tuple(range(6)))(*args_hl)
    monkeypatch.setenv("MVIT_DELTA", "1")
    h_new = jax.grad(loss_hl, argnums=tuple(range(6)))(*args_hl)
    for i, (a, b) in enumerate(zip(h_new, h_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"hl grad arg {i}")


def test_mvit_hl_kernel_matches_per_head_kernel():
    """flash_attention_mvit_hl (head-last blocks, in-kernel head loop)
    reproduces flash_attention_mvit (per-head [B*H] grid), fwd and grads."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit, flash_attention_mvit_hl,
    )

    rng = np.random.RandomState(3)
    B, H, d = 2, 4, 96
    q_shape, k_shape = (4, 7, 7), (4, 4, 4)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k, v = mk(B, H, qn, d), mk(B, H, kn, d), mk(B, H, kn, d)
    kc, vc = mk(B, H, 1, d), mk(B, H, 1, d)
    rel = mk(B, H, qn, sum(k_shape))  # concatenated [rt | rh | rw]
    scale = d ** -0.5

    fold = lambda x: jnp.asarray(x.reshape(B * H, x.shape[2], x.shape[3]))
    hl = lambda x: jnp.asarray(
        np.transpose(x, (0, 2, 1, 3)).reshape(B, x.shape[2], H * x.shape[3]))

    def loss_ref(*args):
        return jnp.sum(jnp.sin(flash_attention_mvit(*args, k_shape, scale)))

    def loss_hl(*args):
        return jnp.sum(jnp.sin(
            flash_attention_mvit_hl(*args, k_shape, H, scale)))

    tensors = (q, k, v, kc, vc, rel)
    out_ref = flash_attention_mvit(*[fold(t) for t in tensors], k_shape,
                                   scale).reshape(B, H, qn, d)
    out_hl = np.asarray(flash_attention_mvit_hl(
        *[hl(t) for t in tensors], k_shape, H, scale,
    )).reshape(B, qn, H, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out_hl, np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(
        *[fold(t) for t in tensors])
    g_hl = jax.grad(loss_hl, argnums=tuple(range(6)))(
        *[hl(t) for t in tensors])
    for i, (a, b) in enumerate(zip(g_hl, g_ref)):
        bb = np.asarray(b).reshape(B, H, b.shape[1], b.shape[2]).transpose(
            0, 2, 1, 3).reshape(np.asarray(a).shape)
        np.testing.assert_allclose(np.asarray(a), bb, atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_mvit_hl_kernel_head_groups():
    """Wide-key geometry forces hg < H (channel-blocked grid axis); parity
    vs the per-head kernel must hold across group boundaries."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        _hl_geometry, _round_up, flash_attention_mvit,
        flash_attention_mvit_hl,
    )

    B, H, d = 1, 8, 96
    q_shape, k_shape = (2, 10, 10), (8, 7, 7)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    kp = _round_up(kn + 1, 128)
    hg, w, tq = _hl_geometry(kp, H * d, H, d)
    assert hg < H, (hg, w, tq)  # the point of this test

    rng = np.random.RandomState(5)
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k, v = mk(B, H, qn, d), mk(B, H, kn, d), mk(B, H, kn, d)
    kc, vc = mk(B, H, 1, d), mk(B, H, 1, d)
    rel = mk(B, H, qn, sum(k_shape))  # concatenated [rt | rh | rw]
    scale = d ** -0.5
    fold = lambda x: jnp.asarray(x.reshape(B * H, x.shape[2], x.shape[3]))
    hl = lambda x: jnp.asarray(
        np.transpose(x, (0, 2, 1, 3)).reshape(B, x.shape[2], H * x.shape[3]))
    tensors = (q, k, v, kc, vc, rel)
    ref = flash_attention_mvit(*[fold(t) for t in tensors], k_shape,
                               scale).reshape(B, H, qn, d)
    out = np.asarray(flash_attention_mvit_hl(
        *[hl(t) for t in tensors], k_shape, H, scale,
    )).reshape(B, qn, H, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mvit_hl_kt_kernel_matches_per_head_kernel():
    """flash_attention_mvit_hl_kt (k-tiled online softmax) reproduces
    flash_attention_mvit at the real wide-key geometry (kN=1568 -> four
    ragged key chunks), fwd and grads, across multiple query tiles."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        _hl_kt_geometry, flash_attention_mvit, flash_attention_mvit_hl_kt,
    )

    B, H, d = 1, 2, 96
    q_shape, k_shape = (6, 10, 10), (8, 14, 14)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    hg, w, (tq_f, _), (tq_b, _) = _hl_kt_geometry(H * d, H, d)
    # ragged/multi-tile coverage in both directions
    assert qn > tq_b or qn % tq_b, (tq_b, qn)
    assert qn % tq_f, (tq_f, qn)

    rng = np.random.RandomState(7)
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    q, k, v = mk(B, H, qn, d), mk(B, H, kn, d), mk(B, H, kn, d)
    kc, vc = mk(B, H, 1, d), mk(B, H, 1, d)
    rel = mk(B, H, qn, sum(k_shape))  # concatenated [rt | rh | rw]
    scale = d ** -0.5
    fold = lambda x: jnp.asarray(x.reshape(B * H, x.shape[2], x.shape[3]))
    hl = lambda x: jnp.asarray(
        np.transpose(x, (0, 2, 1, 3)).reshape(B, x.shape[2], H * x.shape[3]))
    tensors = (q, k, v, kc, vc, rel)

    ref = flash_attention_mvit(*[fold(t) for t in tensors], k_shape,
                               scale).reshape(B, H, qn, d)
    out = np.asarray(flash_attention_mvit_hl_kt(
        *[hl(t) for t in tensors], k_shape, H, scale,
    )).reshape(B, qn, H, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_ref(*args):
        return jnp.sum(jnp.sin(flash_attention_mvit(*args, k_shape, scale)))

    def loss_kt(*args):
        return jnp.sum(jnp.sin(
            flash_attention_mvit_hl_kt(*args, k_shape, H, scale)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(
        *[fold(t) for t in tensors])
    g_kt = jax.grad(loss_kt, argnums=tuple(range(6)))(
        *[hl(t) for t in tensors])
    for i, (a, b) in enumerate(zip(g_kt, g_ref)):
        bb = np.asarray(b).reshape(B, H, b.shape[1], b.shape[2]).transpose(
            0, 2, 1, 3).reshape(np.asarray(a).shape)
        np.testing.assert_allclose(np.asarray(a), bb, atol=5e-5, rtol=5e-5,
                                   err_msg=f"grad arg {i}")


def test_mvit_kt_model_dispatch(monkeypatch):
    """MVIT_KT=1 routes the wide-key block through the k-tiled kernel at
    the MODEL level (MultiScaleAttention dispatch): outputs and grads
    match the default per-head path.  Covers the dispatch wiring (pack
    layout, scale cast, kt_supported gate) that the direct-kernel tests
    bypass."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        hl_supported, kt_supported,
    )

    thw = (8, 14, 14)
    dim, H = 192, 2
    # wide key set: whole-key head-last geometry must be infeasible so the
    # default path is the per-head kernel and MVIT_KT=1 picks the k-tiled
    assert not hl_supported(int(np.prod(thw)), dim, H)
    assert kt_supported(dim, H)

    attn = MultiScaleAttention(
        dim=dim, dim_out=dim, input_size=thw, num_heads=H,
        qkv_bias=True, kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(),
        stride_kv=(1, 1, 1), mode="conv", has_cls_embed=True,
        rel_pos_spatial=True, rel_pos_temporal=True, residual_pooling=True,
        use_pallas=True,
    )
    N = 1 + int(np.prod(thw))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, N, dim) * 0.5, jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, thw)["params"]

    def loss(params, x):
        out, _ = attn.apply({"params": params}, x, thw)
        return jnp.sum(jnp.sin(out))

    monkeypatch.delenv("MVIT_KT", raising=False)
    ref, _ = attn.apply({"params": params}, x, thw)
    g_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("MVIT_KT", "1")
    out, _ = attn.apply({"params": params}, x, thw)
    g_out = jax.grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_out),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_mvit_hl_kernel_bf16_close():
    """bf16 hl kernel grads stay close to the fp32 kernel (the backward's
    gradient matmuls run with INPUT-dtype operands + fp32 accumulation, so
    bf16 inputs exercise a different MXU path than the fp32 parity tests)."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit_hl,
    )

    rng = np.random.RandomState(9)
    B, H, d = 2, 4, 96
    q_shape, k_shape = (4, 7, 7), (4, 4, 4)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    mk = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    hl = lambda x: np.transpose(x, (0, 2, 1, 3)).reshape(
        B, x.shape[2], H * x.shape[3])
    tensors = [hl(mk(B, H, n_, w_)) for n_, w_ in
               [(qn, d), (kn, d), (kn, d), (1, d), (1, d)]]
    # rel travels in the compute dtype since the fused-bias change
    # (models/mvit.py pack casts rel_cat to q.dtype)
    rel = hl(mk(B, H, qn, sum(k_shape)))
    scale = d ** -0.5

    def loss(dt, *a):
        args = [jnp.asarray(t, dt) for t in a]
        return jnp.sum(jnp.sin(flash_attention_mvit_hl(
            *args, k_shape, H, scale).astype(jnp.float32)))

    args = tuple(tensors) + (rel,)
    g32 = jax.grad(lambda *a: loss(jnp.float32, *a),
                   argnums=tuple(range(6)))(*args)
    g16 = jax.grad(lambda *a: loss(jnp.bfloat16, *a),
                   argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g16, g32)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f"grad arg {i}")


def test_mvit_relv2_matches_einsum_path(monkeypatch):
    """MVIT_RELV2 (one stacked-table GEMM + static selection) matches the
    default per-axis batched einsums in value AND in the gradients through
    q and the raw rel-pos tables (incl. the length-interpolation branch),
    for both selection modes."""
    from procedurevrl_tpu.models.mvit import (
        _interp_rel_pos, _rel_cat_v2, _rel_dist_table,
    )

    rng = np.random.RandomState(3)
    B, H, d = 2, 4, 24
    q_shape, k_shape = (4, 6, 6), (4, 3, 3)
    qn = int(np.prod(q_shape))
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.5, jnp.float32)
    qb = mk(B, qn, H * d)
    # rel_pos_h deliberately at a non-matching length to engage interp
    rpt = mk(2 * max(q_shape[0], k_shape[0]) - 1, d)
    rph = mk(9, d)
    rpw = mk(2 * max(q_shape[2], k_shape[2]) - 1, d)

    def ref(qb, rpt, rph, rpw):
        q_t, q_h, q_w = q_shape
        k_t, k_h, k_w = k_shape
        Rt = _interp_rel_pos(rpt, 2 * max(q_t, k_t) - 1)[
            jnp.asarray(_rel_dist_table(q_t, k_t))]
        Rh = _interp_rel_pos(rph, 2 * max(q_h, k_h) - 1)[
            jnp.asarray(_rel_dist_table(q_h, k_h))]
        Rw = _interp_rel_pos(rpw, 2 * max(q_w, k_w) - 1)[
            jnp.asarray(_rel_dist_table(q_w, k_w))]
        r_q = qb.reshape(B, q_t, q_h, q_w, H, d)
        rel_t = jnp.einsum("bthwyc,tkc->bthwyk", r_q, Rt,
                           preferred_element_type=jnp.float32)
        rel_h = jnp.einsum("bthwyc,hkc->bthwyk", r_q, Rh,
                           preferred_element_type=jnp.float32)
        rel_w = jnp.einsum("bthwyc,wkc->bthwyk", r_q, Rw,
                           preferred_element_type=jnp.float32)
        return jnp.concatenate([rel_t, rel_h, rel_w], axis=-1)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    val_ref = ref(qb, rpt, rph, rpw)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(qb, rpt, rph, rpw)
    for mode in ("einsum", "gather"):
        fn = lambda qb, rpt, rph, rpw: _rel_cat_v2(
            qb, q_shape, k_shape, H, d, rpt, rph, rpw, mode=mode)
        np.testing.assert_allclose(np.asarray(fn(qb, rpt, rph, rpw)),
                                   np.asarray(val_ref),
                                   atol=2e-5, rtol=2e-5, err_msg=mode)
        g_new = jax.grad(loss(fn), argnums=(0, 1, 2, 3))(qb, rpt, rph, rpw)
        for i, (a, b) in enumerate(zip(g_new, g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5,
                                       err_msg=f"{mode} grad arg {i}")


def test_mvit_relv2_model_dispatch(setup, monkeypatch):
    """MVIT_RELV2=gather|einsum at the MODEL level (MultiScaleAttention
    fused-attention dispatch): outputs and grads match the default
    producer-einsum path."""
    x, thw, params = setup

    def loss(params, x):
        out, _ = _attn(True).apply({"params": params}, x, thw)
        return jnp.sum(jnp.sin(out))

    monkeypatch.delenv("MVIT_RELV2", raising=False)
    ref, _ = _attn(True).apply({"params": params}, x, thw)
    g_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    for mode in ("einsum", "gather"):
        monkeypatch.setenv("MVIT_RELV2", mode)
        out, _ = _attn(True).apply({"params": params}, x, thw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5, err_msg=mode)
        g_out = jax.grad(loss, argnums=(0, 1))(params, x)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_out),
                jax.tree_util.tree_leaves_with_path(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"{mode} {jax.tree_util.keystr(path)}")


def test_mvit_shift_modes_match_reference(monkeypatch):
    """MVIT_SHIFT=clamp|none match the reference-faithful row-max chain
    (=max, the default) in values and grads on the per-head kernel —
    softmax is shift-invariant and the clamp never engages for bounded
    logits (mirrors the spatial family's SPATIAL_SHIFT test)."""
    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit,
    )

    rng = np.random.RandomState(23)
    BH, d = 4, 96
    q_shape, k_shape = (2, 10, 10), (2, 7, 7)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    args = (mk(BH, qn, d), mk(BH, kn, d), mk(BH, kn, d),
            mk(BH, 1, d), mk(BH, 1, d), mk(BH, qn, sum(k_shape)))
    scale = d ** -0.5

    def loss(*a):
        return jnp.sum(jnp.sin(flash_attention_mvit(*a, k_shape, scale)))

    monkeypatch.setenv("MVIT_SHIFT", "max")
    v_ref = float(loss(*args))
    g_ref = jax.grad(loss, argnums=tuple(range(6)))(*args)
    for mode in ("clamp", "none"):
        monkeypatch.setenv("MVIT_SHIFT", mode)
        v_new = float(loss(*args))
        g_new = jax.grad(loss, argnums=tuple(range(6)))(*args)
        np.testing.assert_allclose(v_new, v_ref, rtol=1e-5, err_msg=mode)
        for i, (a, b) in enumerate(zip(g_new, g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5,
                                       err_msg=f"{mode} grad arg {i}")
