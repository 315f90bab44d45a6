"""Fused flash self-attention Pallas kernel for the TimeSformer hot path.

The spatial pass of divided space-time attention runs on sequences of
H*W + 1 = 197 tokens with head_dim 64 across a large fused batch (B*T).
Design, driven by v5e traces of the full train step (layout copies were
14.5% of step time and explicit padding another 3%):

- **layout-free**: q/k/v arrive as ``[B, N, H*d]`` — the raw output of the
  fused qkv Dense split in three — and the output leaves in the same
  layout, ready for the output projection.  Head separation happens in the
  BlockSpec index map (grid ``(B, H)``, block ``(1, N_pad, d)``), so the
  kernel replaces the usual split-heads/merge-heads transposes with free
  index arithmetic;
- **pad-free**: the block length is the 128-rounded N; Pallas masks the
  ragged edge on write, and the kernel masks out-of-range *keys* with -inf
  before the softmax (out-of-range query rows compute garbage that is never
  written);
- whole sequence per grid step: one VMEM-resident tile, plain 2-D MXU
  matmuls, exact fp32 softmax fused in between (measured ~90x faster than a
  128-row streaming variant at N=197 — tiny tiles re-read K/V and starve
  the MXU).

Forward and backward are both Pallas kernels via ``jax.custom_vjp``;
backward recomputes probabilities from q/k (flash-style, no saved
probability tensor).

Numerics pin the XLA path in ``ops/attention.py:attention_core`` (itself
pinned to reference ``lib/models/vit.py:75-92``): logits and softmax in
float32, probabilities cast to the value dtype before the PV matmul.

Sequences longer than ``MAX_FUSED_LEN`` should use the XLA path; the
``mhsa`` dispatcher handles this.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this, [N, N] fp32 logits stop fitting comfortably in VMEM
MAX_FUSED_LEN = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(n: int) -> int:
    """Token-axis block padding. Only the LAST block dim must be a
    128-multiple (Mosaic); the token axis is second-minor, where the tile
    granularity is 16 rows (bf16 packing) — padding 196 -> 208 instead of
    256 cuts kernel FLOPs/VPU work ~19%."""
    return _round_up(n, 16)


def _interpret() -> bool:
    # CPU tests (8 virtual host devices) run the kernels interpreted.
    return jax.default_backend() != "tpu"


def _zero_tail_rows(x, n_valid: int):
    """Zero rows >= n_valid: the ragged block edge holds undefined values
    (NaN in interpret mode) which would otherwise poison 0*garbage terms in
    the matmuls."""
    if n_valid >= x.shape[0]:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < n_valid, x, jnp.zeros_like(x))


def _psum_div(p):
    """p / rowsum(p).  SPATIAL_MXU_PSUM=1 computes the denominator as a
    square fp32 ones-dot (broadcast rowsum in one MXU op) instead of the
    VPU cross-lane reduce — the minimal-variant retest of the round-3
    softmax restructure (which bundled roll-max + deferred normalize and
    measured 2.7x slower; this swaps ONLY the sum)."""
    from procedurevrl_tpu.utils.env import env_flag

    if env_flag("SPATIAL_MXU_PSUM", False):
        ones = jnp.ones((p.shape[1], p.shape[1]), jnp.float32)
        rs = jax.lax.dot_general(p, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return p / rs
    rs = jnp.sum(p, axis=-1, keepdims=True)
    if env_flag("SPATIAL_RECIP", False):
        # strength-reduce the [NP, NP] broadcast divide to one reciprocal
        # column + a multiply (exact reciprocal; the approx variant costs
        # ~1e-3 relative error on the probabilities — too coarse)
        return p * pl.reciprocal(rs, approx=False)
    return p / rs


# exp(_CLAMP_HI) ~ 5.5e34; a full 208-key row of clamped logits sums to
# ~1.2e37 < fp32 max (3.4e38), so the rowsum/divide stay finite even in
# the worst case.  fp32 exp only overflows beyond ~88.7.
_CLAMP_HI = 80.0


def _shift(s):
    """Numerical-stability shift before exp, SPATIAL_SHIFT=max|clamp|none.

    ``max`` (reference-faithful): subtract the per-row max — a cross-lane
    VPU reduce + broadcast subtract, two of the costlier passes in the
    chain (the round-2 LayerNorm lesson: lane reductions are slow).
    ``clamp`` (default): one elementwise ``min(s, 80)``.  Softmax is
    shift-invariant and exp(80) rows cannot overflow fp32 (see above), so
    for any row whose max logit is < 80 this is EXACT softmax — LN-bounded
    q/k at d=64 sit orders of magnitude below that — and a pathological
    logit spike degrades gracefully into a bounded, finite distribution
    instead of inf/NaN.  Measured −5 % on the kernel, e2e 87.85 -> 88.30
    clips/sec/chip (BASELINE round 5).
    ``none``: no shift at all (exact, but a >88 logit overflows to inf —
    measurement-only knob)."""
    mode = os.environ.get("SPATIAL_SHIFT", "clamp")
    if mode == "clamp":
        return jnp.minimum(s, _CLAMP_HI)
    if mode == "none":
        return s
    if mode == "max":
        return s - jnp.max(s, axis=-1, keepdims=True)
    raise ValueError(f"SPATIAL_SHIFT={mode!r}: expected max|clamp|none")


def _softmax_probs(q, k, scale: float, n_valid: int):
    """fp32 softmax(q k^T * scale) with out-of-range keys masked out."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [NP, NP] fp32
    npad = s.shape[-1]
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
    s = _shift(s)
    p = jnp.exp(s)
    return _psum_div(p)


def _softmax_probs_gap(q, k, scale: float, n: int, cls_row: int):
    """:func:`_softmax_probs` with a NON-contiguous valid key set — rows
    ``< n`` plus the single cls row at ``cls_row`` (the pipelined kernel's
    8-aligned tile layout interleaves zero-pad rows between the two)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [NP, NP] fp32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where((col < n) | (col == cls_row), s,
                  jnp.finfo(jnp.float32).min)
    s = _shift(s)
    p = jnp.exp(s)
    return _psum_div(p)


def _heads_per_block(d: int, num_heads: int) -> int:
    """Mosaic requires the last block dim to be a multiple of 128 (or the
    full array width): pack ceil(128/d) heads per grid step.
    PALLAS_HPB overrides (wider blocks = contiguous-row DMAs; pair with a
    smaller PALLAS_GB to stay inside scoped VMEM)."""
    import os

    if os.environ.get("PALLAS_HPB"):
        hpb = int(os.environ["PALLAS_HPB"])
        if (d * hpb) % 128 == 0 and num_heads % hpb == 0:
            return hpb
    hpb = 1
    while (d * hpb) % 128 != 0 and hpb < num_heads:
        hpb += 1
    if (d * hpb) % 128 != 0 or num_heads % hpb != 0:
        return 0  # shape unsupported by the fused kernel
    return hpb


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                d: int, hpb: int, gb: int):
    for g in range(gb):  # static unroll: gb batch rows x hpb heads per step
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            p = _softmax_probs(q_ref[g, :, sl], k_ref[g, :, sl], scale, n_valid)
            v = _zero_tail_rows(v_ref[g, :, sl], n_valid)
            o_ref[g, :, sl] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _head_spec(npad: int, width: int, gb: int):
    # grid (b, g); g selects a width-sized column group of [B, N, H*d],
    # b selects a gb-row batch group
    return pl.BlockSpec((gb, npad, width), lambda b, g: (b, 0, g),
                        memory_space=pltpu.VMEM)


def _batch_group(b: int) -> int:
    """Rows per grid step: amortize per-step DMA/launch overhead (a
    1-row grid at N=197 measured ~25x slower than the matmul bound)."""
    import os

    # empirical: gb=12 is the sweet spot for both directions (a forward
    # with gb=24 measured 56.6 vs 56.9 clips/sec — the DMA pipeline is
    # already saturated; the 7-buffer backward cannot exceed 12 anyway
    # under the scoped-VMEM budget)
    prefs = [12, 8, 6, 4, 2, 1]
    if os.environ.get("PALLAS_GB"):
        prefs = [int(os.environ["PALLAS_GB"])] + prefs
    for gb in prefs:
        if b % gb == 0:
            return gb
    return 1


def _flash_fwd(q, k, v, num_heads: int, scale: float):
    b, n, c = q.shape
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    assert hpb > 0, (
        f"unsupported geometry for fused attention: d={d}, H={num_heads}"
    )
    gb = _batch_group(b)
    npad = _pad_rows(n)
    spec = _head_spec(npad, d * hpb, gb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n, d=d, hpb=hpb,
                          gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * npad * npad * d,
            bytes_accessed=4 * b * n * c * q.dtype.itemsize,
            transcendentals=b * num_heads * npad * npad,
        ),
        interpret=_interpret(),
    )(q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, n_valid: int, d: int, hpb: int, gb: int):
    for gi in range(gb):  # static unroll: gb batch rows x hpb heads per step
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            q = _zero_tail_rows(q_ref[gi, :, sl], n_valid)
            k = _zero_tail_rows(k_ref[gi, :, sl], n_valid)
            v = _zero_tail_rows(v_ref[gi, :, sl], n_valid)
            p = _softmax_probs(q, k, scale, n_valid)  # [NP, NP] fp32

            # out-of-range query rows carry garbage cotangents: zero them
            # so they contribute nothing to dk/dv. Matmul operands stay in
            # the input dtype (bf16 in training — fp32-operand MXU matmuls
            # run at a fraction of the bf16 rate); accumulation is fp32.
            dt = q.dtype
            gf = _zero_tail_rows(g_ref[gi, :, sl], n_valid)
            # dv = p^T @ g
            dv_ref[gi, :, sl] = jax.lax.dot_general(
                p.astype(dt), gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            # dp = g @ v^T
            dp = jax.lax.dot_general(
                gf, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = _ds_chain(p, dp)
            ds_c = ds.astype(dt)
            dq_ref[gi, :, sl] = (jnp.dot(ds_c, k,
                                         preferred_element_type=jnp.float32)
                                 * scale).astype(dq_ref.dtype)
            dk_ref[gi, :, sl] = (jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(dk_ref.dtype)


def _flash_bwd(q, k, v, g, num_heads: int, scale: float):
    b, n, c = q.shape
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    gb = _batch_group(b)
    npad = _pad_rows(n)
    spec = _head_spec(npad, d * hpb, gb)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n, d=d, hpb=hpb,
                          gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * npad * npad * d,
            bytes_accessed=8 * b * n * c * q.dtype.itemsize,
            transcendentals=b * num_heads * npad * npad,
        ),
        interpret=_interpret(),
    )(q, k, v, g)
    return dq, dk, dv


# partition-aware variants: under a multi-device mesh the kernels shard
# over batch (data axis) and whole head groups (model axis) instead of
# forcing an all-gather around an opaque custom call (ops/pallas_partition)
from procedurevrl_tpu.ops.pallas_partition import _wrap, partition_aware

_flash_fwd_sharded = partition_aware(_flash_fwd, _wrap(
    _flash_fwd, n_tensors=3, static_argnums=(3, 4),
    rule="b n c, b n c, b n c -> b n c", need_replication=("n",),
))
_flash_bwd_sharded = partition_aware(_flash_bwd, _wrap(
    _flash_bwd, n_tensors=4, static_argnums=(4, 5),
    rule="b n c, b n c, b n c, b n c -> b n c, b n c, b n c",
    need_replication=("n",),
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_headfused(q, k, v, num_heads, scale):
    """Exact softmax attention on head-interleaved tensors.

    q, k, v: [B, N, H*d] (d-sized column block per head). Returns the same
    layout.
    """
    return _flash_fwd_sharded(q, k, v, num_heads, scale)


def _fa_fwd(q, k, v, num_heads, scale):
    return _flash_fwd_sharded(q, k, v, num_heads, scale), (q, k, v)


def _fa_bwd(num_heads, scale, res, g):
    q, k, v = res
    return _flash_bwd_sharded(q, k, v, g, num_heads, scale)


flash_attention_headfused.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# CLS-aware variant: frame tokens and the CLS token travel as separate
# streams (see models/timesformer.py CLS-split block). Per sequence the key
# set is [cls] + frames and there is one extra cls query; keeping the CLS
# out of the [B*T, N, C] stream removes the per-block concatenate/slice
# traffic the fused layout otherwise pays twice per block (fwd + bwd).
# ---------------------------------------------------------------------------


def _set_row(x, row_vals, idx: int):
    """Write the [1, d] ``row_vals`` into (static) row ``idx`` of ``x``."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows == idx, jnp.broadcast_to(row_vals, x.shape), x)


def _fwd_cls_kernel(q_ref, k_ref, v_ref, qc_ref, kc_ref, vc_ref, o_ref, oc_ref,
                    *, scale: float, n_valid: int, d: int, hpb: int, gb: int):
    # The cls row is spliced into the tile's padding row ``n_valid`` so the
    # whole computation stays on the plain [NP, NP] MXU path (rank-1 side
    # computations measured ~2x slower); softmax is permutation-invariant
    # over keys, so cls-at-the-end equals the reference's cls-in-front.
    for g in range(gb):
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            q = _set_row(q_ref[g, :, sl], qc_ref[g, :, sl], n_valid)
            k = _set_row(k_ref[g, :, sl], kc_ref[g, :, sl], n_valid)
            v = _set_row(v_ref[g, :, sl], vc_ref[g, :, sl], n_valid)
            p = _softmax_probs(q, k, scale, n_valid + 1)
            v = _zero_tail_rows(v, n_valid + 1)
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[g, :, sl] = o.astype(o_ref.dtype)
            oc_ref[g, :, sl] = o[n_valid:n_valid + 1].astype(oc_ref.dtype)


def _cls_spec(width: int, gb: int):
    return pl.BlockSpec((gb, 1, width), lambda b, g: (b, 0, g),
                        memory_space=pltpu.VMEM)


def _flash_cls_fwd(q, k, v, qc, kc, vc, num_heads: int, scale: float):
    b, n, c = q.shape
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    assert hpb > 0, f"unsupported geometry: d={d}, H={num_heads}"
    gb = _batch_group(b)
    npad = _pad_rows(n + 1)  # one padding row hosts the cls splice
    spec = _head_spec(npad, d * hpb, gb)
    cspec = _cls_spec(d * hpb, gb)
    return pl.pallas_call(
        functools.partial(_fwd_cls_kernel, scale=scale, n_valid=n, d=d,
                          hpb=hpb, gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[spec, spec, spec, cspec, cspec, cspec],
        out_specs=[spec, cspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), q.dtype),
                   jax.ShapeDtypeStruct((b, 1, c), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=4 * b * (n + 1) * c * q.dtype.itemsize,
            transcendentals=b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(q, k, v, qc, kc, vc)


def _bwd_cls_kernel(q_ref, k_ref, v_ref, qc_ref, kc_ref, vc_ref, g_ref, gc_ref,
                    dq_ref, dk_ref, dv_ref, dqc_ref, dkc_ref, dvc_ref,
                    *, scale: float, n_valid: int, d: int, hpb: int, gb: int):
    # Same cls-splice-into-padding-row trick as the forward: the combined
    # (frames + cls) backward is exactly the plain kernel's math at
    # n_valid + 1; the cls rows of dq/dk/dv are sliced back out at the end.
    nv1 = n_valid + 1
    for gi in range(gb):
        for i in range(hpb):
            sl = slice(i * d, (i + 1) * d)
            q = _zero_tail_rows(
                _set_row(q_ref[gi, :, sl], qc_ref[gi, :, sl], n_valid), nv1)
            k = _zero_tail_rows(
                _set_row(k_ref[gi, :, sl], kc_ref[gi, :, sl], n_valid), nv1)
            v = _zero_tail_rows(
                _set_row(v_ref[gi, :, sl], vc_ref[gi, :, sl], n_valid), nv1)
            p = _softmax_probs(q, k, scale, nv1)  # [NP, NP] fp32

            # matmul operands in the input dtype, fp32 accumulation
            # (see _bwd_kernel)
            dt = q.dtype
            gf = _zero_tail_rows(
                _set_row(g_ref[gi, :, sl], gc_ref[gi, :, sl], n_valid), nv1,
            )
            dv = jax.lax.dot_general(
                p.astype(dt), gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_ref[gi, :, sl] = dv.astype(dv_ref.dtype)
            dvc_ref[gi, :, sl] = dv[n_valid:nv1].astype(dvc_ref.dtype)

            dp = jax.lax.dot_general(
                gf, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = _ds_chain(p, dp)
            ds_c = ds.astype(dt)
            dq = jnp.dot(ds_c, k,
                         preferred_element_type=jnp.float32) * scale
            dq_ref[gi, :, sl] = dq.astype(dq_ref.dtype)
            dqc_ref[gi, :, sl] = dq[n_valid:nv1].astype(dqc_ref.dtype)
            dk = jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk_ref[gi, :, sl] = dk.astype(dk_ref.dtype)
            dkc_ref[gi, :, sl] = dk[n_valid:nv1].astype(dkc_ref.dtype)


def _flash_cls_bwd(q, k, v, qc, kc, vc, g, gc, num_heads: int, scale: float):
    b, n, c = q.shape
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    gb = _batch_group(b)
    npad = _pad_rows(n + 1)  # one padding row hosts the cls splice
    spec = _head_spec(npad, d * hpb, gb)
    cspec = _cls_spec(d * hpb, gb)
    return pl.pallas_call(
        functools.partial(_bwd_cls_kernel, scale=scale, n_valid=n, d=d,
                          hpb=hpb, gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[spec, spec, spec, cspec, cspec, cspec, spec, cspec],
        out_specs=[spec, spec, spec, cspec, cspec, cspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), q.dtype)] * 3
        + [jax.ShapeDtypeStruct((b, 1, c), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=8 * b * (n + 1) * c * q.dtype.itemsize,
            transcendentals=2 * b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(q, k, v, qc, kc, vc, g, gc)


_flash_cls_fwd_sharded = partition_aware(_flash_cls_fwd, _wrap(
    _flash_cls_fwd, n_tensors=6, static_argnums=(6, 7),
    rule=("b n c, b n c, b n c, b u c, b u c, b u c -> b n c, b u c"),
    need_replication=("n", "u"),
))
_flash_cls_bwd_sharded = partition_aware(_flash_cls_bwd, _wrap(
    _flash_cls_bwd, n_tensors=8, static_argnums=(8, 9),
    rule=("b n c, b n c, b n c, b u c, b u c, b u c, b n c, b u c -> "
          "b n c, b n c, b n c, b u c, b u c, b u c"),
    need_replication=("n", "u"),
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def flash_attention_cls(q, k, v, qc, kc, vc, num_heads, scale):
    """Exact softmax attention with a split CLS stream.

    Per sequence b: frame queries ``q[b]`` and the cls query ``qc[b]`` both
    attend over keys ``[kc[b]; k[b]]`` / values ``[vc[b]; v[b]]``.

    q, k, v: [B, N, H*d]; qc, kc, vc: [B, 1, H*d].
    Returns (frame_out [B, N, H*d], cls_out [B, 1, H*d]).
    """
    return _flash_cls_fwd_sharded(q, k, v, qc, kc, vc, num_heads, scale)


def _fac_fwd(q, k, v, qc, kc, vc, num_heads, scale):
    return _flash_cls_fwd_sharded(q, k, v, qc, kc, vc, num_heads, scale), (
        q, k, v, qc, kc, vc,
    )


def _fac_bwd(num_heads, scale, res, gs):
    q, k, v, qc, kc, vc = res
    g, gc = gs
    return _flash_cls_bwd_sharded(q, k, v, qc, kc, vc, g, gc, num_heads, scale)


flash_attention_cls.defvjp(_fac_fwd, _fac_bwd)


# ---------------------------------------------------------------------------
# Fused-qkv CLS variant: the kernel consumes the qkv projection output as
# ONE [B, N, 3C] array whose columns are permuted into per-head-group
# [q(w) | k(w) | v(w)] windows (w = hpb*d lanes), and the backward emits one
# [B, N, 3C] dqkv in the same layout.  Motivation (v5e): the opaque
# pallas_call cannot fuse with its producers, so the jnp.split(qkv, 3)
# feeding the separate-q/k/v kernel materializes three slice copies per
# block (and the VJP of the split concatenates three gradient arrays back),
# pure HBM relayout traffic.  The permutation itself is free: it is applied
# to the projection WEIGHT columns ([C, 3C], a few MB, grad is the inverse
# permutation), not to any activation.  Math and numerics are identical to
# flash_attention_cls — same per-head tiles, same splice-cls-into-padding-row
# trick, just different lane bookkeeping.  See ops/attention.py:qkv_window_perm
# for the column permutation.
# ---------------------------------------------------------------------------


def _fwd_cls_qkv_kernel(qkv_ref, qkvc_ref, o_ref, oc_ref, *, scale: float,
                        n_valid: int, d: int, hpb: int, gb: int):
    w = d * hpb
    for g in range(gb):
        for i in range(hpb):
            sq = slice(i * d, (i + 1) * d)
            sk = slice(w + i * d, w + (i + 1) * d)
            sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
            q = _set_row(qkv_ref[g, :, sq], qkvc_ref[g, :, sq], n_valid)
            k = _set_row(qkv_ref[g, :, sk], qkvc_ref[g, :, sk], n_valid)
            v = _set_row(qkv_ref[g, :, sv], qkvc_ref[g, :, sv], n_valid)
            p = _softmax_probs(q, k, scale, n_valid + 1)
            v = _zero_tail_rows(v, n_valid + 1)
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[g, :, sq] = o.astype(o_ref.dtype)
            oc_ref[g, :, sq] = o[n_valid:n_valid + 1].astype(oc_ref.dtype)


def _flash_cls_qkv_fwd(qkv, qkv_c, num_heads: int, scale: float):
    if _spatial_pipe():
        return _flash_cls_qkv_fwd_pipe(qkv, qkv_c, num_heads, scale)
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    assert hpb > 0, f"unsupported geometry: d={d}, H={num_heads}"
    gb = _batch_group(b)
    npad = _pad_rows(n + 1)  # one padding row hosts the cls splice
    w = d * hpb
    qspec = _head_spec(npad, 3 * w, gb)
    qcspec = _cls_spec(3 * w, gb)
    spec = _head_spec(npad, w, gb)
    cspec = _cls_spec(w, gb)
    return pl.pallas_call(
        functools.partial(_fwd_cls_qkv_kernel, scale=scale, n_valid=n, d=d,
                          hpb=hpb, gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[qspec, qcspec],
        out_specs=[spec, cspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, 1, c), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=4 * b * (n + 1) * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(qkv, qkv_c)


def _bwd_cls_qkv_kernel(qkv_ref, qkvc_ref, g_ref, gc_ref, dqkv_ref, dqkvc_ref,
                        *, scale: float, n_valid: int, d: int, hpb: int,
                        gb: int):
    # combined (frames + cls) backward at n_valid + 1 via the splice trick;
    # dq/dk/dv land in the per-head-group windows of ONE dqkv output
    w = d * hpb
    nv1 = n_valid + 1
    for gi in range(gb):
        for i in range(hpb):
            sq = slice(i * d, (i + 1) * d)
            sk = slice(w + i * d, w + (i + 1) * d)
            sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
            q = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sq], qkvc_ref[gi, :, sq], n_valid), nv1)
            k = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sk], qkvc_ref[gi, :, sk], n_valid), nv1)
            v = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sv], qkvc_ref[gi, :, sv], n_valid), nv1)
            p = _softmax_probs(q, k, scale, nv1)  # [NP, NP] fp32

            dt = q.dtype
            gf = _zero_tail_rows(
                _set_row(g_ref[gi, :, sq], gc_ref[gi, :, sq], n_valid), nv1,
            )
            dv = jax.lax.dot_general(
                p.astype(dt), gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[gi, :, sv] = dv.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sv] = dv[n_valid:nv1].astype(dqkvc_ref.dtype)

            dp = jax.lax.dot_general(
                gf, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = _ds_chain(p, dp)
            ds_c = ds.astype(dt)
            dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[gi, :, sq] = dq.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sq] = dq[n_valid:nv1].astype(dqkvc_ref.dtype)
            dk = jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[gi, :, sk] = dk.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sk] = dk[n_valid:nv1].astype(dqkvc_ref.dtype)


def _flash_cls_qkv_bwd(qkv, qkv_c, g, gc, num_heads: int, scale: float):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    gb = _batch_group(b)
    npad = _pad_rows(n + 1)
    w = d * hpb
    qspec = _head_spec(npad, 3 * w, gb)
    qcspec = _cls_spec(3 * w, gb)
    spec = _head_spec(npad, w, gb)
    cspec = _cls_spec(w, gb)
    return pl.pallas_call(
        functools.partial(_bwd_cls_qkv_kernel, scale=scale, n_valid=n, d=d,
                          hpb=hpb, gb=gb),
        grid=(b // gb, num_heads // hpb),
        in_specs=[qspec, qcspec, spec, cspec],
        out_specs=[qspec, qcspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
                   jax.ShapeDtypeStruct((b, 1, c3), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=8 * b * (n + 1) * c * qkv.dtype.itemsize,
            transcendentals=2 * b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(qkv, qkv_c, g, gc)


# --- manually pipelined forward (opt-in SPATIAL_PIPE=1) ------------------
# BASELINE round 3: the auto-pipelined fused-qkv forward measures
# ~1.59 ms/block in-model vs a ~0.7 ms DMA+softmax floor, and the
# PALLAS_GB/HPB knob sweeps are exhausted — the residual is per-grid-step
# DMA latency at the (gb, head-group) granularity Mosaic double-buffers.
# This variant owns its DMA schedule: operands stay in HBM (pl.ANY) and
# the kernel streams [gb, N8, 3w] batch-chunks per head-group window
# through an NBUF-deep rotating buffer (SPATIAL_PIPE_NBUF, default 3),
# overlapping input DMA, compute, and output DMA with NBUF-1 chunks of
# lookahead instead of Mosaic's fixed 1.  Bonus over the grid kernel: the
# cls row is DMA'd STRAIGHT into the tile's padding rows (two sources, one
# buffer), so the per-head _set_row splices disappear from the VPU path.
#
# Mosaic constraint (real TPU only; interpret mode does not enforce it):
# every manual-DMA slice along a tiled memref's sublane dim must be
# 8-row aligned (offset and size), so the wrapper pads the token axis to
# N8 = roundup(N, 8) and the cls operand to the remaining npad - N8 rows.
# The valid key set inside a tile is then NON-contiguous — rows < N plus
# the cls row at N8, with zero-padding rows in between — which
# _softmax_probs_gap masks out.


def _spatial_pipe() -> bool:
    import os

    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("SPATIAL_PIPE", False)


def _pipe_nbuf() -> int:
    import os

    return int(os.environ.get("SPATIAL_PIPE_NBUF", "3"))


def _pipe_kernel(qkv_hbm, qc_hbm, o_hbm, oc_hbm, *, scale: float, n: int,
                 n8: int, npad: int, d: int, hpb: int, gb: int, nbuf: int,
                 G: int, nch: int):
    w = d * hpb
    steps = G * nch
    qc_rows = npad - n8  # zero-padded cls rows fill the tile exactly

    def body(buf, obuf, clsout, sem_in, sem_cls, sem_out, sem_co):
        def in_dma(l, s):
            g, cb = l // nch, l % nch
            return pltpu.make_async_copy(
                qkv_hbm.at[pl.ds(cb * gb, gb), :, pl.ds(g * 3 * w, 3 * w)],
                buf.at[s, :, pl.ds(0, n8), :], sem_in.at[s])

        def in_cls_dma(l, s):
            # the cls row lands at the 8-aligned padding row ``n8`` — the
            # splice the grid kernel does in-register per head pair
            g, cb = l // nch, l % nch
            return pltpu.make_async_copy(
                qc_hbm.at[pl.ds(cb * gb, gb), :, pl.ds(g * 3 * w, 3 * w)],
                buf.at[s, :, pl.ds(n8, qc_rows), :], sem_cls.at[s])

        def out_dma(l, s):
            g, cb = l // nch, l % nch
            return pltpu.make_async_copy(
                obuf.at[s, :, pl.ds(0, n8), :],
                o_hbm.at[pl.ds(cb * gb, gb), :, pl.ds(g * w, w)],
                sem_out.at[s])

        def clsout_dma(g):
            return pltpu.make_async_copy(
                clsout.at[g % 2],
                oc_hbm.at[:, :, pl.ds(g * w, w)], sem_co.at[g % 2])

        for i in range(min(nbuf, steps)):
            in_dma(i, i).start()
            in_cls_dma(i, i).start()

        def loop(l, _):
            g, cb = l // nch, l % nch
            s = l % nbuf
            in_dma(l, s).wait()
            in_cls_dma(l, s).wait()

            @pl.when(l >= nbuf)
            def _():
                out_dma(l - nbuf, s).wait()

            if G > 2:
                @pl.when(jnp.logical_and(cb == 0, g >= 2))
                def _():
                    clsout_dma(g - 2).wait()

            for bi in range(gb):
                for i in range(hpb):
                    sq = slice(i * d, (i + 1) * d)
                    sk = slice(w + i * d, w + (i + 1) * d)
                    sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
                    q = buf[s, bi, :, sq]
                    k = buf[s, bi, :, sk]
                    # every buf row is DMA-initialized (zeros outside the
                    # n patches and the cls row), so v needs no masking
                    v = buf[s, bi, :, sv]
                    p = _softmax_probs_gap(q, k, scale, n, n8)
                    o = jnp.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32)
                    obuf[s, bi, :, sq] = o.astype(obuf.dtype)
                    clsout[g % 2, cb * gb + bi, :, sq] = (
                        o[n8:npad, :].astype(clsout.dtype))

            out_dma(l, s).start()

            @pl.when(cb == nch - 1)
            def _():
                clsout_dma(g).start()

            @pl.when(l + nbuf < steps)
            def _():
                in_dma(l + nbuf, s).start()
                in_cls_dma(l + nbuf, s).start()
            return None

        jax.lax.fori_loop(0, steps, loop, None)
        for t in range(max(0, steps - nbuf), steps):
            out_dma(t, t % nbuf).wait()
        for g in range(max(0, G - (2 if G > 2 else G)), G):
            clsout_dma(g).wait()

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((nbuf, gb, npad, 3 * w), qkv_hbm.dtype),
        obuf=pltpu.VMEM((nbuf, gb, npad, w), o_hbm.dtype),
        clsout=pltpu.VMEM((2, o_hbm.shape[0], npad - n8, w), oc_hbm.dtype),
        sem_in=pltpu.SemaphoreType.DMA((nbuf,)),
        sem_cls=pltpu.SemaphoreType.DMA((nbuf,)),
        sem_out=pltpu.SemaphoreType.DMA((nbuf,)),
        sem_co=pltpu.SemaphoreType.DMA((2,)),
    )


def _flash_cls_qkv_fwd_pipe(qkv, qkv_c, num_heads: int, scale: float):
    """Manually pipelined :func:`_flash_cls_qkv_fwd` (same layout contract:
    window-permuted [B, N, 3C] qkv in, standard-order [B, N, C] out).

    The token axis is padded to ``n8 = roundup(n, 8)`` and the cls operand
    to ``npad - n8`` rows so every manual DMA slice is 8-row aligned
    (Mosaic rejects unaligned HBM memref slices on real TPU); the pad
    rows are zeros and :func:`_softmax_probs_gap` masks them out of the
    key set."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    assert hpb > 0, f"unsupported geometry: d={d}, H={num_heads}"
    gb = _batch_group(b)
    n8 = _round_up(n, 8)
    npad = _pad_rows(n8 + 8)  # >= 8 zero/cls rows above the patch rows
    nbuf = max(2, min(_pipe_nbuf(), b // gb))
    if n8 != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n8 - n), (0, 0)))
    qkv_c = jnp.pad(qkv_c, ((0, 0), (0, npad - n8 - qkv_c.shape[1]), (0, 0)))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    o, oc = pl.pallas_call(
        functools.partial(
            _pipe_kernel, scale=scale, n=n, n8=n8, npad=npad, d=d, hpb=hpb,
            gb=gb, nbuf=nbuf, G=num_heads // hpb, nch=b // gb),
        in_specs=[any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n8, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, npad - n8, c), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=4 * b * (n + 1) * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(qkv, qkv_c)
    return o[:, :n, :], oc[:, :1, :]


# --- saved-probabilities variant (default ON; SPATIAL_SAVE_PROBS=0
# reverts; single-device only — multi-device falls back to recompute) ---
# The recompute backward re-derives the fp32 softmax probabilities from
# qkv — the VPU exp/max/sum chain BASELINE.md measured at ~0.8-1
# ms/block.  This variant saves them from the forward as [B, H, NP, KPAD]
# input-dtype (KPAD = 256-padded key axis, ~153 MB/block at bench shapes)
# and the backward skips the score matmul + softmax chain.  BASELINE
# round 3 rejected this on traffic arithmetic for the SPLIT-operand
# kernel; measured on the fused-qkv layout it is a real win
# (86.32 +- 0.05 vs 85.90 +- 0.07 clips/sec/chip e2e, round 4).


def _sp_batch_group(b: int) -> int:
    """Smaller row group for the saved-probs variants: the probs block
    ((gb, hpb, NP, KPAD), double-buffered) joins the qkv/grad blocks in
    VMEM; gb=12 would exceed the comfortable budget in the backward.
    PALLAS_SP_GB overrides (sweep knob — wide-hpb blocks need a smaller
    row group to stay inside scoped VMEM)."""
    import os

    prefs = (8, 6, 4, 2, 1)
    if os.environ.get("PALLAS_SP_GB"):
        prefs = (int(os.environ["PALLAS_SP_GB"]),) + prefs
    for gb in prefs:
        if b % gb == 0:
            return gb
    return 1


def _save_spatial_probs() -> bool:
    import os

    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("SPATIAL_SAVE_PROBS", True)


def _mxu_dsum() -> bool:
    # Default ON since round 4: compute the ds-chain rowsum as one fp32
    # MXU dot against a ones matrix (produces the broadcast rowsum
    # directly) instead of a VPU cross-lane reduce — the round-2
    # LayerNorm trick applied to the backward softmax jacobian
    # contraction.  Kernel-level fwd+bwd 4.52 -> 4.05 ms; e2e 86.53 ->
    # 87.43 +- 0.15 (BASELINE.md).  SPATIAL_MXU_DSUM=0 reverts.
    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("SPATIAL_MXU_DSUM", True)


def _ds_chain(p, dp):
    """softmax VJP: ds = p * (dp - rowsum(dp * p)) with the rowsum either
    a VPU cross-lane reduce (default) or a broadcast MXU ones-dot."""
    prod = dp * p
    if _mxu_dsum():
        ones = jnp.ones((prod.shape[1], prod.shape[1]), jnp.float32)
        rs = jax.lax.dot_general(prod, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return p * (dp - rs)
    return p * (dp - jnp.sum(prod, axis=-1, keepdims=True))


def _spatial_delta() -> bool:
    # FlashAttention-2 backward identity: the softmax-jacobian rowsum
    # rowsum_j(dp_ij * p_ij) equals delta_i = sum_d g_id * o_id because
    # o = p @ v and dp = g @ v^T.  Computing delta from the (saved) forward
    # output replaces the [NP, NP] fp32 elementwise product + [NP,NP]x[NP,NP]
    # ones-dot with one [NP, d=64] elementwise + narrow lane reduce.
    # MEASURED NEGATIVE at the spatial geometry (within-process A/B/A/B,
    # v5e: fwd+bwd 4.08/4.20 -> 4.36/4.50 ms): this backward is
    # DMA-bound, and the two extra o/oc input blocks (+~11% input bytes
    # per grid step) cost more than the removed NP^3 ones-dot — the MXU
    # rowsum rides compute the DMA pipeline already hides.  Opt-in
    # SPATIAL_DELTA=1; the ones-dot _ds_chain stays the default.
    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("SPATIAL_DELTA", False)


def _fwd_cls_qkv_kernel_sp(qkv_ref, qkvc_ref, o_ref, oc_ref, p_ref, *,
                           scale: float, n_valid: int, d: int, hpb: int,
                           gb: int, kpad: int):
    w = d * hpb
    for g in range(gb):
        for i in range(hpb):
            sq = slice(i * d, (i + 1) * d)
            sk = slice(w + i * d, w + (i + 1) * d)
            sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
            q = _set_row(qkv_ref[g, :, sq], qkvc_ref[g, :, sq], n_valid)
            k = _set_row(qkv_ref[g, :, sk], qkvc_ref[g, :, sk], n_valid)
            v = _set_row(qkv_ref[g, :, sv], qkvc_ref[g, :, sv], n_valid)
            p = _softmax_probs(q, k, scale, n_valid + 1)
            v = _zero_tail_rows(v, n_valid + 1)
            pc = p.astype(v.dtype)
            o = jnp.dot(pc, v, preferred_element_type=jnp.float32)
            o_ref[g, :, sq] = o.astype(o_ref.dtype)
            oc_ref[g, :, sq] = o[n_valid:n_valid + 1].astype(oc_ref.dtype)
            npad = pc.shape[1]
            p_ref[g, i] = jnp.concatenate(
                [pc, jnp.zeros((pc.shape[0], kpad - npad), pc.dtype)],
                axis=1).astype(p_ref.dtype)


def _bwd_cls_qkv_kernel_sp(qkv_ref, qkvc_ref, g_ref, gc_ref, p_ref,
                           dqkv_ref, dqkvc_ref, *, scale: float,
                           n_valid: int, d: int, hpb: int, gb: int,
                           npad: int):
    """Backward from SAVED probabilities: identical to
    :func:`_bwd_cls_qkv_kernel` minus the score matmul + fp32 softmax
    chain.  Saved garbage rows (>= n_valid + 1: DMA'd from uninitialized
    q rows in the forward, possibly non-finite) are zeroed like q/g."""
    w = d * hpb
    nv1 = n_valid + 1
    for gi in range(gb):
        for i in range(hpb):
            sq = slice(i * d, (i + 1) * d)
            sk = slice(w + i * d, w + (i + 1) * d)
            sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
            q = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sq], qkvc_ref[gi, :, sq], n_valid), nv1)
            k = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sk], qkvc_ref[gi, :, sk], n_valid), nv1)
            v = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sv], qkvc_ref[gi, :, sv], n_valid), nv1)
            p = _zero_tail_rows(
                p_ref[gi, i][:, :npad].astype(jnp.float32), nv1)

            dt = q.dtype
            gf = _zero_tail_rows(
                _set_row(g_ref[gi, :, sq], gc_ref[gi, :, sq], n_valid), nv1,
            )
            dv = jax.lax.dot_general(
                p.astype(dt), gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[gi, :, sv] = dv.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sv] = dv[n_valid:nv1].astype(dqkvc_ref.dtype)

            dp = jax.lax.dot_general(
                gf, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = _ds_chain(p, dp)
            ds_c = ds.astype(dt)
            dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[gi, :, sq] = dq.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sq] = dq[n_valid:nv1].astype(dqkvc_ref.dtype)
            dk = jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[gi, :, sk] = dk.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sk] = dk[n_valid:nv1].astype(dqkvc_ref.dtype)


def _flash_cls_qkv_fwd_sp(qkv, qkv_c, num_heads: int, scale: float):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    assert hpb > 0, f"unsupported geometry: d={d}, H={num_heads}"
    gb = _sp_batch_group(b)
    npad = _pad_rows(n + 1)
    kpad = _round_up(npad, 128)
    w = d * hpb
    qspec = _head_spec(npad, 3 * w, gb)
    qcspec = _cls_spec(3 * w, gb)
    spec = _head_spec(npad, w, gb)
    cspec = _cls_spec(w, gb)
    ps = pl.BlockSpec((gb, hpb, npad, kpad), lambda bi, g: (bi, g, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_cls_qkv_kernel_sp, scale=scale, n_valid=n,
                          d=d, hpb=hpb, gb=gb, kpad=kpad),
        grid=(b // gb, num_heads // hpb),
        in_specs=[qspec, qcspec],
        out_specs=[spec, cspec, ps],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, 1, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, num_heads, npad, kpad),
                                        qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=(4 * b * (n + 1) * c
                            + b * num_heads * npad * kpad)
            * qkv.dtype.itemsize,
            transcendentals=b * num_heads * (npad + 1) * (npad + 1),
        ),
        interpret=_interpret(),
    )(qkv, qkv_c)


def _flash_cls_qkv_bwd_sp(qkv, qkv_c, probs, g, gc, num_heads: int,
                          scale: float):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    gb = _sp_batch_group(b)
    npad = _pad_rows(n + 1)
    kpad = _round_up(npad, 128)
    w = d * hpb
    qspec = _head_spec(npad, 3 * w, gb)
    qcspec = _cls_spec(3 * w, gb)
    spec = _head_spec(npad, w, gb)
    cspec = _cls_spec(w, gb)
    ps = pl.BlockSpec((gb, hpb, npad, kpad), lambda bi, g2: (bi, g2, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_cls_qkv_kernel_sp, scale=scale, n_valid=n,
                          d=d, hpb=hpb, gb=gb, npad=npad),
        grid=(b // gb, num_heads // hpb),
        in_specs=[qspec, qcspec, spec, cspec, ps],
        out_specs=[qspec, qcspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
                   jax.ShapeDtypeStruct((b, 1, c3), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=(8 * b * (n + 1) * c
                            + b * num_heads * npad * kpad)
            * qkv.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(qkv, qkv_c, g, gc, probs)


def _bwd_cls_qkv_kernel_sp_delta(qkv_ref, qkvc_ref, g_ref, gc_ref, p_ref,
                                 o_ref, oc_ref, dqkv_ref, dqkvc_ref, *,
                                 scale: float, n_valid: int, d: int,
                                 hpb: int, gb: int, npad: int):
    """Saved-probs backward with the FlashAttention-2 delta identity
    (:func:`_spatial_delta`): ds = p * (dp - delta) where
    delta_i = sum_d g_id * o_id — no [NP, NP] jacobian-rowsum product or
    ones-dot.  o arrives as two extra residuals (frame out + cls out,
    re-spliced like q/g)."""
    w = d * hpb
    nv1 = n_valid + 1
    for gi in range(gb):
        for i in range(hpb):
            sq = slice(i * d, (i + 1) * d)
            sk = slice(w + i * d, w + (i + 1) * d)
            sv = slice(2 * w + i * d, 2 * w + (i + 1) * d)
            q = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sq], qkvc_ref[gi, :, sq], n_valid), nv1)
            k = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sk], qkvc_ref[gi, :, sk], n_valid), nv1)
            v = _zero_tail_rows(
                _set_row(qkv_ref[gi, :, sv], qkvc_ref[gi, :, sv], n_valid), nv1)
            p = _zero_tail_rows(
                p_ref[gi, i][:, :npad].astype(jnp.float32), nv1)

            dt = q.dtype
            gf = _zero_tail_rows(
                _set_row(g_ref[gi, :, sq], gc_ref[gi, :, sq], n_valid), nv1,
            )
            of = _zero_tail_rows(
                _set_row(o_ref[gi, :, sq], oc_ref[gi, :, sq], n_valid), nv1,
            )
            dv = jax.lax.dot_general(
                p.astype(dt), gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[gi, :, sv] = dv.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sv] = dv[n_valid:nv1].astype(dqkvc_ref.dtype)

            dp = jax.lax.dot_general(
                gf, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                gf.astype(jnp.float32) * of.astype(jnp.float32),
                axis=-1, keepdims=True)
            ds = p * (dp - delta)
            ds_c = ds.astype(dt)
            dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[gi, :, sq] = dq.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sq] = dq[n_valid:nv1].astype(dqkvc_ref.dtype)
            dk = jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[gi, :, sk] = dk.astype(dqkv_ref.dtype)
            dqkvc_ref[gi, :, sk] = dk[n_valid:nv1].astype(dqkvc_ref.dtype)


def _flash_cls_qkv_bwd_sp_delta(qkv, qkv_c, probs, o, oc, g, gc,
                                num_heads: int, scale: float):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = _heads_per_block(d, num_heads)
    gb = _sp_batch_group(b)
    npad = _pad_rows(n + 1)
    kpad = _round_up(npad, 128)
    w = d * hpb
    qspec = _head_spec(npad, 3 * w, gb)
    qcspec = _cls_spec(3 * w, gb)
    spec = _head_spec(npad, w, gb)
    cspec = _cls_spec(w, gb)
    ps = pl.BlockSpec((gb, hpb, npad, kpad), lambda bi, g2: (bi, g2, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_cls_qkv_kernel_sp_delta, scale=scale,
                          n_valid=n, d=d, hpb=hpb, gb=gb, npad=npad),
        grid=(b // gb, num_heads // hpb),
        in_specs=[qspec, qcspec, spec, cspec, ps, spec, cspec],
        out_specs=[qspec, qcspec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
                   jax.ShapeDtypeStruct((b, 1, c3), qkv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * (npad + 1) * (npad + 1) * d,
            bytes_accessed=(10 * b * (n + 1) * c
                            + b * num_heads * npad * kpad)
            * qkv.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(qkv, qkv_c, g, gc, probs, o, oc)


# lane factors are replicated under a mesh (the temporal-kernel precedent:
# distinct in/out channel factors); TP meshes keep the head-sharded
# separate-q/k/v kernel instead — ops/attention.py gates the fused-qkv path
# off when the model axis is in use
_flash_cls_qkv_fwd_sharded = partition_aware(_flash_cls_qkv_fwd, _wrap(
    _flash_cls_qkv_fwd, n_tensors=2, static_argnums=(2, 3),
    rule="b n x, b u x -> b n c, b u c",
    need_replication=("n", "x", "u", "c"), shard_c=False,
))
_flash_cls_qkv_bwd_sharded = partition_aware(_flash_cls_qkv_bwd, _wrap(
    _flash_cls_qkv_bwd, n_tensors=4, static_argnums=(4, 5),
    rule="b n x, b u x, b n c, b u c -> b n x, b u x",
    need_replication=("n", "x", "u", "c"), shard_c=False,
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flash_attention_cls_qkv(qkv, qkv_c, num_heads, scale):
    """CLS-split attention on a window-permuted fused qkv array.

    qkv: [B, N, 3C] with columns ordered [q|k|v] per head group of
    ``hpb = _heads_per_block(d, H)`` heads (``ops/attention.qkv_window_perm``
    layout); qkv_c: [B, 1, 3C].  Returns (frame_out [B, N, C],
    cls_out [B, 1, C]) in standard head-interleaved column order.
    """
    return _flash_cls_qkv_fwd_sharded(qkv, qkv_c, num_heads, scale)


_warned_pipe_vs_saveprobs = False


def _facq_fwd(qkv, qkv_c, num_heads, scale):
    global _warned_pipe_vs_saveprobs
    if (_save_spatial_probs() and _spatial_pipe()
            and not _warned_pipe_vs_saveprobs):
        # the pipelined forward has no saved-probs variant: under grad the
        # saved-probs grid kernel wins and SPATIAL_PIPE only affects
        # no-grad forwards — warn so a knob sweep cannot silently
        # misattribute which kernel was measured
        import warnings

        warnings.warn("SPATIAL_SAVE_PROBS=1 takes precedence over "
                      "SPATIAL_PIPE=1 on differentiated forwards; the "
                      "pipelined kernel is NOT being measured on the "
                      "grad path")
        _warned_pipe_vs_saveprobs = True
    if _save_spatial_probs() and jax.device_count() == 1:
        # single-device default (multi-device falls through to the
        # partition-aware recompute path): probs travel as a named
        # residual (the same "flash_attn_out" bucket the remat policy
        # keeps)
        from jax.ad_checkpoint import checkpoint_name

        out, out_c, probs = _flash_cls_qkv_fwd_sp(qkv, qkv_c, num_heads,
                                                  scale)
        probs = checkpoint_name(probs, "flash_attn_out")
        if _spatial_delta():
            # the delta backward reads the primal output (no extra write:
            # o is live downstream anyway)
            return (out, out_c), (qkv, qkv_c, probs, out, out_c)
        return (out, out_c), (qkv, qkv_c, probs, None, None)
    return _flash_cls_qkv_fwd_sharded(qkv, qkv_c, num_heads, scale), (
        qkv, qkv_c, None, None, None,
    )


def _facq_bwd(num_heads, scale, res, gs):
    qkv, qkv_c, probs, o, oc = res
    g, gc = gs
    if probs is None:
        return _flash_cls_qkv_bwd_sharded(qkv, qkv_c, g, gc, num_heads,
                                          scale)
    if o is not None:
        return _flash_cls_qkv_bwd_sp_delta(qkv, qkv_c, probs, o, oc, g, gc,
                                           num_heads, scale)
    return _flash_cls_qkv_bwd_sp(qkv, qkv_c, probs, g, gc, num_heads, scale)


flash_attention_cls_qkv.defvjp(_facq_fwd, _facq_bwd)


# ---------------------------------------------------------------------------
# Temporal attention on the time-major stream, layout-native (v2).
#
# The divided temporal pass attends over T (tiny, 8) for each of B*N patch
# positions.  The XLA path pays the full [B*N, T, C] relayout + head-split
# copies plus fp32 [B*N, H, T, T] logits traffic per block — v5e traces
# show the family at ~30% of the train step for ~1 GFLOP of attention math
# (the batched [T, d] x [d, T] matmuls starve the MXU at ~1-2% utilization).
#
# This kernel reads the qkv-projected stream in its native [B, T, N, 3C]
# layout (grid over (batch, n-tile, head-group); q/k/v are the same array
# bound three times with shifted lane-block index maps) and keeps the MXU
# busy with *structured 0/1 matmuls* instead of tiny batched ones:
#
# - logits, COMPACT: L_t[n, s*hpb + j] = sum_d q[t,n,(j,d)] k[s,n,(j,d)]
#   via dot(q_t * k_s, E_s) where E_s [w, 128] is a constant expander with
#   ones mapping head-j lanes onto column s*hpb+j (one [nt,w]x[w,128] MXU
#   dot per (t, s) pair instead of B*N tiny [T,d]x[d,T] matmuls);
# - softmax, COMPACT: one full-row max (a row-constant shift is exact for
#   softmax), one exp over [nt, 128] per t (vs T*T broadcast exps), and the
#   per-head denominator via dot with a constant head-indicator SumMat;
# - P V and the backward broadcasts go back through dot(P_t, B_s) (B_s =
#   E_s^T) — probabilities are cast to the value dtype before the multiply,
#   matching the reference semantics (lib/models/vit.py:88-90).
#
# The v1 formulation (per-(t,s) VPU cross-lane reduces + T*T broadcast
# exps) measured 53.2 clips/sec end-to-end vs 56.9 for the XLA relayout
# path; this MXU form replaces ~64 lane reductions + 64 exp sheets per
# (t-loop) with ~17 structured dots and 8 exps.
# ---------------------------------------------------------------------------


def _temporal_consts(T: int, d: int, hpb: int, dt):
    """Constant 0/1 matrices for the compact temporal attention.

    E[s] [w, 128]: lane r (head j = r // d) -> compact column s*hpb + j.
    B[s] = E[s]^T [128, w]: compact column back to head-j lanes.
    SumMat [128, 128]: compact (s, j) -> sum over s for head j, replicated
    into every (s', j) column; only real columns (< T*hpb) contribute.
    """
    w = d * hpb
    used = T * hpb
    rows_j = jax.lax.broadcasted_iota(jnp.int32, (w, 128), 0) // d
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, 128), 1)
    E = [(cols == s * hpb + rows_j).astype(dt) for s in range(T)]
    colsT = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0)
    rows_jT = jax.lax.broadcasted_iota(jnp.int32, (128, w), 1) // d
    B = [(colsT == s * hpb + rows_jT).astype(dt) for s in range(T)]
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    summat = jnp.logical_and(ci % hpb == co % hpb, ci < used).astype(dt)
    return E, B, summat


def _temporal_compact_probs(q, k, E, summat, scale: float, T: int,
                            hpb: int):
    """Compact fp32 probabilities P_t [nt, 128] for every t.

    q, k: [T, nt, w].  Column s*hpb + j of P_t holds p[t, s] for head j;
    columns >= T*hpb are zero."""
    used = T * hpb
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[1], 128), 1)
    probs = []
    for t in range(T):
        logit = None
        for s in range(T):
            prod = q[t] * k[s]  # input dtype; bf16 product rounding is the
            # same one XLA's probs.astype(v.dtype) path applies per term
            part = jax.lax.dot_general(
                prod, E[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logit = part if logit is None else logit + part
        e = _compact_exp(logit * scale, col, used, hpb)
        denom = jax.lax.dot_general(
            e, summat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        probs.append(e / denom)
    return probs


def _temporal_consts_batched(T: int, d: int, hpb: int, dt):
    """Constant 0/1 matrices for the BATCHED (v3) temporal kernels.

    Estack [T*w, 128] = the per-s expanders E[s] stacked along rows: row
    s*w + r (head j = r // d) -> compact column s*hpb + j, so ONE
    [nt, T*w] x [T*w, 128] dot accumulates all s contributions of a
    compact logit row (vs T separate K=w dots).
    Ball [128, T*w] = the B[s] broadcasters stacked along columns: one
    [nt, 128] x [128, T*w] dot broadcasts a compact row onto the head
    lanes of every s at once.
    """
    w = d * hpb
    rows = jax.lax.broadcasted_iota(jnp.int32, (T * w, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T * w, 128), 1)
    estack = (cols == (rows // w) * hpb + (rows % w) // d).astype(dt)
    rr = jax.lax.broadcasted_iota(jnp.int32, (128, T * w), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, T * w), 1)
    ball = (rr == (cc // w) * hpb + (cc % w) // d).astype(dt)
    used = T * hpb
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    summat = jnp.logical_and(ci % hpb == co % hpb, ci < used).astype(dt)
    return estack, ball, summat


def _compact_exp(logit, col, used: int, hpb: int):
    """Shared compact-softmax numerator: mask columns >= used, per-head max
    via cyclic roll max-doubling over the lane classes c = j (mod hpb)
    (exact: the class covers all 128 lanes cyclically, so every member sees
    the same class max), exp.  Used by both the v2 and v3 temporal kernels
    — keep ONE copy of this numerics-critical sequence."""
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    logit = jnp.where(col < used, logit, neg)
    # TEMPORAL_SHIFT=max|clamp|none mirrors SPATIAL_SHIFT (see _shift):
    # `clamp` (default) replaces the whole log2(128/hpb)-step roll-max
    # chain below with one elementwise min — exact softmax for logits
    # < 80, finite beyond (a T=8 class row sums to at most 8*exp(80)
    # ~ 4.4e35 < fp32 max, so the denominator dot stays finite too).
    # Measured: kernel fwd 3.336 -> 2.717 ms (-18.6 %), e2e TimeSformer
    # 88.30 -> 91.23 clips/sec/chip (BASELINE round 5).
    mode = os.environ.get("TEMPORAL_SHIFT", "clamp")
    if mode == "clamp":
        return jnp.exp(jnp.minimum(logit, _CLAMP_HI))
    if mode == "none":
        return jnp.exp(logit)  # masked cols -> exp(fp32.min) = 0
    if mode != "max":
        raise ValueError(f"TEMPORAL_SHIFT={mode!r}: expected max|clamp|none")
    m = logit
    shift = hpb
    while shift < 128:
        m = jnp.maximum(m, pltpu.roll(m, shift, 1))
        shift *= 2
    return jnp.exp(logit - m)  # masked cols -> exp(-inf) = 0


def _temporal_fwd_kernel_v3(q_ref, k_ref, v_ref, o_ref, p_ref, *,
                            scale: float, d: int, hpb: int):
    """Batched-dot variant of :func:`_temporal_fwd_kernel`: identical math
    (same products, fp32 accumulation, same compact softmax), but the
    T logits dots and T probability broadcasts per t collapse into ONE
    K=T*w dot and ONE N=T*w dot — v2 issues 128 tiny MXU dots per grid
    step and is dispatch-bound, not FLOP-bound."""
    T = q_ref.shape[1]
    dt = q_ref.dtype
    w = d * hpb
    estack, ball, summat = _temporal_consts_batched(T, d, hpb, dt)
    q = q_ref[0]  # [T, nt, w]
    k = k_ref[0]
    v = v_ref[0]
    used = T * hpb
    nt = q.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (nt, 128), 1)
    kcat = jnp.concatenate([k[s] for s in range(T)], axis=1)  # [nt, T*w]
    for t in range(T):
        qt_tiled = jnp.concatenate([q[t]] * T, axis=1)
        prod = qt_tiled * kcat  # input dtype, same per-term rounding as v2
        logit = jax.lax.dot_general(
            prod, estack, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        e = _compact_exp(logit, col, used, hpb)
        denom = jax.lax.dot_general(
            e, summat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_c = (e / denom).astype(dt)
        p_ref[0, t] = p_c
        pb_all = jax.lax.dot_general(  # all s broadcasts in one dot
            p_c, ball, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_t = None
        for s in range(T):
            term = (pb_all[:, s * w:(s + 1) * w]
                    * v[s].astype(jnp.float32))
            o_t = term if o_t is None else o_t + term
        o_ref[0, t] = o_t.astype(o_ref.dtype)


def _temporal_bwd_kernel_v3(q_ref, k_ref, v_ref, g_ref, p_ref, dq_ref,
                            dk_ref, dv_ref, *, scale: float, d: int,
                            hpb: int):
    T = q_ref.shape[1]
    dt = q_ref.dtype
    w = d * hpb
    estack, ball, summat = _temporal_consts_batched(T, d, hpb, dt)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    kcat = jnp.concatenate([k[s] for s in range(T)], axis=1)
    vcat = jnp.concatenate([v[s] for s in range(T)], axis=1)
    dk_acc = [None] * T
    dv_acc = [None] * T
    for t in range(T):
        p = p_ref[0, t].astype(jnp.float32)  # [nt, 128] compact
        gt = g[t]
        gt_tiled = jnp.concatenate([gt] * T, axis=1)
        dp = jax.lax.dot_general(  # dp[t] compact, all s in one dot
            gt_tiled * vcat, estack, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rowsum = jax.lax.dot_general(
            dp * p, summat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - rowsum)).astype(dt)
        p_c = p.astype(dt)
        bds_all = jax.lax.dot_general(
            ds, ball, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bp_all = jax.lax.dot_general(
            p_c, ball, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gf = gt.astype(jnp.float32)
        qf = q[t].astype(jnp.float32)
        dq_t = None
        for s in range(T):
            sl = slice(s * w, (s + 1) * w)
            bds = bds_all[:, sl]
            term_q = bds * k[s].astype(jnp.float32)
            dq_t = term_q if dq_t is None else dq_t + term_q
            term_k = bds * qf
            dk_acc[s] = term_k if dk_acc[s] is None else dk_acc[s] + term_k
            term_v = bp_all[:, sl] * gf
            dv_acc[s] = term_v if dv_acc[s] is None else dv_acc[s] + term_v
        dq_ref[0, t] = (dq_t * scale).astype(dq_ref.dtype)
    for s in range(T):
        dk_ref[0, s] = (dk_acc[s] * scale).astype(dk_ref.dtype)
        dv_ref[0, s] = dv_acc[s].astype(dv_ref.dtype)


def _temporal_batched() -> bool:
    """TEMPORAL_BATCHED=1 selects the v3 batched-dot kernels (opt-in until
    measured on hardware; v2 remains the default)."""
    import os

    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("TEMPORAL_BATCHED", False)


def _temporal_fwd_kernel(q_ref, k_ref, v_ref, o_ref, p_ref, *, scale: float,
                         d: int, hpb: int):
    T = q_ref.shape[1]
    dt = q_ref.dtype
    E, B, summat = _temporal_consts(T, d, hpb, dt)
    q = q_ref[0]  # [T, nt, w]
    k = k_ref[0]
    v = v_ref[0]
    probs = _temporal_compact_probs(q, k, E, summat, scale, T, hpb)
    for t in range(T):
        p_c = probs[t].astype(dt)  # cast before PV (reference semantics)
        # compact probabilities are a kernel output: the backward reads
        # them instead of re-running the logits dots + softmax (the saved
        # tensor is [B, T, N, 128*cgroups] — tiny next to the stream)
        p_ref[0, t] = p_c
        o_t = None
        for s in range(T):
            pb = jax.lax.dot_general(  # broadcast p[t,s] onto head lanes
                p_c, B[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            term = pb * v[s].astype(jnp.float32)
            o_t = term if o_t is None else o_t + term
        o_ref[0, t] = o_t.astype(o_ref.dtype)


def _temporal_bwd_kernel(q_ref, k_ref, v_ref, g_ref, p_ref, dq_ref, dk_ref,
                         dv_ref, *, scale: float, d: int, hpb: int):
    T = q_ref.shape[1]
    dt = q_ref.dtype
    E, B, summat = _temporal_consts(T, d, hpb, dt)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    probs = [p_ref[0, t].astype(jnp.float32) for t in range(T)]
    dk_acc = [None] * T
    dv_acc = [None] * T
    for t in range(T):
        p = probs[t]  # [nt, 128] fp32 compact
        gt = g[t]
        # dp[t] compact: dot(g_t * v_s, E_s)
        dp = None
        for s in range(T):
            part = jax.lax.dot_general(
                gt * v[s], E[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = part if dp is None else dp + part
        rowsum = jax.lax.dot_general(  # per-head sum_s dp * p, replicated
            dp * p, summat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - rowsum)).astype(dt)  # matmul operands in input dtype
        p_c = p.astype(dt)
        dq_t = None
        for s in range(T):
            bds = jax.lax.dot_general(  # ds[t,s] onto head lanes
                ds, B[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bp = jax.lax.dot_general(  # p[t,s] onto head lanes
                p_c, B[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            kf = k[s].astype(jnp.float32)
            qf = q[t].astype(jnp.float32)
            gf = gt.astype(jnp.float32)
            term_q = bds * kf
            dq_t = term_q if dq_t is None else dq_t + term_q
            term_k = bds * qf
            dk_acc[s] = term_k if dk_acc[s] is None else dk_acc[s] + term_k
            term_v = bp * gf
            dv_acc[s] = term_v if dv_acc[s] is None else dv_acc[s] + term_v
        dq_ref[0, t] = (dq_t * scale).astype(dq_ref.dtype)
    for s in range(T):
        dk_ref[0, s] = (dk_acc[s] * scale).astype(dk_ref.dtype)
        dv_ref[0, s] = dv_acc[s].astype(dv_ref.dtype)


MAX_TEMPORAL_T = 16


def _temporal_specs(T: int, n: int, nt: int, w: int, c: int):
    wb = w  # lane-block width
    q = pl.BlockSpec((1, T, nt, wb), lambda b, ni, g: (b, 0, ni, g),
                     memory_space=pltpu.VMEM)
    k = pl.BlockSpec((1, T, nt, wb),
                     lambda b, ni, g, off=c // wb: (b, 0, ni, off + g),
                     memory_space=pltpu.VMEM)
    v = pl.BlockSpec((1, T, nt, wb),
                     lambda b, ni, g, off=2 * (c // wb): (b, 0, ni, off + g),
                     memory_space=pltpu.VMEM)
    o = pl.BlockSpec((1, T, nt, wb), lambda b, ni, g: (b, 0, ni, g),
                     memory_space=pltpu.VMEM)
    p = pl.BlockSpec((1, T, nt, 128), lambda b, ni, g: (b, 0, ni, g),
                     memory_space=pltpu.VMEM)
    return q, k, v, o, p


def _temporal_geometry(n: int, c: int, d: int, num_heads: int, T: int,
                       itemsize: int):
    """(hpb, w, nt) shared by forward and backward — the saved compact
    probs are laid out per head-GROUP, so both directions must agree.

    Preference: the largest n-tile (a single whole-N tile avoids the
    ragged-split padding tax) with the smallest 128-aligned head group;
    shrink the tile before giving up.  Budget: 8 double-buffered
    [1, T, nt, w] blocks (the backward's ref count) within ~10 MB,
    leaving VMEM room for the 0/1 expander constants and the Mosaic
    stack."""
    budget = 10 * 2 ** 20
    # v3 (TEMPORAL_BATCHED) additionally holds [nt, T*w] scratch: kcat/vcat
    # + the per-t tiled sheet (input dtype) and two fp32 broadcast sheets
    # (pb_all / bds_all) — ~14 * T*nt*w bytes on top of the 8
    # double-buffered grid blocks
    extra = 14 if _temporal_batched() else 0
    for nt in (min(n, 256), 128, 64):
        if nt > n:
            continue
        for hpb in (1, 2, 4, 8):
            if num_heads % hpb or (d * hpb) % 128 or T * hpb > 128:
                continue
            w = d * hpb
            if (8 * 2 * itemsize + extra) * T * nt * w <= budget:
                return hpb, w, nt
    return 0, 0, 0


def _temporal_fwd(qkv, num_heads: int, scale: float):
    """Returns (out [B, T, N, C], compact probs [B, T, N, 128 * cgroups])."""
    b, T, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb, w, nt = _temporal_geometry(n, c, d, num_heads, T, qkv.dtype.itemsize)
    assert hpb > 0, f"unsupported temporal geometry d={d} H={num_heads}"
    qs, ks, vs, os, ps = _temporal_specs(T, n, nt, w, c)
    return pl.pallas_call(
        functools.partial(
            _temporal_fwd_kernel_v3 if _temporal_batched()
            else _temporal_fwd_kernel, scale=scale, d=d, hpb=hpb),
        grid=(b, (n + nt - 1) // nt, c // w),
        in_specs=[qs, ks, vs],
        out_specs=[os, ps],
        out_shape=[
            jax.ShapeDtypeStruct((b, T, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, T, n, 128 * (c // w)), qkv.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * T * T * n * c,
            bytes_accessed=(3 + 1) * b * T * n * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * T * T * n,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv)


def _temporal_bwd(qkv, probs, g, num_heads: int, scale: float):
    b, T, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb, w, nt = _temporal_geometry(n, c, d, num_heads, T, qkv.dtype.itemsize)
    qs, ks, vs, os, ps = _temporal_specs(T, n, nt, w, c)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _temporal_bwd_kernel_v3 if _temporal_batched()
            else _temporal_bwd_kernel, scale=scale, d=d, hpb=hpb),
        grid=(b, (n + nt - 1) // nt, c // w),
        in_specs=[qs, ks, vs, os, ps],
        out_specs=[os, os, os],
        out_shape=[jax.ShapeDtypeStruct((b, T, n, c), qkv.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * T * T * n * c,
            bytes_accessed=7 * b * T * n * c * qkv.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, g, probs)
    return jnp.concatenate([dq, dk, dv], axis=-1)


_temporal_fwd_sharded = partition_aware(_temporal_fwd, _wrap(
    _temporal_fwd, n_tensors=1, static_argnums=(1, 2),
    rule="b t n ci -> b t n co, b t n cp",
    need_replication=("t", "n", "ci", "co", "cp"), shard_c=False, rank=4,
))
# NOTE: need_replication factors must be listed in first-appearance order
# (shardy rejects unsorted "special factor" indices)
_temporal_bwd_sharded = partition_aware(_temporal_bwd, _wrap(
    _temporal_bwd, n_tensors=3, static_argnums=(3, 4),
    rule="b t n ci, b t n cp, b t n cg -> b t n ci",
    need_replication=("t", "n", "ci", "cp", "cg"), shard_c=False, rank=4,
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_temporal(qkv, num_heads, scale):
    """Temporal self-attention over axis 1 of the time-major stream.

    qkv: [B, T, N, 3C] — the fused qkv projection output reshaped to the
    native stream layout (thirds q|k|v, heads interleaved within each).
    Attention runs over T independently per (B, N) position.  Returns
    [B, T, N, C].
    """
    return _temporal_fwd_sharded(qkv, num_heads, scale)[0]


def _fat_fwd(qkv, num_heads, scale):
    from jax.ad_checkpoint import checkpoint_name

    out, probs = _temporal_fwd_sharded(qkv, num_heads, scale)
    # name the saved compact probs so the remat policy keeps them (else
    # the forward kernel would re-run in the backward just to regenerate
    # them, defeating the point of saving)
    return out, (qkv, checkpoint_name(probs, "flash_attn_out"))


def _fat_bwd(num_heads, scale, res, g):
    qkv, probs = res
    return (_temporal_bwd_sharded(qkv, probs, g, num_heads, scale),)


flash_attention_temporal.defvjp(_fat_fwd, _fat_bwd)


def flash_mhsa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Head-split convenience wrapper: q, k, v [B, H, N, D]."""
    b, h, n, d = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    out = flash_attention_headfused(fold(q), fold(k), fold(v), h, float(scale))
    return out.reshape(b, n, h, d).transpose(0, 2, 1, 3)
