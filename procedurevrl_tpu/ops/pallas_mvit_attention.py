"""Fused flash attention for MViT pooled multi-scale attention.

Replaces the XLA path in ``models/mvit.py`` that materializes the full
``[B, H, qN, kN]`` fp32 logits plus the rel-pos reshape/concat traffic
(reference ``lib/models/slowfast_mvit/attention.py:162-442``).  MViT's
pooled attention is extremely rectangular — qN up to 25k tokens while the
pooled key set stays ~400 — so the kernel tiles queries and keeps the whole
K/V block VMEM-resident:

- grid ``(B*H, ceil(qN / TQ))``; per step one [TQ, d] query tile attends
  over the full [KP, d] key/value block (d = 96 rides the "full array dim"
  Mosaic lane rule);
- the decomposed rel-pos bias ``bias[q, (t',h',w')] = rel_t[q,t'] +
  rel_h[q,h'] + rel_w[q,w']`` is added in-tile as ONE MXU matmul of the
  concatenated ``[.., qN, k_t+k_h+k_w]`` table against the row-stacked
  0/1 expander ``E_cat [k_t+k_h+k_w, KP]`` (three separate dots each
  cost a full K-chunk MXU pass at 8-14/128 contraction utilization) —
  the rel tables are computed outside with small einsums (qN x 7/8,
  negligible next to qN x kN) and never expanded in HBM;
- the CLS key/value is spliced into the first key padding column (the same
  trick as the TimeSformer cls kernel); expander columns there are zero, so
  no bias lands on the cls key, matching the reference's body-only rel-pos.
  The single CLS *query* row stays outside in plain XLA (1 x kN is free);
- backward recomputes probabilities flash-style and accumulates dk/dv in
  fp32 across query tiles (grid iterates tiles innermost, ``pl.when`` zeros
  the accumulator on the first tile).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from procedurevrl_tpu.ops.pallas_attention import _interpret, _round_up
from procedurevrl_tpu.ops.pallas_partition import _wrap, partition_aware

# einsum-style sharding rules shared by the per-head and head-last kernel
# wrappers: batch dim (B or B*H) shards over `data`, everything else
# replicated (factors listed in first-appearance order — shardy rejects
# unsorted "special factor" indices)
_MVIT_FWD_RULE = "b q c, b k c, b k c, b u c, b u c, b q r -> b q c"
_MVIT_BWD_RULE = ("b q c, b k c, b k c, b u c, b u c, b q r, b q c -> "
                  "b q c, b k c, b k c, b u c, b u c, b q r")
_MVIT_REPL = ("q", "c", "k", "u", "r")

TQ = 512  # default query rows per tile


def _tile_q(kp: int) -> int:
    """Query rows per tile, shrunk for wide key blocks: the backward holds
    ~3 fp32 [TQ, KP] arrays (p, dp, ds) live at once, which must fit the
    16 MB VMEM stack alongside the fp32 dk/dv accumulators.  The saved-probs
    path (opt-in MVIT_SAVE_PROBS=1) additionally streams a double-buffered
    [TQ, KP] input-dtype probs block — budgeted here so both backwards agree
    on TQ (the saved probs layout is chosen by the forward)."""
    for tq in (512, 256, 128, 64):
        if (3 * tq * kp * 4 + 2 * tq * kp * 2
                + 2 * kp * 96 * 4 <= 9 * 2 ** 20):
            return tq
    return 32

# worthwhile whenever the key set fits VMEM: profiling showed the XLA
# fallback's full-logits rel-pos path materializing [B, H, qN, kN] fp32
# plus 8-D broadcast/reduce temporaries (~40 ms/step at q=392, k=1568 —
# the stage-transition blocks), far worse than small-q kernel launches
MIN_FUSED_QN = 64
MAX_FUSED_KN = 2048


def hl_supported(kn: int, C: int, H: int) -> bool:
    """Whether the head-last kernel has a VMEM-feasible geometry for this
    block (wide key sets exceed the scoped-VMEM stack; those rare
    stage-transition blocks use the per-head kernel instead)."""
    return _hl_geometry(_round_up(kn + 1, 128), C, H, C // H) is not None


def expanders(k_shape, kp: int) -> tuple:
    """0/1 expander matrices e_t [k_t, KP], e_h [k_h, KP], e_w [k_w, KP]
    mapping the per-axis rel-pos tables onto flattened key columns
    (column j = (t', h', w') row-major); padding + cls columns stay zero."""
    k_t, k_h, k_w = k_shape
    kn = k_t * k_h * k_w
    cols = np.arange(kn)
    e_t = np.zeros((k_t, kp), np.float32)
    e_h = np.zeros((k_h, kp), np.float32)
    e_w = np.zeros((k_w, kp), np.float32)
    e_t[cols // (k_h * k_w), cols] = 1.0
    e_h[(cols // k_w) % k_h, cols] = 1.0
    e_w[cols % k_w, cols] = 1.0
    return e_t, e_h, e_w


def expanders_jnp(k_shape, kp: int) -> tuple:
    """:func:`expanders` as TRACED lax ops (iota + compare), not numpy
    constants: the partition-aware wrappers trace the kernel callers under
    ``custom_partitioning``, which rejects closure constants (jaxprs must
    be const-free), and building the matrices on-device is free anyway."""
    k_t, k_h, k_w = k_shape
    kn = k_t * k_h * k_w

    def one(rows_n, sel):
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, kp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_n, kp), 1)
        return jnp.where(jnp.logical_and(rows == sel(cols), cols < kn),
                         jnp.float32(1), jnp.float32(0))

    e_t = one(k_t, lambda c: c // (k_h * k_w))
    e_h = one(k_h, lambda c: (c // k_w) % k_h)
    e_w = one(k_w, lambda c: c % k_w)
    return e_t, e_h, e_w


def expander_cat_jnp(k_shape, kp: int):
    """ROW-STACKED expander [k_t + k_h + k_w, KP]: one MXU pass computes
    the full decomposed bias ``rel_cat @ E_cat = rel_t@e_t + rel_h@e_h +
    rel_w@e_w``.  Three separate dots each cost a full K-chunk MXU pass at
    8-14/128 contraction utilization — fusing them collapses 3 passes (and
    3 tiny-lane operand streams) into 1."""
    return jnp.concatenate(expanders_jnp(k_shape, kp), axis=0)


def _valid_rows(tile_idx, qn: int, tq: int):
    """Number of valid query rows in tile ``tile_idx`` (ragged tail)."""
    return jnp.minimum(qn - tile_idx * tq, tq)


def _ds_chain(pf, dp):
    """softmax VJP ds = pf * (dp - rowsum(dp * pf)).  MVIT_MXU_DSUM=1
    computes the rowsum as an fp32 MXU dot against a [KP, 128] ones
    matrix (column 0 re-broadcast) instead of a VPU cross-lane reduce
    over the wide key axis — the round-2 LayerNorm-reduction trick; a
    square ones matrix (the spatial kernels' form) would be [KP, KP] =
    11 MB VMEM at the wide-key blocks."""
    from procedurevrl_tpu.utils.env import env_flag

    prod = dp * pf
    if env_flag("MVIT_MXU_DSUM", False):
        ones = jnp.ones((prod.shape[1], 128), jnp.float32)
        rs = jax.lax.dot_general(prod, ones, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return pf * (dp - rs[:, :1])
    return pf * (dp - jnp.sum(prod, axis=-1, keepdims=True))


def _mask_rows(x, n_valid):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < n_valid, x, jnp.zeros_like(x))


def _probs(q, k, rel, e_cat, scale: float, kn: int):
    """fp32 softmax probs for one query tile over the spliced key block.

    ``rel`` is the CONCATENATED [TQ, k_t + k_h + k_w] per-axis table,
    ``e_cat`` the row-stacked expander (:func:`expander_cat_jnp`) — the
    whole decomposed bias is one dot.  Operands run in the input dtype
    (exact for the 0/1 expander; fp32-operand MXU matmuls cost multiple
    passes — the round-2 backward policy), accumulation fp32.  Key column
    ``kn`` is the cls (no bias); columns > kn are padding."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [TQ, KP]
    dt = q.dtype
    s = s + jax.lax.dot_general(
        rel.astype(dt), e_cat.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col <= kn, s, jnp.finfo(jnp.float32).min)
    # MVIT_SHIFT=max|clamp|none mirrors the spatial family's SPATIAL_SHIFT
    # (pallas_attention._shift): `clamp` (default) replaces the cross-lane
    # row-max reduce + broadcast subtract with one elementwise min(s, 80)
    # — exact softmax for bounded logits, finite (not inf/NaN) beyond; the
    # widest key block here is KP=1664 and 1664*exp(80) ~ 9e37 < fp32 max.
    # Measured: mvit_hl fwd+bwd 2.916 -> 2.658 ms, e2e 67.62 -> 67.97
    # clips/sec/chip (BASELINE round 5).
    mode = os.environ.get("MVIT_SHIFT", "clamp")
    if mode == "clamp":
        s = jnp.minimum(s, 80.0)
    elif mode == "max":
        s = s - jnp.max(s, axis=-1, keepdims=True)
    elif mode != "none":
        raise ValueError(f"MVIT_SHIFT={mode!r}: expected max|clamp|none")
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _splice_cls(k, kc, kn: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    return jnp.where(rows == kn, jnp.broadcast_to(kc, k.shape), k)


def _fwd_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref, o_ref,
                *, scale: float, qn: int, kn: int):
    k = _splice_cls(k_ref[0], kc_ref[0], kn)
    v = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    p = _probs(q_ref[0], k, rc_ref[0], ec_ref[...], scale, kn)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fwd_kernel_saveprobs(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref,
                          ec_ref, o_ref, p_ref, *, scale: float, qn: int,
                          kn: int):
    """Forward that ALSO writes the probabilities (input dtype) so the
    backward skips the 4 score matmuls + softmax chain entirely (the
    temporal-kernel pattern; the wide-key probs are only ~130 MB/step)."""
    k = _splice_cls(k_ref[0], kc_ref[0], kn)
    v = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    p = _probs(q_ref[0], k, rc_ref[0], ec_ref[...], scale, kn)
    pc = p.astype(v.dtype)
    p_ref[0] = pc.astype(p_ref.dtype)
    o_ref[0] = jnp.dot(pc, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref, g_ref,
                dq_ref, dkf_ref, dvf_ref, drc_ref,
                *, scale: float, qn: int, kn: int, tq: int):
    """Recompute backward (the e2e MViT default): probs re-derived in fp32
    exactly as the forward, then ALL five gradient matmuls run with
    input-dtype operands + fp32 accumulation — the saved-probs kernel's
    round-2 policy (fp32-operand MXU matmuls cost multiple passes; the
    probs cast to bf16 here matches what the saved-probs path reads back
    from HBM, without its ~130 MB/step probs round-trip)."""
    qt = pl.program_id(1)
    nvalid = _valid_rows(qt, qn, tq)
    dt = q_ref.dtype
    q = _mask_rows(q_ref[0], nvalid)
    # mask key padding rows: ds columns there are zero, but 0 * garbage
    # (NaN in interpret mode) would still poison dq = ds @ k
    k = _mask_rows(_splice_cls(k_ref[0], kc_ref[0], kn), kn + 1)
    v = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    rc = _mask_rows(rc_ref[0], nvalid)
    ec = ec_ref[...]
    pf = _probs(q, k, rc, ec, scale, kn)
    p = pf.astype(dt)
    gf = _mask_rows(g_ref[0], nvalid)

    dv = jax.lax.dot_general(p, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gf, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = _ds_chain(pf, dp)  # [TQ, KP]
    ds_c = ds.astype(dt)
    dq_ref[0] = (jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    drc_ref[0] = jax.lax.dot_general(
        ds_c, ec.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drc_ref.dtype)

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    dkf_ref[0] += dk
    dvf_ref[0] += dv


def _bwd_kernel_delta(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref,
                      g_ref, o_ref, dq_ref, dkf_ref, dvf_ref, drc_ref,
                      *, scale: float, qn: int, kn: int, tq: int):
    """Recompute backward with the FlashAttention-2 delta identity
    (:func:`_mvit_delta`): the softmax-jacobian rowsum over the WIDE key
    axis (KP up to 1664) becomes delta_i = sum_d g_id * o_id — a d-wide
    (64/96 lane) reduce against the saved forward output instead of a
    [TQ, KP] product + KP-wide reduce.  Everything else matches
    :func:`_bwd_kernel`."""
    qt = pl.program_id(1)
    nvalid = _valid_rows(qt, qn, tq)
    dt = q_ref.dtype
    q = _mask_rows(q_ref[0], nvalid)
    k = _mask_rows(_splice_cls(k_ref[0], kc_ref[0], kn), kn + 1)
    v = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    rc = _mask_rows(rc_ref[0], nvalid)
    ec = ec_ref[...]
    pf = _probs(q, k, rc, ec, scale, kn)
    p = pf.astype(dt)
    gf = _mask_rows(g_ref[0], nvalid)
    of = _mask_rows(o_ref[0], nvalid)

    dv = jax.lax.dot_general(p, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gf, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = pf * (dp - delta)  # [TQ, KP]
    ds_c = ds.astype(dt)
    dq_ref[0] = (jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    drc_ref[0] = jax.lax.dot_general(
        ds_c, ec.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drc_ref.dtype)

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    dkf_ref[0] += dk
    dvf_ref[0] += dv


def _bwd_kernel_saveprobs(q_ref, k_ref, v_ref, kc_ref, vc_ref, g_ref, p_ref,
                          ec_ref, dq_ref, dkf_ref, dvf_ref, drc_ref,
                          *, scale: float, qn: int, kn: int, tq: int):
    """Backward from SAVED probabilities: no score recompute (the 4 MXU
    matmuls + fp32 softmax chain of :func:`_probs` disappear), and the
    five gradient matmuls run with input-dtype operands / fp32
    accumulation, matching the spatial kernel's round-2 policy (the
    original backward ran them with fp32 operands at a fraction of the
    bf16 MXU rate)."""
    qt = pl.program_id(1)
    nvalid = _valid_rows(qt, qn, tq)
    dt = q_ref.dtype
    q = _mask_rows(q_ref[0], nvalid)
    k = _mask_rows(_splice_cls(k_ref[0], kc_ref[0], kn), kn + 1)
    v = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    # ragged-tail rows of the saved probs are garbage — mask like q/g
    p = _mask_rows(p_ref[0], nvalid)
    gf = _mask_rows(g_ref[0], nvalid)

    dv = jax.lax.dot_general(p, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gf, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pf = p.astype(jnp.float32)
    ds = _ds_chain(pf, dp)  # [TQ, KP]
    ds_c = ds.astype(dt)
    dq_ref[0] = (jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    ec = ec_ref[...].astype(dt)
    drc_ref[0] = jax.lax.dot_general(
        ds_c, ec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(drc_ref.dtype)

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    dkf_ref[0] += dk
    dvf_ref[0] += dv


def _specs(bh: int, qn: int, kp: int, d: int, k_shape, tq: int):
    kcat = sum(k_shape)
    qs = pl.BlockSpec((1, tq, d), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, kp, d), lambda b, t: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((1, 1, d), lambda b, t: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    rc = pl.BlockSpec((1, tq, kcat), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)
    ec = pl.BlockSpec((kcat, kp), lambda b, t: (0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks, cs, rc, ec


def _fwd(q, k, v, kc, vc, rel, k_shape, scale, save_probs: bool = False):
    bh, qn, d = q.shape
    kn = k.shape[1]
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    tq = _tile_q(kp)
    qs, ks, cs, rc, ec = _specs(bh, qn, kp, d, k_shape, tq)
    grid = (bh, (qn + tq - 1) // tq)
    ps = pl.BlockSpec((1, tq, kp), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_saveprobs if save_probs else _fwd_kernel,
            scale=scale, qn=qn, kn=kn),
        grid=grid,
        in_specs=[qs, ks, ks, cs, cs, rc, ec],
        out_specs=[qs, ps] if save_probs else qs,
        out_shape=(
            [jax.ShapeDtypeStruct((bh, qn, d), q.dtype),
             jax.ShapeDtypeStruct((bh, qn, kp), q.dtype)]
            if save_probs else jax.ShapeDtypeStruct((bh, qn, d), q.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * qn * kp * d,
            bytes_accessed=(2 * bh * qn * d
                            + (bh * qn * kp if save_probs else 0))
            * q.dtype.itemsize,
            transcendentals=bh * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, rel, e_cat)


def _bwd(q, k, v, kc, vc, rel, k_shape, scale, g):
    bh, qn, d = q.shape
    kn = k.shape[1]
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    tq = _tile_q(kp)
    qs, ks, cs, rc, ec = _specs(bh, qn, kp, d, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, d), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    grid = (bh, (qn + tq - 1) // tq)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, qn=qn, kn=kn, tq=tq),
        grid=grid,
        in_specs=[qs, ks, ks, cs, cs, rc, ec, qs],
        out_specs=[qs, kacc, kacc, rc],
        out_shape=[
            jax.ShapeDtypeStruct((bh, qn, d), q.dtype),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, qn, sum(k_shape)), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * qn * kp * d,
            bytes_accessed=6 * bh * qn * d * q.dtype.itemsize,
            transcendentals=bh * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, rel, e_cat, g)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    return dq, dk, dv, dkc, dvc, drc.astype(rel.dtype)


def _bwd_delta(q, k, v, kc, vc, rel, o, k_shape, scale, g):
    bh, qn, d = q.shape
    kn = k.shape[1]
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    tq = _tile_q(kp)
    qs, ks, cs, rc, ec = _specs(bh, qn, kp, d, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, d), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    grid = (bh, (qn + tq - 1) // tq)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_kernel_delta, scale=scale, qn=qn, kn=kn,
                          tq=tq),
        grid=grid,
        in_specs=[qs, ks, ks, cs, cs, rc, ec, qs, qs],
        out_specs=[qs, kacc, kacc, rc],
        out_shape=[
            jax.ShapeDtypeStruct((bh, qn, d), q.dtype),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, qn, sum(k_shape)), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * qn * kp * d,
            bytes_accessed=7 * bh * qn * d * q.dtype.itemsize,
            transcendentals=bh * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, rel, e_cat, g, o)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    return dq, dk, dv, dkc, dvc, drc.astype(rel.dtype)


def _bwd_saved(q, k, v, kc, vc, rel, probs, k_shape, scale, g):
    bh, qn, d = q.shape
    kn = k.shape[1]
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    tq = _tile_q(kp)
    qs, ks, cs, rc, ec = _specs(bh, qn, kp, d, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, d), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    ps = pl.BlockSpec((1, tq, kp), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)
    grid = (bh, (qn + tq - 1) // tq)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_kernel_saveprobs, scale=scale, qn=qn, kn=kn,
                          tq=tq),
        grid=grid,
        in_specs=[qs, ks, ks, cs, cs, qs, ps, ec],
        out_specs=[qs, kacc, kacc, rc],
        out_shape=[
            jax.ShapeDtypeStruct((bh, qn, d), q.dtype),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, qn, sum(k_shape)), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * qn * kp * d,
            bytes_accessed=(6 * bh * qn * d + bh * qn * kp)
            * q.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, g, probs, e_cat)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    return dq, dk, dv, dkc, dvc, drc.astype(rel.dtype)


def _save_probs() -> bool:
    """MVIT_SAVE_PROBS=1 opts into the saved-probabilities backward.

    Default OFF (recompute-in-backward): despite the isolated-kernel win
    (wide-key fwd+bwd 7.70 vs 9.20 ms), end-to-end the ~130 MB/step probs
    HBM round-trip measures a net regression — 66.97 vs 67.44
    clips/sec/chip on v5e (BASELINE.md round-4 e2e table)."""
    import os

    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("MVIT_SAVE_PROBS", False)


def _mvit_delta() -> bool:
    """FlashAttention-2 delta identity for the recompute backward:
    rowsum_j(dp_ij p_ij) == delta_i = sum_d g_id o_id (because o = p @ v
    and dp = g @ v^T), so the wide-key jacobian rowsum becomes a d-wide
    reduce against the saved forward output.  Unlike MVIT_SAVE_PROBS
    (~130 MB/step probs round-trip, e2e negative) the extra residual is
    the primal OUTPUT — already live downstream, only an extra read.

    MEASURED NEUTRAL on v5e (within-process A/B/A/B, BASELINE.md round-4:
    mvit_ph 9.18/9.14 -> 9.11/9.16 ms, mvit_hl 2.82/2.75 -> 2.84/2.95):
    Mosaic already hides the [TQ, KP] jacobian product + KP-wide VPU
    rowsum under the backward's seven MXU matmuls and DMA — removing it
    buys nothing and the o block adds input traffic.  Opt-in MVIT_DELTA=1,
    default OFF (plain recompute backward)."""
    from procedurevrl_tpu.utils.env import env_flag

    return env_flag("MVIT_DELTA", False)


# partition-aware wrappers for the per-head kernel family (batch dim is
# the folded B*H; see the head-last note above for why only dim 0 shards)
def _fwd_plain_t(q, k, v, kc, vc, rel, k_shape, scale):
    # explicit-arity adapter: custom_partitioning binds DEFAULTED params
    # as traced operands, so wrapping _fwd directly would trace save_probs
    return _fwd(q, k, v, kc, vc, rel, k_shape, scale)


def _fwd_sp_t(q, k, v, kc, vc, rel, k_shape, scale):
    return _fwd(q, k, v, kc, vc, rel, k_shape, scale, save_probs=True)


def _bwd_t(q, k, v, kc, vc, rel, g, k_shape, scale):
    return _bwd(q, k, v, kc, vc, rel, k_shape, scale, g)


def _bwd_saved_t(q, k, v, kc, vc, rel, probs, g, k_shape, scale):
    return _bwd_saved(q, k, v, kc, vc, rel, probs, k_shape, scale, g)


def _bwd_delta_t(q, k, v, kc, vc, rel, o, g, k_shape, scale):
    return _bwd_delta(q, k, v, kc, vc, rel, o, k_shape, scale, g)


_fwd_ph_sharded = partition_aware(_fwd_plain_t, _wrap(
    _fwd_plain_t, n_tensors=6, static_argnums=(6, 7),
    rule=_MVIT_FWD_RULE, need_replication=_MVIT_REPL, shard_c=False,
))
_fwd_ph_sp_sharded = partition_aware(_fwd_sp_t, _wrap(
    _fwd_sp_t, n_tensors=6, static_argnums=(6, 7),
    rule="b q c, b k c, b k c, b u c, b u c, b q r -> b q c, b q kp",
    need_replication=_MVIT_REPL + ("kp",), shard_c=False,
))
_bwd_ph_sharded = partition_aware(_bwd_t, _wrap(
    _bwd_t, n_tensors=7, static_argnums=(7, 8),
    rule=_MVIT_BWD_RULE, need_replication=_MVIT_REPL, shard_c=False,
))
_bwd_ph_saved_sharded = partition_aware(_bwd_saved_t, _wrap(
    _bwd_saved_t, n_tensors=8, static_argnums=(8, 9),
    rule=("b q c, b k c, b k c, b u c, b u c, b q r, b q kp, b q c -> "
          "b q c, b k c, b k c, b u c, b u c, b q r"),
    need_replication=_MVIT_REPL + ("kp",), shard_c=False,
))
_bwd_ph_delta_sharded = partition_aware(_bwd_delta_t, _wrap(
    _bwd_delta_t, n_tensors=8, static_argnums=(8, 9),
    rule=("b q c, b k c, b k c, b u c, b u c, b q r, b q c, b q c -> "
          "b q c, b k c, b k c, b u c, b u c, b q r"),
    need_replication=_MVIT_REPL, shard_c=False,
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def flash_attention_mvit(q, k, v, kc, vc, rel, k_shape, scale):
    """Body-query pooled attention with decomposed rel-pos bias.

    q [BH, qN, d]; k, v [BH, kN, d] (body keys, row-major (t', h', w'));
    kc, vc [BH, 1, d] cls key/value; rel [BH, qN, k_t + k_h + k_w] is the
    CONCATENATED [rt | rh | rw] bias table (no bias lands on the cls
    key) -- the whole decomposed bias is ONE dot against the row-stacked
    expander instead of three contraction-starved ones.  Returns the
    body-query outputs [BH, qN, d]; the cls query is one row -- compute
    it outside.
    """
    return _fwd_ph_sharded(q, k, v, kc, vc, rel, k_shape, scale)


def _vjp_fwd(q, k, v, kc, vc, rel, k_shape, scale):
    if not _save_probs():
        out = _fwd_ph_sharded(q, k, v, kc, vc, rel, k_shape, scale)
        if _mvit_delta():
            from jax.ad_checkpoint import checkpoint_name

            # the delta backward reads the primal output (already live
            # downstream — an extra read, not an extra residual write);
            # named ON the residual so remat policies keep it instead of
            # replaying the forward kernel to regenerate it
            res_out = checkpoint_name(out, "flash_attn_out")
            return out, (q, k, v, kc, vc, rel, res_out, None)
        return out, (q, k, v, kc, vc, rel, None, None)
    from jax.ad_checkpoint import checkpoint_name

    out, probs = _fwd_ph_sp_sharded(q, k, v, kc, vc, rel, k_shape, scale)
    # named so remat policies keep the probs across the block boundary
    # (models/mvit.py lists "flash_attn_probs"); without it the backward
    # would rebuild the forward kernel just to regenerate them
    probs = checkpoint_name(probs, "flash_attn_probs")
    return out, (q, k, v, kc, vc, rel, None, probs)


def _vjp_bwd(k_shape, scale, res, g):
    *primals, o, probs = res
    if probs is not None:
        return _bwd_ph_saved_sharded(*primals, probs, g, k_shape, scale)
    if o is not None:
        return _bwd_ph_delta_sharded(*primals, o, g, k_shape, scale)
    return _bwd_ph_sharded(*primals, g, k_shape, scale)


flash_attention_mvit.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Head-LAST variant: q/k/v stay in the stream layout [B, L, H*d] end to end.
#
# The original kernel consumes [B*H, L, d] arrays, which the model had to
# produce with the [B, N, 3, H, d] -> [3, B, H, N, d] qkv transpose plus
# per-head pooling on [B*H, T, H', W', d] grids — v5e traces put those
# relayouts at ~28% of the MViT step.  This variant keeps every tensor
# head-interleaved: blocks are full-width (the "full array dim" Mosaic lane
# rule admits any C), the grid is (B, q-tiles), and the kernel loops heads
# with d-offset value slices (d = 96 lane offsets lower to lane rotates).
# The rel-pos tables arrive packed per head along lanes: [B, qN, H * k_*].
# Pooling runs channels-last on [B, T, H', W', C] with head-tiled depthwise
# weights (models/mvit.py), so no [B*H]-batched small-channel convs remain.
# ---------------------------------------------------------------------------


def _hl_geometry(kp: int, C: int, H: int, d: int):
    """(hg, w, tq) for the head-last kernel: ``hg`` heads per grid step
    (channel block w = hg*d must be a 128-multiple or the full C), query
    tile tq.  Budget: fp32 [KP, w] dk/dv accumulators + resident k/v
    blocks + double-buffered q/g/dq blocks + the backward's ~3 live fp32
    [TQ, KP] arrays must fit scoped VMEM (16 MB hard; keep margin)."""
    hgs = [H] + [h for h in (8, 4, 2) if h < H and H % h == 0
                 and (h * d) % 128 == 0]
    # prefer the biggest query tile (tiny tiles starve the MXU), then the
    # widest head group (fewer grid steps).  Stack model from a measured
    # v5e Mosaic OOM (21.7 MB at tq=128, kp=1664, w=384): ~14 live fp32
    # [tq, kp] sheets through _probs + the backward, plus fp32 [kp, w]
    # dk/dv temporaries.  Returns None when nothing with a sane tile
    # fits — the caller falls back to the per-head kernel.
    for tq in (512, 256, 128):
        for hg in hgs:
            w = hg * d
            acc = 2 * kp * w * 4
            kv = 2 * kp * w * 2
            qg = 2 * 3 * tq * w * 2
            rel = 2 * 3 * tq * hg * 32 * 4
            stack = (14 * tq * kp + 4 * kp * w) * 4
            if acc + kv + qg + rel + stack <= 15 * 2 ** 20:
                return hg, w, tq
    return None


def _fwd_hl_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref,
                   o_ref, *, scale: float, qn: int, kn: int, d: int, H: int,
                   kcat: int):
    # H here is heads PER BLOCK (hg); the grid's channel axis walks groups
    ec = ec_ref[...]
    # splice the cls row / mask padding ONCE at full channel width: a
    # lane-offset [1, d] head slice cannot be broadcast across rows by
    # Mosaic (misaligned vpad layouts); the full-width [1, C] row can
    kf = _splice_cls(k_ref[0], kc_ref[0], kn)
    vf = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        p = _probs(q_ref[0][:, sl], kf[:, sl],
                   rc_ref[0, 0][:, h * kcat:(h + 1) * kcat],
                   ec, scale, kn)
        v = vf[:, sl]
        o_ref[0, :, sl] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_hl_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref,
                   g_ref, dq_ref, dkf_ref, dvf_ref, drc_ref,
                   *, scale: float, qn: int, kn: int, d: int, H: int,
                   kcat: int, tq: int):
    qt = pl.program_id(2)
    nvalid = _valid_rows(qt, qn, tq)
    ec = ec_ref[...]

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    # full-width splice/mask (see _fwd_hl_kernel: Mosaic cannot broadcast
    # a lane-offset head slice across rows)
    qf = _mask_rows(q_ref[0], nvalid)
    kf = _mask_rows(_splice_cls(k_ref[0], kc_ref[0], kn), kn + 1)
    vf = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    ecc = ec.astype(q_ref.dtype)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = qf[:, sl]
        k = kf[:, sl]
        v = vf[:, sl]
        rc = _mask_rows(rc_ref[0, 0][:, h * kcat:(h + 1) * kcat], nvalid)
        p = _probs(q, k, rc, ec, scale, kn)
        # gradient matmuls run with INPUT-dtype operands and fp32
        # accumulation (fp32-operand MXU matmuls run at a fraction of the
        # bf16 rate — the round-2 spatial-kernel policy, also applied to
        # the per-head saved-probs backward); softmax math stays fp32
        dt = q_ref.dtype
        gf = _mask_rows(g_ref[0][:, sl], nvalid)

        dv = jax.lax.dot_general(p.astype(dt), gf, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gf, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = _ds_chain(p, dp)  # [TQ, KP]
        ds_c = ds.astype(dt)
        dq_ref[0, :, sl] = (jnp.dot(ds_c, k,
                                    preferred_element_type=jnp.float32)
                            * scale).astype(dq_ref.dtype)
        dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        drc_ref[0, 0, :, h * kcat:(h + 1) * kcat] = jax.lax.dot_general(
            ds_c, ecc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drc_ref.dtype)
        dkf_ref[0, :, sl] += dk
        dvf_ref[0, :, sl] += dv


def _bwd_hl_kernel_delta(q_ref, k_ref, v_ref, kc_ref, vc_ref, rc_ref, ec_ref,
                         g_ref, o_ref, dq_ref, dkf_ref, dvf_ref, drc_ref,
                         *, scale: float, qn: int, kn: int, d: int, H: int,
                         kcat: int, tq: int):
    """Head-last recompute backward with the FlashAttention-2 delta
    identity (:func:`_mvit_delta`): per head, ds = p * (dp - delta) with
    delta = rowsum_d(g * o) — a d-wide reduce instead of the [TQ, KP]
    jacobian product + KP-wide rowsum of :func:`_bwd_hl_kernel`."""
    qt = pl.program_id(2)
    nvalid = _valid_rows(qt, qn, tq)
    ec = ec_ref[...]

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    qf = _mask_rows(q_ref[0], nvalid)
    kf = _mask_rows(_splice_cls(k_ref[0], kc_ref[0], kn), kn + 1)
    vf = _mask_rows(_splice_cls(v_ref[0], vc_ref[0], kn), kn + 1)
    gff = _mask_rows(g_ref[0], nvalid)
    off = _mask_rows(o_ref[0], nvalid)
    ecc = ec.astype(q_ref.dtype)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = qf[:, sl]
        k = kf[:, sl]
        v = vf[:, sl]
        rc = _mask_rows(rc_ref[0, 0][:, h * kcat:(h + 1) * kcat], nvalid)
        p = _probs(q, k, rc, ec, scale, kn)
        dt = q_ref.dtype
        gf = gff[:, sl]

        dv = jax.lax.dot_general(p.astype(dt), gf, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gf, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(
            gf.astype(jnp.float32) * off[:, sl].astype(jnp.float32),
            axis=-1, keepdims=True)
        ds = p * (dp - delta)  # [TQ, KP]
        ds_c = ds.astype(dt)
        dq_ref[0, :, sl] = (jnp.dot(ds_c, k,
                                    preferred_element_type=jnp.float32)
                            * scale).astype(dq_ref.dtype)
        dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        drc_ref[0, 0, :, h * kcat:(h + 1) * kcat] = jax.lax.dot_general(
            ds_c, ecc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drc_ref.dtype)
        dkf_ref[0, :, sl] += dk
        dvf_ref[0, :, sl] += dv


def _specs_hl(qn: int, kp: int, w: int, k_shape, tq: int):
    """Blocks for grid (B, head-groups, q-tiles); the channel axis walks
    w-wide head groups (w a 128-multiple or the full width)."""
    kcat = sum(k_shape)
    qs = pl.BlockSpec((1, tq, w), lambda b, g, t: (b, t, g),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((1, kp, w), lambda b, g, t: (b, 0, g),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((1, 1, w), lambda b, g, t: (b, 0, g),
                      memory_space=pltpu.VMEM)
    def rspec(kk):
        # rel tables are 4-D [B, HG, qn, hg*k]: the head-group axis is a
        # real array axis so the lane dim stays the FULL (any-size) width
        return pl.BlockSpec((1, 1, tq, kk), lambda b, g, t: (b, g, t, 0),
                            memory_space=pltpu.VMEM)
    ec = pl.BlockSpec((kcat, kp), lambda b, g, t: (0, 0),
                      memory_space=pltpu.VMEM)
    return qs, ks, cs, rspec, ec


def _fwd_hl(q, k, v, kc, vc, rel, k_shape, num_heads, scale):
    B, qn, C = q.shape
    d = C // num_heads
    kn = k.shape[1]
    kcat = sum(k_shape)
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    hg, w, tq = _hl_geometry(kp, C, num_heads, d)
    hgn = num_heads // hg
    greg = lambda r, kk: r.reshape(B, qn, hgn, hg * kk).transpose(0, 2, 1, 3)
    qs, ks, cs, rspec, ec = _specs_hl(qn, kp, w, k_shape, tq)
    return pl.pallas_call(
        functools.partial(_fwd_hl_kernel, scale=scale, qn=qn, kn=kn, d=d,
                          H=hg, kcat=kcat),
        grid=(B, hgn, (qn + tq - 1) // tq),
        in_specs=[qs, ks, ks, cs, cs, rspec(hg * kcat), ec],
        out_specs=qs,
        out_shape=jax.ShapeDtypeStruct((B, qn, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * qn * kp * d,
            bytes_accessed=2 * B * qn * C * q.dtype.itemsize,
            transcendentals=B * num_heads * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, greg(rel, kcat), e_cat)


def _bwd_hl(q, k, v, kc, vc, rel, k_shape, num_heads, scale, g):
    B, qn, C = q.shape
    d = C // num_heads
    kn = k.shape[1]
    kcat = sum(k_shape)
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    hg, w, tq = _hl_geometry(kp, C, num_heads, d)
    hgn = num_heads // hg
    greg = lambda r, kk: r.reshape(B, qn, hgn, hg * kk).transpose(0, 2, 1, 3)
    qs, ks, cs, rspec, ec = _specs_hl(qn, kp, w, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, w), lambda b, g, t: (b, 0, g),
                        memory_space=pltpu.VMEM)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_hl_kernel, scale=scale, qn=qn, kn=kn, d=d,
                          H=hg, kcat=kcat, tq=tq),
        grid=(B, hgn, (qn + tq - 1) // tq),
        in_specs=[qs, ks, ks, cs, cs, rspec(hg * kcat), ec, qs],
        out_specs=[qs, kacc, kacc, rspec(hg * kcat)],
        out_shape=[
            jax.ShapeDtypeStruct((B, qn, C), q.dtype),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, hgn, qn, hg * kcat), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * qn * kp * d,
            bytes_accessed=6 * B * qn * C * q.dtype.itemsize,
            transcendentals=B * num_heads * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, greg(rel, kcat), e_cat, g)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    drel = drc.transpose(0, 2, 1, 3).reshape(
        B, qn, num_heads * kcat).astype(rel.dtype)
    return dq, dk, dv, dkc, dvc, drel


def _bwd_hl_delta(q, k, v, kc, vc, rel, o, k_shape, num_heads, scale, g):
    B, qn, C = q.shape
    d = C // num_heads
    kn = k.shape[1]
    kcat = sum(k_shape)
    kp = _round_up(kn + 1, 128)
    e_cat = expander_cat_jnp(k_shape, kp)
    hg, w, tq = _hl_geometry(kp, C, num_heads, d)
    hgn = num_heads // hg
    greg = lambda r, kk: r.reshape(B, qn, hgn, hg * kk).transpose(0, 2, 1, 3)
    qs, ks, cs, rspec, ec = _specs_hl(qn, kp, w, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, w), lambda b, g, t: (b, 0, g),
                        memory_space=pltpu.VMEM)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_hl_kernel_delta, scale=scale, qn=qn, kn=kn,
                          d=d, H=hg, kcat=kcat, tq=tq),
        grid=(B, hgn, (qn + tq - 1) // tq),
        in_specs=[qs, ks, ks, cs, cs, rspec(hg * kcat), ec, qs, qs],
        out_specs=[qs, kacc, kacc, rspec(hg * kcat)],
        out_shape=[
            jax.ShapeDtypeStruct((B, qn, C), q.dtype),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, hgn, qn, hg * kcat), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * qn * kp * d,
            bytes_accessed=7 * B * qn * C * q.dtype.itemsize,
            transcendentals=B * num_heads * qn * kp,
        ),
        interpret=_interpret(),
    )(q, k, v, kc, vc, greg(rel, kcat), e_cat, g, o)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    drel = drc.transpose(0, 2, 1, 3).reshape(
        B, qn, num_heads * kcat).astype(rel.dtype)
    return dq, dk, dv, dkc, dvc, drel


# ---------------------------------------------------------------------------
# K-TILED head-last variant (online softmax) for the wide-key blocks.
#
# The stage-transition blocks (kN = 1568 -> KP = 1664) exceed the whole-key
# head-last geometry (``_hl_geometry`` needs ~14 live fp32 [TQ, KP] sheets),
# so round 2/3 fell back to the per-head kernel there — paying the
# [B, L, H*d] -> [B*H, L, d] fold/unfold transposes this layout exists to
# avoid, plus a full K/V re-DMA per (batch*head, q-tile) grid step.  This
# variant processes the key axis in 128-multiple chunks with the standard
# flash running (max, denominator, accumulator) triple, so the live fp32
# sheets shrink from [TQ, KP] to [TQ, KC] and the full-width head-last
# layout fits scoped VMEM at any key width.  The forward additionally saves
# the per-head log-sum-exp rows ([B, head-groups, qN, hg] fp32, trivial
# HBM) so the backward reconstitutes probabilities per chunk as
# ``exp(s - lse)`` without an extra stats pass.
#
# MEASURED OUTCOME (v5e, BASELINE.md round 3): the VMEM geometries that
# actually fit on hardware run the backward chunk loop at tiles too small
# for the MXU (the fp32 [KP, w] dk/dv accumulator blocks dominate the
# scoped budget), and the kernel measures ~50% slower fwd+bwd than the
# per-head whole-key kernel at both reference wide-key geometries — while
# the fold/unfold copies it avoids are only ~1-3 ms/step.  The path is
# kept correct + tested but OPT-IN (MVIT_KT=1); the per-head kernel
# remains the default wide-key path.
# ---------------------------------------------------------------------------


def _hl_kt_geometry(C: int, H: int, d: int):
    """(hg, w, (tq_f, kc_f), (tq_b, kc_b)) for the k-tiled kernel.

    The head-group width hg is shared (the saved lse layout depends on
    it); the query-tile/key-chunk pair is per direction.  Geometries are
    an EMPIRICAL table calibrated against Mosaic's measured scoped-VMEM
    allocations on v5e at the reference wide-key shapes (kN=1568): an
    analytic stack model does not reproduce Mosaic's allocator — e.g.
    halving TQ at w=192/KC=512 shrank the reported allocation by only
    50 KB — so only measured-fitting points are encoded.  The backward
    carries fp32 [KP, w] dk/dv accumulator blocks, which is what pins
    the backward tiles this small (and MXU-starves the chunk loop; see
    BASELINE.md round 3 — this kernel measures ~50% slower than the
    per-head whole-key kernel and stays opt-in).

    Only single-group geometries (hg == H) are offered: with hgn > 1 the
    dk/dv accumulator blocks revisit along the group grid axis and Mosaic
    double-buffers them, which re-OOMs even the smallest tiles (measured:
    H=8/hg=4 exceeds the budget by 256 KB at TQ=KC=128).  H=8 wide-key
    blocks therefore fall back to the per-head kernel even under
    MVIT_KT=1 (see :func:`kt_supported`)."""
    w = H * d
    if w % 128 and w != C:
        return None
    if w <= 384:
        # (256, 128) fits in isolation at w=192 but exceeds the budget by
        # 124 KB inside the full compiled train step; TQ=KC=128 is the
        # one point with enough margin to survive surrounding fusions
        return H, w, (256, 512), (128, 128)
    return None


def kt_supported(C: int, H: int) -> bool:
    """Whether the k-tiled kernel has a calibrated geometry for this block."""
    return _hl_kt_geometry(C, H, C // H) is not None


def _kt_round(kn: int, kc: int) -> int:
    """Padded key extent: a kc-multiple so the chunk loop is uniform."""
    return _round_up(kn + 1, kc)


def _kt_expander_cat(k_shape, kp: int):
    """Transposed stacked 0/1 expander [KP, k_t + k_h + k_w]: the chunk
    loop slices SUBLANES (dynamic sublane offsets are cheap; dynamic lane
    offsets are not), and one dot computes the whole decomposed bias."""
    return np.concatenate(expanders(k_shape, kp), axis=0).T.copy()


def _kt_splice(k, kc, kp: int):
    """Append the cls row and zero padding OUTSIDE the kernel (plain XLA
    concat): row kn is the cls key/value, rows kn+1..kp are zeros.  One
    extra HBM round-trip of K/V per call, but the kernel sheds the
    in-kernel splice plus a [KP, w] VMEM scratch copy, and padding rows
    are true zeros (no 0 * garbage NaN hazards)."""
    B, kn, C = k.shape
    pad = jnp.zeros((B, kp - kn - 1, C), k.dtype)
    return jnp.concatenate([k, kc.astype(k.dtype), pad], axis=1)


def _fwd_hl_kt_kernel(q_ref, k_ref, v_ref, rc_ref, ec_ref, o_ref, lse_ref,
                      *, scale: float, qn: int, kn: int,
                      d: int, H: int, kcat: int, kc: int, nchunks: int):
    tq = q_ref.shape[1]
    lses = []
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]
        rc = rc_ref[0, 0][:, h * kcat:(h + 1) * kcat]

        def body(c, carry):
            m, l, acc = carry
            c0 = c * kc
            rows = pl.dslice(c0, kc)
            kcnk = k_ref[0, rows, sl]
            vcnk = v_ref[0, rows, sl]
            ecnk = ec_ref[rows, :]
            s = jax.lax.dot_general(
                q, kcnk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += jax.lax.dot_general(rc, ecnk, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c0
            s = jnp.where(col <= kn, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(vcnk.dtype), vcnk,
                                        preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((tq, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((tq, 1), jnp.float32)
        a0 = jnp.zeros((tq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, a0))
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
        lses.append(m + jnp.log(l))
    lse_ref[0, 0] = jnp.concatenate(lses, axis=1)


def _bwd_hl_kt_kernel(q_ref, k_ref, v_ref, rc_ref, ec_ref, o_ref, lse_ref,
                      g_ref, dq_ref, dkf_ref, dvf_ref, drc_ref,
                      *, scale: float, qn: int, kn: int,
                      d: int, H: int, kcat: int, tq: int, kc: int,
                      nchunks: int):
    qt = pl.program_id(2)
    nvalid = _valid_rows(qt, qn, tq)

    @pl.when(qt == 0)
    def _init():
        dkf_ref[0] = jnp.zeros_like(dkf_ref[0])
        dvf_ref[0] = jnp.zeros_like(dvf_ref[0])

    qf = _mask_rows(q_ref[0], nvalid)
    gf = _mask_rows(g_ref[0], nvalid)
    # ragged-tail rows of the saved output are undefined (NaN in interpret
    # mode); 0-masked g alone cannot save delta from 0 * NaN
    of = _mask_rows(o_ref[0], nvalid)
    lse_full = lse_ref[0, 0]  # [tq, H] fp32
    lane = jax.lax.broadcasted_iota(jnp.int32, lse_full.shape, 1)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = qf[:, sl]
        g = gf[:, sl].astype(jnp.float32)
        # lane-select the head's lse column ([tq, 1] at lane offset h
        # cannot be sliced+broadcast directly — reduce a masked full row)
        lse_h = jnp.sum(jnp.where(lane == h, lse_full, 0.0), axis=1,
                        keepdims=True)
        delta = jnp.sum(g * of[:, sl].astype(jnp.float32), axis=1,
                        keepdims=True)
        rc = _mask_rows(rc_ref[0, 0][:, h * kcat:(h + 1) * kcat], nvalid)

        def body(c, carry):
            dq, drc_acc = carry
            c0 = c * kc
            rows = pl.dslice(c0, kc)
            kcnk = k_ref[0, rows, sl]
            vcnk = v_ref[0, rows, sl]
            ecnk = ec_ref[rows, :]
            s = jax.lax.dot_general(
                q, kcnk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s += jax.lax.dot_general(rc, ecnk, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c0
            s = jnp.where(col <= kn, s, -1e30)
            # ragged-tail q rows carry garbage lse — mask p rows so the
            # dv/dk contractions stay NaN-free
            p = _mask_rows(jnp.exp(s - lse_h), nvalid)
            dv = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(g, vcnk.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta)  # [tq, kc]
            dq += jax.lax.dot_general(ds, kcnk.astype(jnp.float32),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dkf_ref[0, rows, sl] += dk * scale
            dvf_ref[0, rows, sl] += dv
            drc_acc += jax.lax.dot_general(ds, ecnk, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
            return dq, drc_acc

        z = lambda n: jnp.zeros((tq, n), jnp.float32)
        dq, drc_acc = jax.lax.fori_loop(0, nchunks, body, (z(d), z(kcat)))
        dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)
        drc_ref[0, 0, :, h * kcat:(h + 1) * kcat] = (
            drc_acc.astype(drc_ref.dtype))


def _lse_spec(tq: int, hg: int):
    return pl.BlockSpec((1, 1, tq, hg), lambda b, g, t: (b, g, t, 0),
                        memory_space=pltpu.VMEM)


def _kt_espec(kp: int, kk: int):
    return pl.BlockSpec((kp, kk), lambda b, g, t: (0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_hl_kt(q, k, v, kc, vc, rel, k_shape, num_heads, scale):
    B, qn, C = q.shape
    d = C // num_heads
    kn = k.shape[1]
    kcat = sum(k_shape)
    geo = _hl_kt_geometry(C, num_heads, d)
    assert geo is not None, (
        f"flash_attention_mvit_hl_kt: no calibrated geometry for C={C}, "
        f"H={num_heads} (see kt_supported); use flash_attention_mvit")
    hg, w, (tq, kcw), _ = geo
    kp = _kt_round(kn, kcw)
    ksp = _kt_splice(k, kc, kp)
    vsp = _kt_splice(v, vc, kp)
    e_cat = jnp.asarray(_kt_expander_cat(k_shape, kp))
    hgn = num_heads // hg
    greg = lambda r, kk: r.reshape(B, qn, hgn, hg * kk).transpose(0, 2, 1, 3)
    qs, ks, cs, rspec, _ = _specs_hl(qn, kp, w, k_shape, tq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_hl_kt_kernel, scale=scale, qn=qn, kn=kn, d=d,
                          H=hg, kcat=kcat, kc=kcw, nchunks=kp // kcw),
        grid=(B, hgn, (qn + tq - 1) // tq),
        in_specs=[qs, ks, ks, rspec(hg * kcat), _kt_espec(kp, kcat)],
        out_specs=[qs, _lse_spec(tq, hg)],
        out_shape=[
            jax.ShapeDtypeStruct((B, qn, C), q.dtype),
            jax.ShapeDtypeStruct((B, hgn, qn, hg), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * qn * kp * d,
            bytes_accessed=2 * B * qn * C * q.dtype.itemsize,
            transcendentals=B * num_heads * qn * kp,
        ),
        interpret=_interpret(),
    )(q, ksp, vsp, greg(rel, kcat), e_cat)
    return out, lse


def _bwd_hl_kt(q, k, v, kc, vc, rel, out, lse, k_shape, num_heads, scale, g):
    B, qn, C = q.shape
    d = C // num_heads
    kn = k.shape[1]
    kcat = sum(k_shape)
    hg, w, _, (tq, kcw) = _hl_kt_geometry(C, num_heads, d)
    kp = _kt_round(kn, kcw)
    ksp = _kt_splice(k, kc, kp)
    vsp = _kt_splice(v, vc, kp)
    e_cat = jnp.asarray(_kt_expander_cat(k_shape, kp))
    hgn = num_heads // hg
    greg = lambda r, kk: r.reshape(B, qn, hgn, hg * kk).transpose(0, 2, 1, 3)
    qs, ks, cs, rspec, _ = _specs_hl(qn, kp, w, k_shape, tq)
    kacc = pl.BlockSpec((1, kp, w), lambda b, g, t: (b, 0, g),
                        memory_space=pltpu.VMEM)
    dq, dkf, dvf, drc = pl.pallas_call(
        functools.partial(_bwd_hl_kt_kernel, scale=scale, qn=qn, kn=kn, d=d,
                          H=hg, kcat=kcat, tq=tq, kc=kcw,
                          nchunks=kp // kcw),
        grid=(B, hgn, (qn + tq - 1) // tq),
        in_specs=[qs, ks, ks, rspec(hg * kcat), _kt_espec(kp, kcat),
                  qs, _lse_spec(tq, hg), qs],
        out_specs=[qs, kacc, kacc, rspec(hg * kcat)],
        out_shape=[
            jax.ShapeDtypeStruct((B, qn, C), q.dtype),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, kp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, hgn, qn, hg * kcat), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * qn * kp * d,
            bytes_accessed=6 * B * qn * C * q.dtype.itemsize,
            transcendentals=B * num_heads * qn * kp,
        ),
        interpret=_interpret(),
    )(q, ksp, vsp, greg(rel, kcat), e_cat, out, lse, g)
    dk = dkf[:, :kn].astype(k.dtype)
    dv = dvf[:, :kn].astype(v.dtype)
    dkc = dkf[:, kn:kn + 1].astype(kc.dtype)
    dvc = dvf[:, kn:kn + 1].astype(vc.dtype)
    drel = drc.transpose(0, 2, 1, 3).reshape(
        B, qn, num_heads * kcat).astype(rel.dtype)
    return dq, dk, dv, dkc, dvc, drel


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def flash_attention_mvit_hl_kt(q, k, v, kc, vc, rel, k_shape, num_heads,
                               scale):
    """K-tiled head-last pooled attention (wide key sets): same contract as
    :func:`flash_attention_mvit_hl` for the geometries ``kt_supported``
    accepts (single head-group, w <= 384 — the reference H=8 wide-key
    blocks are NOT supported and must use :func:`flash_attention_mvit`;
    the model dispatch in models/mvit.py gates on ``kt_supported``)."""
    out, _ = _fwd_hl_kt(q, k, v, kc, vc, rel, k_shape, num_heads, scale)
    return out


def _vjp_hl_kt_fwd(q, k, v, kc, vc, rel, k_shape, num_heads, scale):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_hl_kt(q, k, v, kc, vc, rel, k_shape, num_heads, scale)
    # named so remat policies can keep it: without the saved lse the
    # backward would rebuild the forward kernel just to regenerate it
    # (models/mvit.py lists "flash_attn_lse" alongside "flash_attn_out")
    lse = checkpoint_name(lse, "flash_attn_lse")
    return out, (q, k, v, kc, vc, rel, out, lse)


def _vjp_hl_kt_bwd(k_shape, num_heads, scale, res, g):
    return _bwd_hl_kt(*res, k_shape, num_heads, scale, g)


flash_attention_mvit_hl_kt.defvjp(_vjp_hl_kt_fwd, _vjp_hl_kt_bwd)


# --- partition-aware wrappers ---------------------------------------------
# Without these a multi-device mesh treats the pallas_call as an opaque
# custom call: GSPMD all-gathers the batch-sharded operands and runs the
# attention replicated on every chip (the round-2 weakness fixed for the
# TimeSformer kernels in round 3; the MViT kernels were rewritten without
# them).  Batch (dim 0 — B for head-last, B*H for the per-head kernel)
# shards over `data`; everything else is replicated (MViT TP is not a
# supported layout — the rel-pos tables would need head-group resharding).
def _bwd_hl_t(q, k, v, kc, vc, rel, g, k_shape, num_heads, scale):
    # tensor args first (g included) so the generic wrapper can append the
    # statics at the end
    return _bwd_hl(q, k, v, kc, vc, rel, k_shape, num_heads, scale, g)


_fwd_hl_sharded = partition_aware(_fwd_hl, _wrap(
    _fwd_hl, n_tensors=6, static_argnums=(6, 7, 8),
    rule=_MVIT_FWD_RULE, need_replication=_MVIT_REPL, shard_c=False,
))
_bwd_hl_sharded = partition_aware(_bwd_hl_t, _wrap(
    _bwd_hl_t, n_tensors=7, static_argnums=(7, 8, 9),
    rule=_MVIT_BWD_RULE, need_replication=_MVIT_REPL, shard_c=False,
))


def _bwd_hl_delta_t(q, k, v, kc, vc, rel, o, g, k_shape, num_heads, scale):
    return _bwd_hl_delta(q, k, v, kc, vc, rel, o, k_shape, num_heads,
                         scale, g)


_bwd_hl_delta_sharded = partition_aware(_bwd_hl_delta_t, _wrap(
    _bwd_hl_delta_t, n_tensors=8, static_argnums=(8, 9, 10),
    rule=("b q c, b k c, b k c, b u c, b u c, b q r, b q c, b q c -> "
          "b q c, b k c, b k c, b u c, b u c, b q r"),
    need_replication=_MVIT_REPL, shard_c=False,
))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def flash_attention_mvit_hl(q, k, v, kc, vc, rel, k_shape, num_heads, scale):
    """Head-last pooled attention with decomposed rel-pos bias.

    q [B, qN, H*d]; k, v [B, kN, H*d] (body keys, row-major (t', h', w'));
    kc, vc [B, 1, H*d] cls key/value; rel [B, qN, H*(k_t + k_h + k_w)]
    bias tables packed per head along lanes, each head's window laid out
    [rt | rh | rw] — the whole decomposed bias is ONE dot per head against
    the row-stacked expander.  Returns body-query outputs [B, qN, H*d];
    the cls query row is computed outside in plain XLA.
    """
    return _fwd_hl_sharded(q, k, v, kc, vc, rel, k_shape, num_heads, scale)


def _vjp_hl_fwd(q, k, v, kc, vc, rel, k_shape, num_heads, scale):
    out = _fwd_hl_sharded(q, k, v, kc, vc, rel, k_shape, num_heads, scale)
    if _mvit_delta():
        from jax.ad_checkpoint import checkpoint_name

        # delta backward residual: the primal output, named so remat
        # policies keep it (see _vjp_fwd)
        res_out = checkpoint_name(out, "flash_attn_out")
        return out, (q, k, v, kc, vc, rel, res_out)
    return out, (q, k, v, kc, vc, rel, None)


def _vjp_hl_bwd(k_shape, num_heads, scale, res, g):
    *primals, o = res
    if o is not None:
        return _bwd_hl_delta_sharded(*primals, o, g, k_shape, num_heads,
                                     scale)
    return _bwd_hl_sharded(*primals, g, k_shape, num_heads, scale)


flash_attention_mvit_hl.defvjp(_vjp_hl_fwd, _vjp_hl_bwd)
