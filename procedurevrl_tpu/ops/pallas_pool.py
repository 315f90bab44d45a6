"""Pallas depthwise 3-D pooling for MViT's conv-mode attention pools.

Replaces ``jax.lax.conv_general_dilated`` (feature_group_count=C) in
``models/mvit.py::DepthwisePool3D`` (reference
``lib/models/slowfast_mvit/attention.py:236-276``).  Why: XLA's TPU conv
emitter assigns the depthwise conv a batch-second-minor activation
layout (``{4,0,3,2,1}`` / ``{2,0,1}``) while the surrounding attention
stream lives in the default row-major layout — so EVERY pool (3 per
block x 16 blocks) pays physical relayout copies on its full-size input
and its output.  The round-4 HLO dump of the MViT bench step shows
~3.7 GB/step of entry-level copies attributed to ``attn._pool``
reshapes alone (BASELINE.md round-4).  A Pallas kernel is opaque to
layout assignment: operands stay in the attention layout and the
relayouts disappear; the flat [B, L, C] <-> [B, T, H, W, C] reshapes
around it become free bitcasts.

Forward kernel — rolling t-window, minimal HBM traffic:

- grid ``(B, T+1)``; the input arrives one t-plane per step through
  Mosaic's auto-pipelined BlockSpec (clamped index map), so the input is
  read from HBM exactly ONCE and the output written ONCE.  No manual
  HBM DMA: real-TPU Mosaic rejects ``memref_slice`` on arrays whose
  lane dim is not 128-aligned (MViT stages 1-2 have C=96/192), a
  constraint interpret mode does not surface — blocked full-axis lanes
  are exempt.
- a persistent fp32 VMEM scratch ``[3, H+2, W+16, nc, 128]`` (channels
  pre-split into 128-lane tiles — see ``_chunks``) holds the 3-plane
  window as a shift register (two VMEM-to-VMEM plane copies per step,
  ~free next to the HBM stream).  Plane interiors land at sublane
  offset 8 (aligned vector stores); the zero halo ring is established
  at t==0 and survives interior-only stores.  Step t computes output
  plane t-1; the t=0 step only primes the window (its output block is
  fully overwritten at t=1 before any flush — the block index map is
  clamped, so no index change intervenes).
- 27 static tap slices per output plane accumulate in fp32 on the VPU
  (depthwise is channel-diagonal — the MXU cannot help).  Strided taps
  are direct strided value loads: a round-4 on-chip probe confirmed
  Mosaic lowers sublane strides 2/4/8 (and majormost strides) correctly.

Backward:

- stride 1: dx is the SAME forward kernel with flipped taps (stride-1
  correlation duality); dw is a dedicated kernel accumulating the 27
  tap-reductions into a VMEM-resident fp32 [27, C] block across the
  sequential grid.
- stride > 1: dx/dw run as XLA tap formulations (dx = fused sum of 27
  interior-dilated pads of g, one input-sized write + 27 output-sized
  reads; dw = 27 strided-slice product-reduces, output-sized reads).
  Outputs of the strided pools are 4-64x smaller than inputs, so both
  are cheap, and neither is a conv — no layout assignment fires.

``depthwise_pool3d_taps`` is the pure-XLA forward (same tap trick),
kept as an ablation path (MVIT_POOL=taps) — profitable only for the
(1,8,8) kv pools where 27 x output < input.

Partitioning: the kernel is batch- and channel-parallel (depthwise is
channel-diagonal) but has no custom_partitioning wrapper yet — under a
multi-device mesh GSPMD runs the opaque custom call replicated (correct,
not sharded).  The model default stays ``conv`` (which partitions
natively); opt in on single-chip runs via ``MVIT_POOL=kernel``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from procedurevrl_tpu.ops.pallas_attention import _interpret

WOFF = 8          # aligned sublane offset where plane interiors land
KTAPS = 27        # 3*3*3


def out_hw(d: int, s: int) -> int:
    """Output length of one padded pooled axis (pad 1, kernel 3)."""
    return (d - 1) // s + 1


def _chunks(C: int):
    """(chunk_index, lane_offset, width) covering C in 128-lane tiles.

    Mosaic's strided (sublane) loads require the base memref's last dim
    to be one lane tile — a [.., C] scratch with C > 128 fails on real
    TPU ("last dim size is not 128 in original base memref"), so the
    scratch carries an explicit [nc, 128] channel split."""
    return [(i, i * 128, min(128, C - i * 128))
            for i in range((C + 127) // 128)]


def _tap_slice(xs, dt: int, dh: int, dw: int, *, H: int, W: int, s: int,
               ci: int = None):
    """Tap load from the padded scratch plane window.

    MUST be a ref-level get: value-level strided slicing lowers to a
    gather, which Mosaic only supports in 2-D (real-TPU failure the
    round-4 on-chip probe validated ref-level ``pl.Slice`` against).
    ``ci=None`` reads the full trailing channel dim of the 4-D scratch
    (stride-1 kernels); an int ci reads one FULL 128-lane chunk of the
    5-D scratch (strided kernels) — partial-lane tap loads materialize
    per-tap stack copies and blow the scoped-VMEM limit on real TPU."""
    h2, w2 = out_hw(H, s), out_hw(W, s)
    hs = pl.Slice(dh, h2, s)
    ws = pl.Slice(WOFF - 1 + dw, w2, s)
    if ci is None:
        return xs[dt, hs, ws, :]
    return xs[dt, hs, ws, ci]


def _roll_window(x_ref, xs, t, last, *, H: int, W: int, chunked: bool):
    """Advance the 3-plane shift register: after this, xs[0..2] hold the
    (zero-padded) planes t-2, t-1, t — with out-of-range planes zero."""
    zero = jnp.zeros(xs.shape[1:], xs.dtype)

    @pl.when(t == 0)
    def _():
        # halo ring + the virtual plane "-1" (xs[1] after the t=1 shift)
        xs[1] = zero
        xs[2] = zero

    @pl.when(t > 0)
    def _():
        xs[0] = xs[1]
        xs[1] = xs[2]

    @pl.when(t < last)
    def _():
        # scratch is fp32: Mosaic's strided (sublane) loads only support
        # 32-bit data — bf16 strided taps fail on real TPU ("Strided load
        # with non 32-bit data"); the fp32 window also makes the tap
        # accumulation exact
        plane = x_ref[0, 0]
        if not chunked:
            xs[2, pl.ds(1, H), pl.ds(WOFF, W)] = plane.astype(xs.dtype)
        else:
            for ci, off, cw in _chunks(plane.shape[-1]):
                xs[2, pl.ds(1, H), pl.ds(WOFF, W), ci, pl.ds(0, cw)] = (
                    plane[:, :, off:off + cw].astype(xs.dtype))

    @pl.when(t == last)
    def _():
        xs[2] = zero          # virtual plane T for the last output


def _fwd_kernel(x_ref, w_ref, o_ref, xs, *, H: int, W: int, s: int,
                C: int):
    t = pl.program_id(1)
    last = pl.num_programs(1) - 1
    _roll_window(x_ref, xs, t, last, H=H, W=W, chunked=s > 1)

    @pl.when(t > 0)
    def _():
        h2, w2 = out_hw(H, s), out_hw(W, s)
        if s == 1:
            acc = jnp.zeros((h2, w2, C), jnp.float32)
            for dt in range(3):
                for dh in range(3):
                    for dw in range(3):
                        r = dt * 9 + dh * 3 + dw
                        sl = _tap_slice(xs, dt, dh, dw, H=H, W=W, s=1)
                        wv = w_ref[r, :].astype(jnp.float32)
                        acc = acc + sl * wv[None, None, :]
            o_ref[0, 0] = acc.astype(o_ref.dtype)
            return
        for ci, off, cw in _chunks(C):
            # full-128 tap loads against the zero-padded scratch chunk;
            # w arrives zero-padded to [27, nc*128] (host-side)
            acc = jnp.zeros((h2, w2, 128), jnp.float32)
            for dt in range(3):
                for dh in range(3):
                    for dw in range(3):
                        r = dt * 9 + dh * 3 + dw
                        sl = _tap_slice(xs, dt, dh, dw, H=H, W=W, s=s,
                                        ci=ci)
                        wv = w_ref[r, pl.Slice(ci * 128, 128)].astype(
                            jnp.float32)
                        acc = acc + sl * wv[None, None, :]
            o_ref[0, 0, :, :, pl.ds(off, cw)] = (
                acc[:, :, :cw].astype(o_ref.dtype))


def _dw_kernel(x_ref, g_ref, dw_ref, xs, *, H: int, W: int):
    """Stride-1 dw[r, c] = sum over (b, t, h, w) of x_tap_r * g —
    accumulated in the fp32 output block across the whole sequential
    grid (constant index map keeps it VMEM-resident)."""
    b, t = pl.program_id(0), pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _roll_window(x_ref, xs, t, last, H=H, W=W, chunked=False)

    @pl.when(t > 0)
    def _():
        g = g_ref[0, 0].astype(jnp.float32)
        rows = []
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    sl = _tap_slice(xs, dt, dh, dw, H=H, W=W, s=1)
                    rows.append(jnp.sum(sl * g, axis=(0, 1))[None, :])
        dw_ref[...] += jnp.concatenate(rows, axis=0)


def _scratch(H: int, W: int, C: int, s: int):
    if s == 1:
        return pltpu.VMEM((3, H + 2, W + 2 * WOFF, C), jnp.float32)
    return pltpu.VMEM((3, H + 2, W + 2 * WOFF, len(_chunks(C)), 128),
                      jnp.float32)


def _pool_call(x5: jax.Array, w27: jax.Array, s: int) -> jax.Array:
    """Depthwise 3x3x3 pool, pad 1, stride (1, s, s): [B,T,H,W,C] ->
    [B,T,H2,W2,C]."""
    B, T, H, W, C = x5.shape
    h2, w2 = out_hw(H, s), out_hw(W, s)
    if s > 1:
        wpad = len(_chunks(C)) * 128 - C
        w27 = jnp.pad(w27, ((0, 0), (0, wpad))) if wpad else w27
    kern = functools.partial(_fwd_kernel, H=H, W=W, s=s, C=C)
    return pl.pallas_call(
        kern,
        grid=(B, T + 1),
        in_specs=[
            pl.BlockSpec((1, 1, H, W, C),
                         lambda b, t: (b, jnp.minimum(t, T - 1), 0, 0, 0)),
            pl.BlockSpec((KTAPS, w27.shape[-1]), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h2, w2, C),
            lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, h2, w2, C), x5.dtype),
        scratch_shapes=[_scratch(H, W, C, s)],
        cost_estimate=pl.CostEstimate(
            flops=2 * KTAPS * B * T * h2 * w2 * C,
            bytes_accessed=(B * T * (H * W + h2 * w2) * C
                            * x5.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x5, w27)


def _dw_call(x5: jax.Array, g5: jax.Array) -> jax.Array:
    B, T, H, W, C = x5.shape
    kern = functools.partial(_dw_kernel, H=H, W=W)
    return pl.pallas_call(
        kern,
        grid=(B, T + 1),
        in_specs=[
            pl.BlockSpec((1, 1, H, W, C),
                         lambda b, t: (b, jnp.minimum(t, T - 1), 0, 0, 0)),
            pl.BlockSpec((1, 1, H, W, C),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((KTAPS, C), lambda b, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((KTAPS, C), jnp.float32),
        scratch_shapes=[_scratch(H, W, C, 1)],
        cost_estimate=pl.CostEstimate(
            flops=4 * KTAPS * B * T * H * W * C,
            bytes_accessed=2 * B * T * H * W * C * x5.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x5, g5)


# ---------------------------------------------------------------------------
# XLA tap formulations (strided backward + ablation forward)
# ---------------------------------------------------------------------------


def _tap_ranges(dims, strides, out_dims, taps):
    """Static slice bounds for one tap: per axis (start, count, lo_pad,
    hi_pad) over the VALID output positions, or None if none are."""
    out = []
    for d, s, o, k in zip(dims, strides, out_dims, taps):
        # input index feeding output j is s*j + k - 1
        lo = max(0, (1 - k + s - 1) // s)      # ceil((1-k)/s)
        hi = min(o - 1, (d - k) // s)
        if hi < lo:
            return None
        out.append((s * lo + k - 1, hi - lo + 1, lo, o - 1 - hi))
    return out


def depthwise_pool3d_taps(x5: jax.Array, w27: jax.Array,
                          stride: Tuple[int, int, int]) -> jax.Array:
    """Strided depthwise 3x3x3 pool (pad 1) as 27 shifted strided slices.

    No padded input copy is materialized: each tap slices its valid
    region and zero-pads its OUTPUT-sized contribution, so HBM traffic
    is ~27 x output + one fused input read, in the stream layout —
    nothing here is a conv, so XLA's conv layout assignment never
    fires.  x5: [B,T,H,W,C]; w27: [27, C]."""
    B, T, H, W, C = x5.shape
    dims, strides = (T, H, W), tuple(stride)
    out_dims = tuple(out_hw(d, s) for d, s in zip(dims, strides))
    acc = jnp.zeros((B,) + out_dims + (C,), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                rng = _tap_ranges(dims, strides, out_dims, (dt, dh, dw))
                if rng is None:
                    continue
                (t0, tn, tl, th), (h0, hn, hl, hh), (w0, wn, wl, wh) = rng
                sl = jax.lax.slice(
                    x5,
                    (0, t0, h0, w0, 0),
                    (B, t0 + (tn - 1) * strides[0] + 1,
                     h0 + (hn - 1) * strides[1] + 1,
                     w0 + (wn - 1) * strides[2] + 1, C),
                    (1,) + strides + (1,),
                ).astype(jnp.float32) * w27[dt * 9 + dh * 3 + dw].astype(
                    jnp.float32)
                acc += jax.lax.pad(
                    sl, jnp.float32(0),
                    ((0, 0, 0), (tl, th, 0), (hl, hh, 0), (wl, wh, 0),
                     (0, 0, 0)))
    return acc.astype(x5.dtype)


def _taps_dx(g5: jax.Array, w27: jax.Array, stride, in_dims) -> jax.Array:
    """Transposed strided pool: dx = sum over taps of the interior-dilated
    zero-pad of g * w.  XLA fuses the 27 pads + adds into one
    input-sized write with output-sized reads of g."""
    B = g5.shape[0]
    C = g5.shape[-1]
    dims = tuple(in_dims)
    strides = tuple(stride)
    out_dims = g5.shape[1:4]
    dx = jnp.zeros((B,) + dims + (C,), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                rng = _tap_ranges(dims, strides, out_dims, (dt, dh, dw))
                if rng is None:
                    continue
                pads, g_sl_lo, g_sl_n = [], [], []
                for (start, n, lo, hi), d, s in zip(rng, dims, strides):
                    pads.append((start, d - start - (n - 1) * s - 1, s - 1))
                    g_sl_lo.append(lo)
                    g_sl_n.append(n)
                gv = jax.lax.slice(
                    g5,
                    (0, g_sl_lo[0], g_sl_lo[1], g_sl_lo[2], 0),
                    (B, g_sl_lo[0] + g_sl_n[0], g_sl_lo[1] + g_sl_n[1],
                     g_sl_lo[2] + g_sl_n[2], C),
                ).astype(jnp.float32) * w27[dt * 9 + dh * 3 + dw].astype(
                    jnp.float32)
                dx += jax.lax.pad(
                    gv, jnp.float32(0),
                    ((0, 0, 0),) + tuple(pads) + ((0, 0, 0),))
    return dx.astype(g5.dtype)


def _taps_dw(x5: jax.Array, g5: jax.Array, stride) -> jax.Array:
    """dw[r, c] for the strided pools: 27 strided-slice product-reduces
    (output-sized reads)."""
    B, T, H, W, C = x5.shape
    dims, strides = (T, H, W), tuple(stride)
    out_dims = g5.shape[1:4]
    rows = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                rng = _tap_ranges(dims, strides, out_dims, (dt, dh, dw))
                if rng is None:
                    rows.append(jnp.zeros((C,), jnp.float32))
                    continue
                (t0, tn, tl, _), (h0, hn, hl, _), (w0, wn, wl, _) = rng
                sl = jax.lax.slice(
                    x5,
                    (0, t0, h0, w0, 0),
                    (B, t0 + (tn - 1) * strides[0] + 1,
                     h0 + (hn - 1) * strides[1] + 1,
                     w0 + (wn - 1) * strides[2] + 1, C),
                    (1,) + strides + (1,),
                ).astype(jnp.float32)
                gv = jax.lax.slice(
                    g5, (0, tl, hl, wl, 0),
                    (B, tl + tn, hl + hn, wl + wn, C)).astype(jnp.float32)
                rows.append(jnp.sum(sl * gv, axis=(0, 1, 2, 3)))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# public custom-vjp entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_pool3d(x5: jax.Array, w27: jax.Array, s: int,
                     use_kernel: bool = True) -> jax.Array:
    """Depthwise 3x3x3 / pad 1 / stride (1, s, s) pool on [B,T,H,W,C].

    ``w27`` is the [27, C] row-flattened (dt, dh, dw) tap table (the
    head-tiled full-channel weights, input dtype).  ``use_kernel=False``
    selects the pure-XLA tap forward (ablation)."""
    if use_kernel:
        return _pool_call(x5, w27, s)
    return depthwise_pool3d_taps(x5, w27, (1, s, s))


def _dp_fwd(x5, w27, s, use_kernel):
    return depthwise_pool3d(x5, w27, s, use_kernel), (x5, w27)


def _dp_bwd(s, use_kernel, res, g5):
    x5, w27 = res
    if s == 1 and use_kernel:
        dx = _pool_call(g5.astype(x5.dtype), w27[::-1, :], 1)
        dw = _dw_call(x5, g5.astype(x5.dtype))
    else:
        dx = _taps_dx(g5, w27, (1, s, s), x5.shape[1:4])
        dw = _taps_dw(x5, g5, (1, s, s))
    return dx.astype(x5.dtype), dw.astype(w27.dtype)


depthwise_pool3d.defvjp(_dp_fwd, _dp_bwd)


def supported(kernel, stride) -> bool:
    """Whether this pool geometry is covered by the Pallas/tap paths."""
    return (tuple(kernel) == (3, 3, 3) and len(stride) == 3
            and stride[0] == 1 and stride[1] == stride[2]
            and stride[1] in (1, 2, 4, 8))


def max_pool3d_taps(x5: jax.Array, kernel, stride) -> jax.Array:
    """Max pool (torch padding = k//2) as a tap-tree of strided slices.

    Replaces ``lax.reduce_window(max)`` for the MViT attention-pool skip
    path (kernel (1,3,3), stride (1,2,2) at stage transitions): the
    reduce_window BACKWARD is a ``select-and-scatter`` op XLA assigns a
    batch-second-minor layout (~2.4 ms/step + ~2 ms of relayout copies
    on the bench step, round-4 profile).  A ``jnp.maximum`` tap tree is
    layout-neutral and its VJP is k_t*k_h*k_w fused select+pads.

    Tie semantics differ from reduce_window's scatter (gradient goes to
    the first tap in (dt,dh,dw) order rather than window scan order) —
    identical on continuous inputs, torch-oracle-tested on random data.
    """
    B, T, H, W, C = x5.shape
    dims, strides = (T, H, W), tuple(stride)
    out_dims = tuple(out_hw(d, s) if k == 3 else (d - 1) // s + 1
                     for d, s, k in zip(dims, strides, kernel))
    neg = (jnp.finfo(x5.dtype).min if jnp.issubdtype(x5.dtype, jnp.floating)
           else jnp.iinfo(x5.dtype).min)
    acc = None
    for dt in range(kernel[0]):
        for dh in range(kernel[1]):
            for dw in range(kernel[2]):
                # center taps so pad = k//2 (k in {1, 3} per axis)
                taps = (dt + (3 - kernel[0]) // 2,
                        dh + (3 - kernel[1]) // 2,
                        dw + (3 - kernel[2]) // 2)
                rng = _tap_ranges(dims, strides, out_dims, taps)
                if rng is None:
                    continue
                (t0, tn, tl, th), (h0, hn, hl, hh), (w0, wn, wl, wh) = rng
                sl = jax.lax.slice(
                    x5,
                    (0, t0, h0, w0, 0),
                    (B, t0 + (tn - 1) * strides[0] + 1,
                     h0 + (hn - 1) * strides[1] + 1,
                     w0 + (wn - 1) * strides[2] + 1, C),
                    (1,) + strides + (1,),
                )
                sl = jax.lax.pad(
                    sl, jnp.asarray(neg, x5.dtype),
                    ((0, 0, 0), (tl, th, 0), (hl, hh, 0), (wl, wh, 0),
                     (0, 0, 0)))
                acc = sl if acc is None else jnp.maximum(acc, sl)
    return acc


def max_pool_supported(kernel, stride) -> bool:
    """Tap-tree coverage: per-axis kernel in {1, 3} with pad k//2 and any
    positive stride (the skip pools use (1,3,3)/(1,2,2) and (3,3,3))."""
    return (len(kernel) == 3 and len(stride) == 3
            and all(k in (1, 3) for k in kernel)
            and all(s >= 1 for s in stride))
