"""MViT-v1/v2 video encoder, TPU-first.

Re-design of the reference encoder (reference
``lib/models/slowfast_mvit/mvit.py:30-406``, ``attention.py:14-568``,
``stem_helper.py:290-321``) with the same math in idiomatic JAX:

- channels-last everywhere: the 3-D stem and the depthwise pooling convs run
  as ``lax.conv_general_dilated`` in NDHWC, the layout XLA:TPU prefers
  (no NCTHW permutes in the hot path);
- all token-grid shapes (thw per block) are static Python ints computed at
  trace time, so every block compiles to fixed-shape MXU matmuls;
- decomposed relative position tables are gathered with *static* numpy
  index matrices (no dynamic gathers);
- the attention-pool skip path uses ``lax.reduce_window`` max pooling.

Geometry/semantics pinned 1:1: Q/K/V pooled with shared-per-head depthwise
conv + LayerNorm (mode='conv'), residual Q pooling, dim_mul_in_att
projection placement, CLS token excluded from pooling and re-attached.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.models.layers import DropPath, LayerNormFp32, Mlp
from procedurevrl_tpu.ops import pallas_pool
from procedurevrl_tpu.ops.common import trunc_normal_init


def round_width(width, multiplier, min_width=1, divisor=1) -> int:
    """reference ``lib/models/slowfast_mvit/utils.py:7-19``."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


@dataclass(frozen=True, eq=True)
class MViTConfig:
    """Static architecture description resolved from the config tree
    (mirrors the derivations in reference ``mvit.py:41-246``).

    Frozen/hashable (sequence fields are tuples) so it can be a flax module
    attribute and a static jit argument."""

    spatial_size: int = 224
    temporal_size: int = 16
    in_chans: int = 3
    embed_dim: int = 96
    num_heads: int = 1
    depth: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    mode: str = "conv"
    cls_embed_on: bool = True
    use_mean_pooling: bool = False
    use_abs_pos: bool = False
    sep_pos_embed: bool = False
    use_fixed_sincos_pos: bool = False
    rel_pos_spatial: bool = True
    rel_pos_temporal: bool = True
    residual_pooling: bool = True
    dim_mul_in_att: bool = True
    separate_qkv: bool = False
    patch_kernel: Tuple[int, int, int] = (3, 7, 7)
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    patch_padding: Tuple[int, int, int] = (1, 3, 3)
    dim_mul: Tuple = ()      # ((block, mult), ...)
    head_mul: Tuple = ()
    pool_q_stride: Tuple = ()   # ((block, st, sh, sw), ...)
    pool_kv_stride: Tuple = ()
    pool_kv_stride_adaptive: Optional[Tuple] = None
    pool_kvq_kernel: Optional[Tuple] = None
    norm_stem: bool = False

    @classmethod
    def from_cfg(cls, cfg) -> "MViTConfig":
        m = cfg.MVIT
        return cls(
            spatial_size=cfg.DATA.TRAIN_CROP_SIZE,
            temporal_size=cfg.DATA.NUM_FRAMES,
            in_chans=cfg.DATA.INPUT_CHANNEL_NUM[0],
            embed_dim=m.EMBED_DIM,
            num_heads=m.NUM_HEADS,
            depth=m.DEPTH,
            mlp_ratio=m.MLP_RATIO,
            qkv_bias=m.QKV_BIAS,
            drop_path_rate=m.DROPPATH_RATE,
            mode=m.MODE,
            cls_embed_on=m.CLS_EMBED_ON,
            use_mean_pooling=m.USE_MEAN_POOLING,
            use_abs_pos=m.USE_ABS_POS,
            sep_pos_embed=m.SEP_POS_EMBED,
            use_fixed_sincos_pos=m.USE_FIXED_SINCOS_POS,
            rel_pos_spatial=m.REL_POS_SPATIAL,
            rel_pos_temporal=m.REL_POS_TEMPORAL,
            residual_pooling=m.RESIDUAL_POOLING,
            dim_mul_in_att=m.DIM_MUL_IN_ATT,
            separate_qkv=m.SEPARATE_QKV,
            patch_kernel=tuple(m.PATCH_KERNEL),
            patch_stride=tuple(m.PATCH_STRIDE),
            patch_padding=tuple(m.PATCH_PADDING),
            dim_mul=tuple(tuple(e) for e in m.DIM_MUL),
            head_mul=tuple(tuple(e) for e in m.HEAD_MUL),
            pool_q_stride=tuple(tuple(e) for e in m.POOL_Q_STRIDE),
            pool_kv_stride=tuple(tuple(e) for e in m.POOL_KV_STRIDE),
            pool_kv_stride_adaptive=None if m.POOL_KV_STRIDE_ADAPTIVE is None else tuple(m.POOL_KV_STRIDE_ADAPTIVE),
            pool_kvq_kernel=None if m.POOL_KVQ_KERNEL is None else tuple(m.POOL_KVQ_KERNEL),
            norm_stem=m.NORM_STEM,
        )

    def block_schedule(self):
        """Per-block (dim, dim_out, heads, pool kernels/strides, input thw)
        — the static plan the reference derives in ``mvit.py:141-246``."""
        depth = self.depth
        dim_mul = np.ones(depth + 1)
        head_mul = np.ones(depth + 1)
        for blk, mult in self.dim_mul:
            dim_mul[blk] = mult
        for blk, mult in self.head_mul:
            head_mul[blk] = mult

        pool_q = [[] for _ in range(depth)]
        pool_kv = [[] for _ in range(depth)]
        stride_q = [[] for _ in range(depth)]
        stride_kv = [[] for _ in range(depth)]
        for entry in self.pool_q_stride:
            i = entry[0]
            stride_q[i] = list(entry[1:])
            pool_q[i] = (
                list(self.pool_kvq_kernel)
                if self.pool_kvq_kernel is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )
        kv_entries = list(self.pool_kv_stride)
        if self.pool_kv_stride_adaptive is not None:
            _stride_kv = list(self.pool_kv_stride_adaptive)
            kv_entries = []
            for i in range(depth):
                if len(stride_q[i]) > 0:
                    _stride_kv = [
                        max(_stride_kv[d] // stride_q[i][d], 1)
                        for d in range(len(_stride_kv))
                    ]
                kv_entries.append([i] + _stride_kv)
        for entry in kv_entries:
            i = entry[0]
            stride_kv[i] = list(entry[1:])
            pool_kv[i] = (
                list(self.pool_kvq_kernel)
                if self.pool_kvq_kernel is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )

        patch_dims = [
            self.temporal_size // self.patch_stride[0],
            self.spatial_size // self.patch_stride[1],
            self.spatial_size // self.patch_stride[2],
        ]
        input_size = list(patch_dims)
        plan = []
        embed_dim = self.embed_dim
        num_heads = self.num_heads
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            if self.dim_mul_in_att:
                dim_out = round_width(
                    embed_dim, dim_mul[i],
                    divisor=round_width(num_heads, head_mul[i]),
                )
            else:
                dim_out = round_width(
                    embed_dim, dim_mul[i + 1],
                    divisor=round_width(num_heads, head_mul[i + 1]),
                )
            plan.append(dict(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                kernel_q=tuple(pool_q[i]), kernel_kv=tuple(pool_kv[i]),
                stride_q=tuple(stride_q[i]), stride_kv=tuple(stride_kv[i]),
                input_size=tuple(input_size),
            ))
            if len(stride_q[i]) > 0:
                input_size = [s // st for s, st in zip(input_size, stride_q[i])]
            embed_dim = dim_out
        return plan, patch_dims, embed_dim


# ---------------------------------------------------------------------------
# pooling ops
# ---------------------------------------------------------------------------


def _max_pool_3d(x: jax.Array, kernel, stride, padding) -> jax.Array:
    """torch MaxPool3d(ceil_mode=False) on [B, T, H, W, C].

    MVIT_MAXPOOL=taps routes supported geometries through the
    layout-neutral tap tree (ops/pallas_pool.max_pool3d_taps): the
    reduce_window backward is a select-and-scatter XLA assigns a
    batch-second-minor layout, costing relayout copies on the full-size
    operand at every stage transition (BASELINE.md round-4 profile).

    Single-device only: the tap ops carry no custom_partitioning, so under
    a mesh GSPMD would run them replicated (all-gathering the full
    activation).  Caveat: the tap tree's tie-break sends the gradient to
    the first tap in (dt,dh,dw) order, not reduce_window's scan order — on
    bf16 activations (8-bit mantissa) exact in-window ties are plausible,
    so taps-mode training grads can deviate beyond rounding."""
    if (os.environ.get("MVIT_MAXPOOL", "xla") == "taps"
            and jax.device_count() == 1
            and pallas_pool.max_pool_supported(kernel, stride)
            and list(padding) == [k // 2 for k in kernel]):
        return pallas_pool.max_pool3d_taps(x, tuple(kernel), tuple(stride))
    window = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, window, strides, pads,
    )


def _avg_pool_3d(x: jax.Array, kernel, stride, padding) -> jax.Array:
    """torch AvgPool3d(count_include_pad=True) on [B, T, H, W, C]."""
    window = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    return summed / float(np.prod(kernel))


class DepthwisePool3D(nn.Module):
    """The 'conv' pooling mode: depthwise 3-D conv over head channels,
    shared across heads (reference ``attention.py:236-276``).

    With ``heads > 1`` the conv runs on the full head-LAST channel axis
    (``C = heads * head_dim``) by tiling the per-head weights at apply
    time: the parameter keeps the reference ``[k, 1, head_dim]`` shape
    (checkpoint-compatible), the tile replays the reference's
    weight-sharing across heads, and the tile's VJP sums the per-head
    gradients exactly as applying one conv per head would.  This keeps
    pooling on ``[B, T, H, W, C]`` (batch B, 75%+ lane utilization)
    instead of ``[B*heads, T, H, W, head_dim]`` micro-convs."""

    head_dim: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    dtype: jnp.dtype = jnp.float32
    heads: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [G, T, H, W, heads*hd] -> pooled [G, T', H', W', heads*hd]."""
        w = self.param(
            "kernel", trunc_normal_init(0.02),
            tuple(self.kernel) + (1, self.head_dim), jnp.float32,
        )
        w = w.astype(self.dtype)
        if self.heads > 1:
            w = jnp.tile(w, (1, 1, 1, 1, self.heads))
        # MVIT_POOL=kernel|taps: layout-opaque Pallas / pure-tap pool
        # (ops/pallas_pool.py) instead of lax.conv — XLA's TPU conv
        # emitter assigns the depthwise conv a batch-second-minor
        # activation layout foreign to the attention stream, paying
        # full-size relayout copies on every pool (3 per block).
        # MEASURED NEGATIVE at kernel level (BASELINE.md round 4): the
        # conv emitter's stencil register-reuse beats the tap-load loop
        # ~2x even counting the copies it forces; the knob only routes
        # the stride-1 pools (the strided kernel backward is far worse)
        # and stays opt-in as the documented negative.  Single-device
        # only: no custom_partitioning on the pool op, so under a mesh
        # GSPMD would run it replicated (full-activation all-gather).
        mode = os.environ.get("MVIT_POOL", "conv")
        if (mode in ("kernel", "taps") and int(self.stride[1]) == 1
                and jax.device_count() == 1
                and pallas_pool.supported(self.kernel, self.stride)):
            w27 = w.reshape(27, w.shape[-1])   # row-flattened (dt,dh,dw)
            return pallas_pool.depthwise_pool3d(
                x.astype(self.dtype), w27, int(self.stride[1]),
                mode == "kernel")
        pads = tuple((k // 2, k // 2) for k in self.kernel)
        # no preferred_element_type: a fp32-widened output makes the conv
        # VJP a mixed-dtype conv (fp32 cotangent x bf16 kernel), which
        # lax.conv rejects; TPU convs accumulate fp32 internally anyway
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w,
            window_strides=tuple(self.stride),
            padding=pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=self.head_dim * self.heads,
        )


class _GroupedLN(nn.Module):
    """Per-head LayerNorm with the reference's shared ``[head_dim]``
    parameters, applied on the head-LAST ``[.., heads*d]`` layout without
    reshape relayouts (ops/common.grouped_layer_norm_fp32)."""

    head_dim: int
    heads: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from procedurevrl_tpu.ops.common import grouped_layer_norm_fp32, layer_norm_fp32

        scale = self.param("scale", nn.initializers.ones, (self.head_dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.head_dim,),
                          jnp.float32)
        if self.heads == 1:
            return layer_norm_fp32(x, scale, bias, self.eps)
        return grouped_layer_norm_fp32(x, scale, bias, self.heads, self.eps)


def _pooled_thw(thw, kernel, stride) -> Tuple[int, int, int]:
    """Output grid of a padded pool (pad = k//2, ceil_mode=False)."""
    return tuple(
        (d + 2 * (k // 2) - k) // s + 1
        for d, k, s in zip(thw, kernel, stride)
    )


# ---------------------------------------------------------------------------
# relative position biases (static index tables)
# ---------------------------------------------------------------------------


def _rel_dist_table(q_size: int, k_size: int) -> np.ndarray:
    """Static relative-distance index matrix (reference ``attention.py:76-91``)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (
        np.arange(q_size)[:, None] * q_ratio
        - np.arange(k_size)[None, :] * k_ratio
    )
    dist += (k_size - 1) * k_ratio
    return dist.astype(np.int64)


def _interp_rel_pos(rel_pos: jax.Array, d: int) -> jax.Array:
    """Linear interpolation of the rel-pos table to length d (reference
    ``attention.py:51-66``, torch F.interpolate(mode='linear'))."""
    ori = rel_pos.shape[0]
    if ori == d:
        return rel_pos
    # align_corners=False linear resize
    pos = (jnp.arange(d) + 0.5) * ori / d - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, ori - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, ori - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)[:, None]
    return rel_pos[lo] * (1 - frac) + rel_pos[hi] * frac


def add_rel_pos_spatial(attn, q, has_cls: bool, q_shape, k_shape,
                        rel_pos_h, rel_pos_w):
    """Decomposed spatial rel-pos (reference ``attention.py:67-117``).

    attn: [B, H, qN, kN]; q: [B, H, qN, d]; shapes are static tuples.
    """
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dh = int(2 * max(q_h, k_h) - 1)
    dw = int(2 * max(q_w, k_w) - 1)
    Rh = _interp_rel_pos(rel_pos_h, dh)[jnp.asarray(_rel_dist_table(q_h, k_h))]
    Rw = _interp_rel_pos(rel_pos_w, dw)[jnp.asarray(_rel_dist_table(q_w, k_w))]

    B, H = q.shape[0], q.shape[1]
    d = q.shape[-1]
    r_q = q[:, :, sp:].reshape(B, H, q_t, q_h, q_w, d)
    rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw.astype(q.dtype),
                       preferred_element_type=jnp.float32)

    body = attn[:, :, sp:, sp:].reshape(B, H, q_t, q_h, q_w, k_t, k_h, k_w)
    body = (
        body
        + rel_h[:, :, :, :, :, None, :, None]
        + rel_w[:, :, :, :, :, None, None, :]
    ).reshape(B, H, q_t * q_h * q_w, k_t * k_h * k_w)
    if sp:
        attn = jnp.concatenate([
            attn[:, :, :1, :],
            jnp.concatenate([attn[:, :, 1:, :1], body], axis=3),
        ], axis=2)
    else:
        attn = body
    return attn


def _rel_cat_v2(qb, q_shape, k_shape, H: int, d: int,
                rel_pos_t, rel_pos_h, rel_pos_w, mode: str):
    """Decomposed rel-pos bias via ONE copy-free GEMM + static selection
    (opt-in ``MVIT_RELV2=einsum|gather``).

    The default path's three per-axis einsums (``bthwyc,hkc->bthwyk`` etc,
    reference ``attention.py:93-110``) are position-BATCHED dots: XLA
    materializes their lhs batch-leading ([h,b,t,w,y,d] copies of q) — the
    largest family in the round-5 HLO copy census (~4.9 GB/step).  This
    path uses the identity ``rel_axis[.., p, .., k] = (q · Rtab_full^T)
    [.., p, .., dist(p, k)]``: contract q once against the row-STACKED
    full distance tables (a plain 2-D GEMM on the kernel-feed layout — no
    batching, no relayout), then select the per-(position, key) entry with
    a static map:

    - ``einsum``: per-axis 0/1 selector ``[q_axis, R_axis, k_axis]``
      (position-batched again, but over the narrow R axis in the compute
      dtype instead of d-wide q);
    - ``gather``: ``take_along_axis`` with one precomputed ``[qn, kcat]``
      index map, producing the packed kernel operand directly.

    Returns the 6-D ``[B, q_t, q_h, q_w, H, kcat]`` bias in qb's dtype,
    numerically equal to the default path up to fp32 dot-accumulation
    order (same fp32 contraction over c, same cast point; the selection
    itself is exact).
    """
    B = qb.shape[0]
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    axes = [(q_t, k_t, rel_pos_t), (q_h, k_h, rel_pos_h),
            (q_w, k_w, rel_pos_w)]
    tabs, dists, rlens = [], [], []
    for qa, ka, rp in axes:
        rlen = int(2 * max(qa, ka) - 1)
        tabs.append(_interp_rel_pos(rp, rlen))
        dists.append(_rel_dist_table(qa, ka))
        rlens.append(rlen)
    rsum = sum(rlens)
    rcat = jnp.concatenate(tabs, axis=0)            # [Rsum, d]
    # [B, qn, H, d] x [d, Rsum] — lhs is a free row-major view of the
    # [B, L, H*d] attention stream; fp32 accumulation like the default
    u = jax.lax.dot_general(
        qb.reshape(B, q_t * q_h * q_w, H, d), rcat.astype(qb.dtype),
        (((3,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(qb.dtype)                              # [B, qn, H, Rsum]
    kcat = k_t + k_h + k_w
    if mode == "gather":
        idx = np.zeros((q_t * q_h * q_w, kcat), np.int32)
        pos = np.stack(np.meshgrid(np.arange(q_t), np.arange(q_h),
                                   np.arange(q_w), indexing="ij"),
                       axis=-1).reshape(-1, 3)      # [qn, 3]
        off_r, off_k = 0, 0
        for ax, (qa, ka, _) in enumerate(axes):
            idx[:, off_k:off_k + ka] = off_r + dists[ax][pos[:, ax]]
            off_r += rlens[ax]
            off_k += ka
        out = jnp.take_along_axis(
            u, jnp.asarray(idx)[None, :, None, :], axis=-1)
        return out.reshape(B, q_t, q_h, q_w, H, kcat)
    # mode == "einsum": 0/1 selector per axis, contraction over R_axis
    u6 = u.reshape(B, q_t, q_h, q_w, H, rsum)
    parts, specs, off_r = [], "thw", 0
    for ax, (qa, ka, _) in enumerate(axes):
        sel = np.zeros((qa, rlens[ax], ka), np.float32)
        qi = np.arange(qa)[:, None]
        ki = np.arange(ka)[None, :]
        sel[qi, dists[ax], ki] = 1.0
        a = specs[ax]
        part = jnp.einsum(
            f"bthwyr,{a}rk->bthwyk",
            u6[..., off_r:off_r + rlens[ax]],
            jnp.asarray(sel).astype(qb.dtype),
            preferred_element_type=jnp.float32)
        parts.append(part.astype(qb.dtype))
        off_r += rlens[ax]
    return jnp.concatenate(parts, axis=-1)


def add_rel_pos_temporal(attn, q, has_cls: bool, q_shape, k_shape, rel_pos_t):
    """Temporal rel-pos (reference ``attention.py:120-159``)."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    dt = int(2 * max(q_t, k_t) - 1)
    Rt = _interp_rel_pos(rel_pos_t, dt)[jnp.asarray(_rel_dist_table(q_t, k_t))]

    B, H = q.shape[0], q.shape[1]
    d = q.shape[-1]
    r_q = q[:, :, sp:].reshape(B, H, q_t, q_h, q_w, d)
    rel = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt.astype(q.dtype),
                     preferred_element_type=jnp.float32)  # k over k_t

    body = attn[:, :, sp:, sp:].reshape(B, H, q_t, q_h, q_w, k_t, k_h, k_w)
    body = (body + rel[:, :, :, :, :, :, None, None]).reshape(
        B, H, q_t * q_h * q_w, k_t * k_h * k_w
    )
    if sp:
        attn = jnp.concatenate([
            attn[:, :, :1, :],
            jnp.concatenate([attn[:, :, 1:, :1], body], axis=3),
        ], axis=2)
    else:
        attn = body
    return attn


# ---------------------------------------------------------------------------
# attention / block
# ---------------------------------------------------------------------------


class MultiScaleAttention(nn.Module):
    """Pooled multi-scale attention (reference ``attention.py:162-442``;
    the shipped configs use mode='conv', pool_first=False, fused qkv)."""

    dim: int
    dim_out: int
    input_size: Tuple[int, int, int]
    num_heads: int = 8
    qkv_bias: bool = False
    kernel_q: Tuple = ()
    kernel_kv: Tuple = ()
    stride_q: Tuple = ()
    stride_kv: Tuple = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def _pool(self, name: str, x, thw, kernel, stride, with_norm=True):
        """attention_pool (reference ``attention.py:14-48``) in head-LAST
        layout: x [B, L, heads*d]; returns pooled x + new static thw.

        The depthwise conv runs once on the full channel axis with
        head-tiled weights (see ``DepthwisePool3D``); the per-head
        LayerNorm keeps its reference ``[head_dim]`` parameters by
        normalizing a free [..., heads, d] reshape view."""
        if not kernel or (np.prod(kernel) == 1 and np.prod(stride) == 1):
            return x, thw
        B, L, C = x.shape
        heads = self.num_heads
        d = C // heads
        cls_tok = None
        if self.has_cls_embed:
            cls_tok, x = x[:, :1, :], x[:, 1:, :]
        T, Hh, W = thw
        grid = x.reshape(B, T, Hh, W, C)
        if self.mode == "conv":
            grid = DepthwisePool3D(d, kernel, stride, self.dtype,
                                   heads=heads, name=f"pool_{name}")(grid)
        elif self.mode == "max":
            grid = _max_pool_3d(grid, kernel, stride, [k // 2 for k in kernel])
        else:
            grid = _avg_pool_3d(grid, kernel, stride, [k // 2 for k in kernel])
        new_thw = _pooled_thw(thw, kernel, stride)
        x = grid.reshape(B, int(np.prod(new_thw)), C)
        if cls_tok is not None:
            x = jnp.concatenate([cls_tok, x], axis=1)
        if self.mode == "conv" and with_norm:
            # per-head LN in the native head-last layout (a [.., H, d]
            # reshape view forces lane relayouts; ops/common grouped LN
            # computes the per-head stats with structured MXU dots)
            from procedurevrl_tpu.ops.common import grouped_layer_norm_fp32

            norm = _GroupedLN(d, heads, name=f"norm_{name}")
            x = norm(x)
        return x, new_thw

    def _fused_attention(self, q, k, v, q_shape, k_shape,
                         rel_pos_h, rel_pos_w, rel_pos_t, scale):
        """Flash pooled attention, head-LAST (see
        ``ops/pallas_mvit_attention.flash_attention_mvit_hl``): the
        [B, H, qN, kN] logits never hit HBM; rel-pos bias is decomposed
        into three small per-head tables computed here, CONCATENATED into
        one [.., qN, H*(k_t+k_h+k_w)] operand, and expanded in-tile with a
        single dot.  The single cls query row stays in plain XLA."""
        from procedurevrl_tpu.ops.pallas_mvit_attention import (
            flash_attention_mvit_hl,
        )

        B, _, C = q.shape
        H = self.num_heads
        d = C // H
        q_t, q_h, q_w = q_shape
        k_t, k_h, k_w = k_shape
        qc, qb = q[:, :1], q[:, 1:]
        kc, kb = k[:, :1], k[:, 1:]
        vc, vb = v[:, :1], v[:, 1:]
        qn = q_t * q_h * q_w
        import os

        relv2 = os.environ.get("MVIT_RELV2", "0")
        if relv2 not in ("", "0"):
            rel_cat = _rel_cat_v2(
                qb, (q_t, q_h, q_w), (k_t, k_h, k_w), H, d,
                rel_pos_t, rel_pos_h, rel_pos_w, mode=relv2)
        else:
            rel_cat = None
        if rel_cat is None:
            Rh = _interp_rel_pos(rel_pos_h, int(2 * max(q_h, k_h) - 1))[
                jnp.asarray(_rel_dist_table(q_h, k_h))]
            Rw = _interp_rel_pos(rel_pos_w, int(2 * max(q_w, k_w) - 1))[
                jnp.asarray(_rel_dist_table(q_w, k_w))]
            Rt = _interp_rel_pos(rel_pos_t, int(2 * max(q_t, k_t) - 1))[
                jnp.asarray(_rel_dist_table(q_t, k_t))]
            r_q = qb.reshape(B, q_t, q_h, q_w, H, d)
            rel_h = jnp.einsum(
                "bthwyc,hkc->bthwyk", r_q, Rh.astype(q.dtype),
                preferred_element_type=jnp.float32)
            rel_w = jnp.einsum(
                "bthwyc,wkc->bthwyk", r_q, Rw.astype(q.dtype),
                preferred_element_type=jnp.float32)
            rel_t = jnp.einsum(
                "bthwyc,tkc->bthwyk", r_q, Rt.astype(q.dtype),
                preferred_element_type=jnp.float32)

        from jax.ad_checkpoint import checkpoint_name

        from procedurevrl_tpu.ops.pallas_mvit_attention import (
            hl_supported, kt_supported as _kt_supported,
        )

        # CONCATENATED per-head bias table [.., H, k_t+k_h+k_w]: the
        # kernels expand it with ONE dot against the row-stacked expander
        # (three per-axis dots each cost a full contraction-starved MXU
        # pass); XLA fuses this concat into the einsum producers, and its
        # VJP performs the split on the way back.  Passed in the compute
        # dtype — the kernels run the bias dot with input-dtype operands
        # (fp32 tests stay exact; bf16 halves the rel DMA traffic).
        kcat = k_t + k_h + k_w
        if rel_cat is None:
            rel_cat = jnp.concatenate(
                [rel_t, rel_h, rel_w], axis=-1).astype(q.dtype)
        from procedurevrl_tpu.utils.env import env_flag

        if env_flag("MVIT_SAVE_REL", False):
            # keep the concatenated bias as a remat residual: the three
            # producer einsums are h/w/t-BATCHED dots whose lhs XLA
            # materializes batch-leading ([h,b,t,w,y,d] copies of q, the
            # largest single family in the round-5 HLO copy census at
            # ~4.9 GB/step incl. the remat recompute) — storing the
            # [B, qn, H*kcat] bf16 table (~8 MB/block) skips the
            # recompute's three relayouts outright
            rel_cat = checkpoint_name(rel_cat, "mvit_rel")
        pack = lambda r, kk: r.reshape(B, qn, H * kk)
        # MVIT_HL=0 forces the per-head kernel (head-split at this
        # boundary) while keeping the head-last pooling/layout elsewhere
        if hl_supported(kb.shape[1], C, H) and os.environ.get(
                "MVIT_HL", "1") != "0":
            out_body = flash_attention_mvit_hl(
                qb, kb, vb, kc, vc, pack(rel_cat, kcat),
                (k_t, k_h, k_w), H, float(scale),
            )
        elif os.environ.get("MVIT_KT", "0") == "1" and os.environ.get(
                "MVIT_HL", "1") != "0" and _kt_supported(C, H):
            # opt-in (MVIT_KT=1): k-tiled online-softmax variant keeps the
            # head-last layout through the wide-key blocks (no fold/unfold
            # transposes), but its fitting VMEM geometries run the chunk
            # loop at MXU-starved tile sizes — measured ~50% slower than
            # the per-head whole-key kernel on v5e (BASELINE.md round 3)
            from procedurevrl_tpu.ops.pallas_mvit_attention import (
                flash_attention_mvit_hl_kt,
            )

            out_body = flash_attention_mvit_hl_kt(
                qb, kb, vb, kc, vc, pack(rel_cat, kcat),
                (k_t, k_h, k_w), H, float(scale),
            )
        else:
            # default wide-key path: per-head whole-key kernel with
            # head-split fold/unfold only at this boundary
            from procedurevrl_tpu.ops.pallas_mvit_attention import (
                flash_attention_mvit,
            )

            fold = lambda t: t.reshape(
                B, t.shape[1], H, d).transpose(0, 2, 1, 3).reshape(
                B * H, t.shape[1], d)
            foldr = lambda r, kk: r.transpose(
                0, 4, 1, 2, 3, 5).reshape(B * H, qn, kk)
            out_body = flash_attention_mvit(
                fold(qb), fold(kb), fold(vb), fold(kc), fold(vc),
                foldr(rel_cat, kcat),
                (k_t, k_h, k_w), float(scale),
            ).reshape(B, H, qn, d).transpose(0, 2, 1, 3).reshape(B, qn, C)
        # saved as a remat residual: re-running the attention kernel in
        # the backward costs far more than storing [B, qN, C] bf16
        out_body = checkpoint_name(out_body, "flash_attn_out")
        # cls query: one row over the full (cls-first) key set, no rel bias
        qc5 = qc.reshape(B, 1, H, d)
        k5 = k.reshape(B, k.shape[1], H, d)
        v5 = v.reshape(B, v.shape[1], H, d)
        lc = jnp.einsum("bqyd,bkyd->byqk", qc5 * scale, k5,
                        preferred_element_type=jnp.float32)
        out_c = jnp.einsum(
            "byqk,bkyd->bqyd", jax.nn.softmax(lc, axis=-1).astype(v.dtype),
            v5, preferred_element_type=jnp.float32,
        ).astype(v.dtype).reshape(B, 1, C)
        return jnp.concatenate([out_c, out_body], axis=1)

    @nn.compact
    def __call__(self, x: jax.Array, thw: Tuple[int, int, int]):
        B, N, _ = x.shape
        H = self.num_heads
        head_dim = self.dim_out // H
        scale = head_dim ** -0.5

        # head-LAST throughout: q/k/v stay [B, L, H*d] from the qkv Dense
        # to the output projection — no [B, N, 3, H, d] -> [3, B, H, N, d]
        # transpose, no per-head pooling grids, no merge-heads transpose
        # (those relayouts measured ~28% of the MViT step on v5e)
        qkv = nn.Dense(3 * self.dim_out, use_bias=self.qkv_bias,
                       dtype=self.dtype, kernel_init=trunc_normal_init(0.02),
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [B, N, C]

        q, q_shape = self._pool("q", q, thw, self.kernel_q, self.stride_q)
        k, k_shape = self._pool("k", k, thw, self.kernel_kv, self.stride_kv)
        v, v_shape = self._pool("v", v, thw, self.kernel_kv, self.stride_kv)

        rel_pos_h = rel_pos_w = rel_pos_t = None
        init = (nn.initializers.zeros if self.rel_pos_zero_init
                else trunc_normal_init(0.02))
        if self.rel_pos_spatial:
            size = self.input_size[1]
            q_size = size // self.stride_q[1] if self.stride_q else size
            kv_size = size // self.stride_kv[1] if self.stride_kv else size
            rel_sp_dim = 2 * max(q_size, kv_size) - 1
            rel_pos_h = self.param("rel_pos_h", init, (rel_sp_dim, head_dim),
                                   jnp.float32)
            rel_pos_w = self.param("rel_pos_w", init, (rel_sp_dim, head_dim),
                                   jnp.float32)
        if self.rel_pos_temporal:
            rel_pos_t = self.param(
                "rel_pos_t", init, (2 * self.input_size[0] - 1, head_dim),
                jnp.float32,
            )

        from procedurevrl_tpu.ops.pallas_mvit_attention import (
            MAX_FUSED_KN, MIN_FUSED_QN,
        )

        use_fused = (
            self.use_pallas
            and self.rel_pos_spatial
            and self.rel_pos_temporal
            and self.has_cls_embed
            and int(np.prod(q_shape)) >= MIN_FUSED_QN
            and int(np.prod(k_shape)) <= MAX_FUSED_KN
        )
        if use_fused:
            out = self._fused_attention(
                q, k, v, q_shape, k_shape,
                rel_pos_h, rel_pos_w, rel_pos_t, scale,
            )  # [B, qN, C]
        else:
            # XLA fallback (tiny q / huge k / no rel-pos): head-split views
            # only at this boundary
            split = lambda t: t.reshape(
                B, t.shape[1], H, head_dim).transpose(0, 2, 1, 3)
            qh, kh, vh = split(q), split(k), split(v)
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", qh * scale, kh,
                preferred_element_type=jnp.float32,
            )
            if self.rel_pos_spatial:
                attn = add_rel_pos_spatial(
                    attn, qh, self.has_cls_embed, q_shape, k_shape,
                    rel_pos_h, rel_pos_w,
                )
            if self.rel_pos_temporal:
                attn = add_rel_pos_temporal(
                    attn, qh, self.has_cls_embed, q_shape, k_shape, rel_pos_t
                )
            attn = jax.nn.softmax(attn, axis=-1)

            out = jnp.einsum(
                "bhqk,bhkd->bqhd", attn.astype(vh.dtype), vh,
                preferred_element_type=jnp.float32,
            ).astype(vh.dtype).reshape(B, qh.shape[2], H * head_dim)

        if self.residual_pooling:
            # residual Q connection (reference :431-435), head-last
            if self.has_cls_embed:
                out = jnp.concatenate(
                    [out[:, :1, :], out[:, 1:, :] + q[:, 1:, :]], axis=1
                )
            else:
                out = out + q

        out = nn.Dense(self.dim_out, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="proj")(out)
        return out, q_shape


class MultiScaleBlock(nn.Module):
    """reference ``attention.py:445-568``."""

    dim: int
    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_path_rate: float = 0.0
    kernel_q: Tuple = ()
    kernel_kv: Tuple = ()
    stride_q: Tuple = ()
    stride_kv: Tuple = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dim_mul_in_att: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, thw, deterministic: bool = True):
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = LayerNormFp32(eps=1e-6, name="norm1")(x)
        x_block, thw_new = MultiScaleAttention(
            dim=self.dim, dim_out=att_dim, input_size=self.input_size,
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            kernel_q=self.kernel_q, kernel_kv=self.kernel_kv,
            stride_q=self.stride_q, stride_kv=self.stride_kv,
            mode=self.mode, has_cls_embed=self.has_cls_embed,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn",
        )(x_norm, thw)
        dp = DropPath(self.drop_path_rate, name="drop_path")

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype,
                         kernel_init=trunc_normal_init(0.02), name="proj")(x_norm)

        # pooled skip connection (MaxPool3d, kernel = stride+1 where s>1)
        if self.stride_q and np.prod(self.stride_q) > 1:
            kernel_skip = [s + 1 if s > 1 else s for s in self.stride_q]
            cls_tok = None
            skip = x
            if self.has_cls_embed:
                cls_tok, skip = x[:, :1, :], x[:, 1:, :]
            B = skip.shape[0]
            d = skip.shape[-1]
            grid = skip.reshape(B, *thw, d)
            grid = _max_pool_3d(grid, kernel_skip, self.stride_q,
                                [k // 2 for k in kernel_skip])
            skip = grid.reshape(B, -1, d)
            x_res = (jnp.concatenate([cls_tok, skip], axis=1)
                     if cls_tok is not None else skip)
        else:
            x_res = x

        x = x_res + dp(x_block, deterministic)
        x_norm2 = LayerNormFp32(eps=1e-6, name="norm2")(x)
        x_mlp = Mlp(int(att_dim * self.mlp_ratio), self.dim_out,
                    dtype=self.dtype, name="mlp")(x_norm2)
        if not self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype,
                         kernel_init=trunc_normal_init(0.02), name="proj")(x_norm2)
        x = x + dp(x_mlp, deterministic)
        return x, thw_new


class MViTEncoder(nn.Module):
    """Full encoder (reference ``mvit.py:30-406``); returns the pooled
    feature [B, D_final]."""

    cfg: MViTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 return_tokens: bool = False) -> jax.Array:
        """x: [B, T, H, W, C] channels-last video."""
        c = self.cfg
        plan, patch_dims, final_dim = c.block_schedule()
        B = x.shape[0]

        # 3-D conv stem (reference stem_helper.py:290-321), NDHWC
        w = self.param(
            "patch_embed_kernel", trunc_normal_init(0.02),
            tuple(c.patch_kernel) + (c.in_chans, c.embed_dim), jnp.float32,
        )
        b = self.param("patch_embed_bias", nn.initializers.zeros,
                       (c.embed_dim,), jnp.float32)
        pads = tuple((p, p) for p in c.patch_padding)
        # no preferred_element_type (see DepthwisePool3D: its VJP would be a
        # mixed-dtype conv); TPU convs accumulate fp32 internally
        grid = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=tuple(c.patch_stride), padding=pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + b.astype(self.dtype)
        T, H, W = grid.shape[1:4]
        assert [T, H, W] == patch_dims, (grid.shape, patch_dims)
        from jax.ad_checkpoint import checkpoint_name

        # the stem output is outside the remat'd blocks, but naming it
        # documents the boundary; the fp32 video -> bf16 cast + stem conv
        # are not re-run per block either way
        tokens = checkpoint_name(
            grid.reshape(B, T * H * W, c.embed_dim), "stem_out")

        if c.cls_embed_on:
            cls_token = self.param("cls_token", trunc_normal_init(0.02),
                                   (1, 1, c.embed_dim), jnp.float32)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_token.astype(self.dtype),
                                  (B, 1, c.embed_dim)), tokens], axis=1
            )
        if c.use_abs_pos:
            if c.sep_pos_embed:
                pe_s = self.param("pos_embed_spatial", trunc_normal_init(0.02),
                                  (1, patch_dims[1] * patch_dims[2], c.embed_dim),
                                  jnp.float32)
                pe_t = self.param("pos_embed_temporal", trunc_normal_init(0.02),
                                  (1, patch_dims[0], c.embed_dim), jnp.float32)
                pe = (jnp.tile(pe_s, (1, patch_dims[0], 1))
                      + jnp.repeat(pe_t, patch_dims[1] * patch_dims[2], axis=1))
                if c.cls_embed_on:
                    pe_c = self.param("pos_embed_class", trunc_normal_init(0.02),
                                      (1, 1, c.embed_dim), jnp.float32)
                    pe = jnp.concatenate([pe_c, pe], axis=1)
            else:
                n = tokens.shape[1]
                pe = self.param("pos_embed", trunc_normal_init(0.02),
                                (1, n, c.embed_dim), jnp.float32)
            tokens = tokens + pe.astype(self.dtype)

        if c.norm_stem:
            tokens = LayerNormFp32(eps=1e-6, name="norm_stem")(tokens)

        thw = tuple(patch_dims)
        dpr = np.linspace(0, c.drop_path_rate, c.depth)
        block_cls = MultiScaleBlock
        if self.remat:
            # keep the pooled-attention kernel outputs (and the stem
            # tokens) as residuals — re-running the Pallas kernels and the
            # 3-D stem conv in the backward costs far more HBM/compute
            # than storing the bf16 outputs
            block_cls = nn.remat(
                MultiScaleBlock, static_argnums=(2, 3), prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "flash_attn_out", "flash_attn_lse", "flash_attn_probs",
                    "gelu_grad", "mvit_rel"),
            )
        for i, spec in enumerate(plan):
            # thw comes from the static schedule (spec["input_size"]), not
            # the block's return value: under nn.remat the returned tuple
            # would become tracers and poison downstream static reshapes
            thw = tuple(spec["input_size"])
            tokens, _ = block_cls(
                dim=spec["dim"], dim_out=spec["dim_out"],
                num_heads=spec["num_heads"], input_size=spec["input_size"],
                mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                drop_path_rate=float(dpr[i]),
                kernel_q=spec["kernel_q"], kernel_kv=spec["kernel_kv"],
                stride_q=spec["stride_q"], stride_kv=spec["stride_kv"],
                mode=c.mode, has_cls_embed=c.cls_embed_on,
                rel_pos_spatial=c.rel_pos_spatial,
                rel_pos_temporal=c.rel_pos_temporal,
                residual_pooling=c.residual_pooling,
                dim_mul_in_att=c.dim_mul_in_att,
                dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(tokens, thw, deterministic)

        norm = LayerNormFp32(eps=1e-6, name="norm")
        if c.use_mean_pooling:
            if c.cls_embed_on:
                tokens = tokens[:, 1:]
            return norm(tokens.mean(axis=1))
        if c.cls_embed_on:
            tokens = norm(tokens)
            if return_tokens:
                return tokens
            return tokens[:, 0]
        tokens = norm(tokens)
        if return_tokens:
            return tokens
        return tokens.mean(axis=1)
