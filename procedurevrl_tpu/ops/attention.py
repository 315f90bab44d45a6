"""Multi-head self-attention compute paths.

``mhsa_xla`` is the XLA path: head-middle einsum attention on ``[B, N, H, d]``
reshapes (no materialized split-heads/merge-heads transposes; XLA folds the
head axis into the matmul batch dims).  ``mhsa`` dispatches to the fused
Pallas flash-attention kernel for the long-sequence spatial pass — which
additionally consumes the qkv projection output layout directly — and falls
back to XLA for tiny temporal sequences, masked/causal attention (CLIP text
tower), and sequences past the fused-kernel VMEM budget.

Semantics pin the reference ``Attention.forward`` (reference
``lib/models/vit.py:75-92``): fused qkv projection, scale = head_dim**-0.5,
softmax over keys in float32, output projection.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _min_fused_len() -> int:
    """Sequence-length floor for the fused Pallas path (short sequences
    lose to XLA).  PALLAS_MIN_LEN overrides — the multi-chip dryrun sets
    it to engage the kernels (interpret mode) at toy shapes."""
    return int(os.environ.get("PALLAS_MIN_LEN", "128"))


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    key_padding_mask: jax.Array | None = None,
    causal: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v with fp32 softmax accumulation.

    Args:
        q, k, v: [B, H, N, D].
        key_padding_mask: optional [B, N] bool, True = masked out (torch
            ``key_padding_mask`` semantics).
        causal: lower-triangular mask (CLIP text tower).
    """
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=logits.dtype)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    if causal:
        n = logits.shape[-1]
        tri = jnp.tril(jnp.ones((n, n), dtype=bool))
        logits = jnp.where(tri[None, None], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def _qkv_project(x, qkv_w, qkv_b):
    qkv = jnp.einsum("bnc,cd->bnd", x, qkv_w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(x.dtype)
    # named so TPU.REMAT_SAVE_QKV can keep the projection as a residual
    # (skips the biggest recomputed GEMM of the remat backward)
    from jax.ad_checkpoint import checkpoint_name

    qkv = checkpoint_name(qkv, "qkv_out")
    return jnp.split(qkv, 3, axis=-1)


@functools.lru_cache(maxsize=None)
def qkv_window_perm(c: int, num_heads: int, hpb: int):
    """Column permutation [3C] mapping the standard fused-qkv projection
    layout (q lanes 0..C-1, k at C.., v at 2C..) into per-head-group
    [q(w) | k(w) | v(w)] windows (w = hpb * head_dim lanes) consumed by
    ``flash_attention_cls_qkv``.  Applied to the projection WEIGHT columns
    (and bias) — a few-MB static gather whose VJP is the inverse
    permutation — never to activations."""
    import numpy as np

    w = (c // num_heads) * hpb
    groups = c // w
    perm = np.empty(3 * c, np.int64)
    for g in range(groups):
        base = 3 * g * w
        lanes = np.arange(g * w, (g + 1) * w)
        perm[base:base + w] = lanes
        perm[base + w:base + 2 * w] = c + lanes
        perm[base + 2 * w:base + 3 * w] = 2 * c + lanes
    return tuple(perm.tolist())


def _qkv_project_windowed(x, qkv_w, qkv_b, perm):
    """Fused qkv projection emitting the window-permuted [.., 3C] layout."""
    import numpy as np

    idx = np.asarray(perm)
    w_p = qkv_w.astype(x.dtype)[:, idx]
    qkv = jnp.einsum("bnc,cd->bnd", x, w_p,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(x.dtype)[idx]
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(qkv, "qkv_out")


def _out_project(out, proj_w, proj_b):
    out = jnp.einsum("bnc,cd->bnd", out, proj_w.astype(out.dtype),
                     preferred_element_type=jnp.float32).astype(out.dtype)
    return out + proj_b.astype(out.dtype)


def mhsa_xla(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array | None,
    proj_w: jax.Array,
    proj_b: jax.Array,
    num_heads: int,
    key_padding_mask: jax.Array | None = None,
    causal: bool = False,
) -> jax.Array:
    """Fused-projection self-attention, transpose-free head handling.

    Args:
        x: [B, N, C].
        qkv_w: [C, 3C] (input-major, i.e. torch weight transposed).
        proj_w: [C, C].
    """
    b, n, c = x.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    q, k, v = _qkv_project(x, qkv_w, qkv_b)
    split = lambda t: t.reshape(b, n, num_heads, head_dim)
    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=logits.dtype)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    if causal:
        tri = jnp.tril(jnp.ones((n, n), dtype=bool))
        logits = jnp.where(tri[None, None], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b, n, c)
    return _out_project(out, proj_w, proj_b)


def mhsa_cls(
    x: jax.Array,
    cls_x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array | None,
    proj_w: jax.Array,
    proj_b: jax.Array,
    num_heads: int,
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Self-attention with the CLS token as a separate stream.

    ``x`` is the frame-token stream [B, N, C]; ``cls_x`` is [B, 1, C].
    Every query attends over [cls; frames] (the divided-space-time spatial
    pass, reference ``lib/models/vit.py:128-158``); keeping the CLS out of
    the fused stream avoids materializing the [B, N+1, C] concat twice per
    block. Returns (frame_out [B, N, C], cls_out [B, 1, C]).
    """
    from procedurevrl_tpu.ops.pallas_attention import (
        MAX_FUSED_LEN, _heads_per_block, flash_attention_cls,
    )

    c = x.shape[-1]
    head_dim = c // num_heads
    if (
        use_pallas
        and _min_fused_len() <= x.shape[1] <= MAX_FUSED_LEN
        and _heads_per_block(head_dim, num_heads) > 0
    ):
        from jax.ad_checkpoint import checkpoint_name

        from procedurevrl_tpu.utils.env import env_flag
        if env_flag("SPATIAL_FUSED_QKV", True):
            # single fused-qkv operand in window-permuted column order: the
            # opaque kernel call cannot fuse with producers, so the
            # jnp.split feeding the separate-q/k/v kernel materializes three
            # [B, N, C] slice copies per block (and the split's VJP concats
            # three gradients back).  TP meshes keep the split path (the
            # train tool sets SPATIAL_FUSED_QKV=0 when TPU.MESH_MODEL > 1):
            # its channel axis shards by whole head groups, while the fused
            # window layout would replicate lanes.
            from procedurevrl_tpu.ops.pallas_attention import (
                flash_attention_cls_qkv,
            )

            perm = qkv_window_perm(
                c, num_heads, _heads_per_block(head_dim, num_heads))
            qkv = _qkv_project_windowed(x, qkv_w, qkv_b, perm)
            qkv_c = _qkv_project_windowed(cls_x, qkv_w, qkv_b, perm)
            out, out_c = flash_attention_cls_qkv(
                qkv, qkv_c, num_heads, head_dim ** -0.5
            )
        else:
            q, k, v = _qkv_project(x, qkv_w, qkv_b)
            qc, kc, vc = _qkv_project(cls_x, qkv_w, qkv_b)
            out, out_c = flash_attention_cls(
                q, k, v, qc, kc, vc, num_heads, head_dim ** -0.5
            )
        out = checkpoint_name(out, "flash_attn_out")
        out_c = checkpoint_name(out_c, "flash_attn_out")
        return _out_project(out, proj_w, proj_b), _out_project(out_c, proj_w, proj_b)
    # XLA fallback: concat, plain attention, split
    xs = jnp.concatenate([cls_x, x], axis=1)
    out = mhsa_xla(xs, qkv_w, qkv_b, proj_w, proj_b, num_heads)
    return out[:, 1:, :], out[:, :1, :]


def mhsa_temporal(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array | None,
    proj_w: jax.Array,
    proj_b: jax.Array,
    num_heads: int,
    use_pallas: bool = False,
) -> jax.Array:
    """Self-attention over axis 1 of the time-major stream [B, T, N, C].

    The Pallas path consumes the qkv projection output in its native layout
    (no [B*N, T, C] transposes, no head-split copies, no HBM logits) and
    computes the T x T attention with structured 0/1 MXU matmuls
    (ops/pallas_attention temporal v2).  Default ON: the v2 kernel measured
    62.4 clips/sec/chip on the v5e train step vs 56.9 for the XLA relayout
    path (the v1 VPU-lane-reduce kernel had measured 53.2 and was opt-in).
    ``TEMPORAL_PALLAS=0`` forces the XLA fallback (one explicit (T, N)
    transpose each way).
    """
    import os

    b, t, n, c = x.shape
    head_dim = c // num_heads
    if use_pallas and os.environ.get("TEMPORAL_PALLAS", "1") != "0":
        from procedurevrl_tpu.ops.pallas_attention import (
            MAX_TEMPORAL_T, _temporal_geometry, flash_attention_temporal,
        )

        if t <= MAX_TEMPORAL_T and _temporal_geometry(
            n, c, head_dim, num_heads, t, x.dtype.itemsize
        )[0] > 0:
            # stay 4-D end to end: a [B, T*N, C] <-> [B, T, N, C] reshape
            # is a real copy on TPU when N is not a sublane multiple (the
            # 4-D layout pads each N-row group), so the projections run
            # on the 4-D views directly
            qkv = jnp.einsum(
                "btnc,cd->btnd", x, qkv_w.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(x.dtype)
            out = flash_attention_temporal(
                qkv, num_heads, head_dim ** -0.5
            )
            from jax.ad_checkpoint import checkpoint_name

            out = checkpoint_name(out, "flash_attn_out")
            out = jnp.einsum(
                "btnc,cd->btnd", out, proj_w.astype(out.dtype),
                preferred_element_type=jnp.float32,
            ).astype(out.dtype)
            return out + proj_b.astype(out.dtype)
    # XLA fallback: one explicit (T, N) transpose each way
    xt = x.transpose(0, 2, 1, 3).reshape(b * n, t, c)
    out = mhsa_xla(xt, qkv_w, qkv_b, proj_w, proj_b, num_heads)
    out = out.reshape(b, n, t, c).transpose(0, 2, 1, 3)
    # named so the remat policy can keep the WHOLE temporal pass as a
    # residual (TPU.REMAT_SAVE_TEMPORAL): the pass is relayout- and
    # tiny-matmul-bound (~1/3 of the step on v5e traces) but its output is
    # only [B, T, N, C] bf16 — storing it is far cheaper than re-running
    # the transposes + batched T x T matmuls in the backward
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(out, "temporal_out")


def mhsa(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array | None,
    proj_w: jax.Array,
    proj_b: jax.Array,
    num_heads: int,
    key_padding_mask: jax.Array | None = None,
    causal: bool = False,
    use_pallas: bool = False,
) -> jax.Array:
    from procedurevrl_tpu.ops.pallas_attention import (
        MAX_FUSED_LEN, _heads_per_block, flash_attention_headfused,
    )

    if (
        use_pallas
        and key_padding_mask is None
        and not causal
        and _min_fused_len() <= x.shape[1] <= MAX_FUSED_LEN
        and _heads_per_block(x.shape[-1] // num_heads, num_heads) > 0
    ):
        c = x.shape[-1]
        head_dim = c // num_heads
        q, k, v = _qkv_project(x, qkv_w, qkv_b)
        out = flash_attention_headfused(
            q, k, v, num_heads, head_dim ** -0.5
        )
        # name the kernel output so the remat policy can keep it as a
        # residual (skipping the flash-kernel recompute in the backward)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "flash_attn_out")
        return _out_project(out, proj_w, proj_b)
    return mhsa_xla(x, qkv_w, qkv_b, proj_w, proj_b, num_heads, key_padding_mask, causal)
