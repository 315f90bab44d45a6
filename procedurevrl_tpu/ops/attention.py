"""Multi-head self-attention compute paths.

``mhsa_xla`` is the reference XLA path (einsum attention; XLA fuses the
softmax chain and maps the matmuls onto the MXU).  ``mhsa`` dispatches to the
fused Pallas flash-attention kernel for shapes where it wins (long spatial
sequences) and falls back to XLA otherwise (tiny temporal sequences, where a
kernel launch costs more than it saves).

Semantics pin the reference ``Attention.forward`` (reference
``lib/models/vit.py:75-92``): fused qkv projection, scale = head_dim**-0.5,
softmax over keys in float32, output projection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


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
    """Fused-projection self-attention.

    Args:
        x: [B, N, C].
        qkv_w: [C, 3C] (input-major, i.e. torch weight transposed).
        proj_w: [C, C].
    """
    b, n, c = x.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5
    qkv = jnp.einsum("bnc,cd->bnd", x, qkv_w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if qkv_b is not None:
        qkv = qkv + qkv_b.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = attention_core(
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
        scale,
        key_padding_mask,
        causal,
    )
    out = merge_heads(out)
    out = jnp.einsum("bnc,cd->bnd", out, proj_w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out + proj_b.astype(x.dtype)


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
    from procedurevrl_tpu.ops.pallas_attention import MAX_FUSED_LEN, flash_mhsa

    if (
        use_pallas
        and key_padding_mask is None
        and not causal
        and 128 <= x.shape[1] <= MAX_FUSED_LEN
    ):

        b, n, c = x.shape
        head_dim = c // num_heads
        qkv = jnp.einsum("bnc,cd->bnd", x, qkv_w.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if qkv_b is not None:
            qkv = qkv + qkv_b.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = flash_mhsa(
            split_heads(q, num_heads),
            split_heads(k, num_heads),
            split_heads(v, num_heads),
            scale=head_dim ** -0.5,
        )
        out = merge_heads(out)
        out = jnp.einsum("bnc,cd->bnd", out, proj_w.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return out + proj_b.astype(x.dtype)
    return mhsa_xla(x, qkv_w, qkv_b, proj_w, proj_b, num_heads, key_padding_mask, causal)
