"""Fused flash self-attention Pallas kernel for the TimeSformer hot path.

The spatial pass of divided space-time attention runs on sequences of
H*W + 1 = 197 tokens with head_dim 64 across a large fused batch
(B*T*heads).  The whole K/V sequence fits in VMEM, so the kernel streams
128-row query tiles against the full key block, computing an exact (single
pass, not-online) fp32 softmax — one HBM read of q/k/v and one write of out
per tile, with the softmax chain fused between the two MXU matmuls instead
of materializing the [N, N] probability matrix in HBM.

Both forward and backward are Pallas kernels wired through ``jax.custom_vjp``
(pattern: pallas_guide "Custom VJP").  The backward recomputes probabilities
from q/k (flash-style, no residual probability tensor) and accumulates
dk/dv across query tiles via sequential-grid output revisiting.

Numerics pin the XLA path in ``ops/attention.py:attention_core`` (itself
pinned to reference ``lib/models/vit.py:75-92``): logits and softmax in
float32, probabilities cast to the value dtype before the PV matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    # CPU tests (8 virtual host devices) run the kernels interpreted.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [NP, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, NP] fp32
    npad = s.shape[-1]
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale, block_q):
    g, n, d = q.shape
    npad = _round_up(n, block_q)
    if npad != n:
        pad = ((0, 0), (0, npad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    nq = npad // block_q
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n),
        grid=(g, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, npad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * npad * npad * d,
            bytes_accessed=4 * g * npad * d * q.dtype.itemsize,
            transcendentals=g * npad * npad,
        ),
        interpret=_interpret(),
    )(q, k, v)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, n_valid: int):
    iq = pl.program_id(1)

    q = q_ref[0]          # [BQ, D]
    k = k_ref[0]          # [NP, D]
    v = v_ref[0]
    dout = g_ref[0]       # [BQ, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    npad = s.shape[-1]
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [BQ, NP] fp32

    gf = dout.astype(jnp.float32)
    # dv = p^T @ g
    dv_tile = jax.lax.dot_general(
        p, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NP, D]
    # dp = g @ v^T
    dp = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, NP]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax jvp
    # dq = ds @ k * scale
    dq_ref[0] = (jnp.dot(ds, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
                 ).astype(dq_ref.dtype)
    # dk = ds^T @ q * scale
    dk_tile = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(iq == 0)
    def _():
        dk_ref[0] = dk_tile
        dv_ref[0] = dv_tile

    @pl.when(iq > 0)
    def _():
        dk_ref[0] += dk_tile
        dv_ref[0] += dv_tile


def _flash_bwd(q, k, v, g, scale, block_q):
    gdim, n, d = q.shape
    npad = _round_up(n, block_q)
    if npad != n:
        pad = ((0, 0), (0, npad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, pad)
    nq = npad // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n),
        grid=(gdim, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # dk/dv revisit the same block across the (sequential) q-tile
            # axis, accumulating partial sums in VMEM.
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gdim, npad, d), q.dtype),
            jax.ShapeDtypeStruct((gdim, npad, d), jnp.float32),
            jax.ShapeDtypeStruct((gdim, npad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * gdim * npad * npad * d,
            bytes_accessed=8 * gdim * npad * d * q.dtype.itemsize,
            transcendentals=gdim * npad * npad,
        ),
        interpret=_interpret(),
    )(q, k, v, g)
    return (
        dq[:, :n, :],
        dk[:, :n, :].astype(q.dtype),
        dv[:, :n, :].astype(q.dtype),
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

_BLOCK_Q = 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    """q, k, v: [G, N, D] (heads folded into G). Exact softmax attention."""
    return _flash_fwd(q, k, v, scale, _BLOCK_Q)


def _flash_attention_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale, _BLOCK_Q), (q, k, v)


def _flash_attention_bwd(scale, res, g):
    q, k, v = res
    return _flash_bwd(q, k, v, g, scale, _BLOCK_Q)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_mhsa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Multi-head attention via the flash kernel.

    Args:
        q, k, v: [B, H, N, D].
    Returns:
        [B, H, N, D].
    """
    b, h, n, d = q.shape
    fold = lambda x: x.reshape(b * h, n, d)
    out = _flash_attention(fold(q), fold(k), fold(v), float(scale))
    return out.reshape(b, h, n, d)
