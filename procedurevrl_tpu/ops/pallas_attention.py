"""Fused flash self-attention Pallas kernel for the TimeSformer hot path.

The spatial pass of divided space-time attention runs on sequences of
H*W + 1 = 197 tokens with head_dim 64 across a large fused batch
(B*T*heads).  The whole padded sequence fits in VMEM, so each grid step
processes one (batch, head) pair with plain 2-D MXU matmuls and an exact
fp32 softmax fused in between — one HBM read of q/k/v and one write of out,
never materializing the [N, N] probability matrix in HBM.  (Measured on
v5e: a 128-row q-tiling variant that re-reads K/V per tile is ~90x slower
than this full-tile layout at N=197; batched >2-D dots in-kernel are
similarly slow — keep the dots 2-D.)

Both forward and backward are Pallas kernels wired through
``jax.custom_vjp`` (pattern: pallas_guide "Custom VJP").  The backward
recomputes probabilities from q/k (flash-style, no residual probability
tensor saved).

Numerics pin the XLA path in ``ops/attention.py:attention_core`` (itself
pinned to reference ``lib/models/vit.py:75-92``): logits and softmax in
float32, probabilities cast to the value dtype before the PV matmul.

Sequences longer than ``MAX_FUSED_LEN`` (joint space-time at high
resolution) should use the XLA path; the ``mhsa`` dispatcher handles this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this, [N, N] fp32 logits stop fitting comfortably in VMEM
MAX_FUSED_LEN = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    # CPU tests (8 virtual host devices) run the kernels interpreted.
    return jax.default_backend() != "tpu"


def _softmax_probs(q, k, scale: float, n_valid: int):
    """fp32 softmax(q k^T * scale) with padded keys masked out."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [NP, NP] fp32
    npad = s.shape[-1]
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    p = _softmax_probs(q_ref[0], k_ref[0], scale, n_valid)
    v = v_ref[0]
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pad_seq(arrs, n, npad):
    if npad == n:
        return arrs
    pad = ((0, 0), (0, npad - n), (0, 0))
    return [jnp.pad(a, pad) for a in arrs]


def _flash_fwd(q, k, v, scale):
    g, n, d = q.shape
    npad = _round_up(n, 128)
    q, k, v = _pad_seq([q, k, v], n, npad)
    full = lambda: pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n),
        grid=(g,),
        in_specs=[full(), full(), full()],
        out_specs=full(),
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
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    p = _softmax_probs(q, k, scale, n_valid)  # [NP, NP] fp32

    gf = g_ref[0].astype(jnp.float32)
    # dv = p^T @ g
    dv_ref[0] = jax.lax.dot_general(
        p, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    # dp = g @ v^T
    dp = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    dq_ref[0] = (jnp.dot(ds, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
                 ).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)


def _flash_bwd(q, k, v, g, scale):
    gdim, n, d = q.shape
    npad = _round_up(n, 128)
    q, k, v, g = _pad_seq([q, k, v, g], n, npad)
    full = lambda: pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n),
        grid=(gdim,),
        in_specs=[full(), full(), full(), full()],
        out_specs=[full(), full(), full()],
        out_shape=[jax.ShapeDtypeStruct((gdim, npad, d), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * gdim * npad * npad * d,
            bytes_accessed=8 * gdim * npad * d * q.dtype.itemsize,
            transcendentals=gdim * npad * npad,
        ),
        interpret=_interpret(),
    )(q, k, v, g)
    return dq[:, :n, :], dk[:, :n, :], dv[:, :n, :]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    """q, k, v: [G, N, D] (heads folded into G). Exact softmax attention."""
    return _flash_fwd(q, k, v, scale)


def _flash_attention_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _flash_attention_bwd(scale, res, g):
    q, k, v = res
    return _flash_bwd(q, k, v, g, scale)


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
