"""Shared flax building blocks (fp32 LayerNorm, MLP, attention module)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from procedurevrl_tpu.ops.common import (
    drop_path, gelu_exact, gelu_exact_stored, layer_norm_fp32,
    trunc_normal_init,
)
from procedurevrl_tpu.ops.attention import mhsa, mhsa_cls, mhsa_temporal

# GELU_STORED=1 opts into the stored-derivative GELU (ops/common.py):
# ~40% faster in isolation, but measured NEUTRAL to slightly negative
# end-to-end (82.4-82.6 vs 83.05 clips/sec) — the residual's HBM
# round-trip plus the custom_vjp fusion boundary eat the transcendental
# savings. Values identical. Read ONCE at import: toggling the env var
# after the first trace would otherwise be silently ignored by the jit
# cache (ablation harnesses must set it at process start).
_GELU_STORED = os.environ.get("GELU_STORED") == "1"


class LayerNormFp32(nn.Module):
    """LayerNorm with float32 accumulation regardless of compute dtype.

    Matches torch ``nn.LayerNorm`` numerics; the order transformer
    additionally relies on fp32 LN under low-precision compute (reference
    ``lib/models/tfm_model.py:18-24``).
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm_fp32(x, scale, bias, self.eps)


class Mlp(nn.Module):
    """Transformer MLP (reference ``lib/models/vit.py:44-60``)."""

    hidden_dim: int
    out_dim: int
    act: Optional[Callable] = None  # default: stored-derivative exact GELU
    dtype: jnp.dtype = jnp.float32
    fc1_init: Optional[Callable] = None
    fc2_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = self.act or (_GELU_STORED and gelu_exact_stored or gelu_exact)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=self.fc1_init or trunc_normal_init(0.02),
                     name="fc1")(x)
        x = act(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     kernel_init=self.fc2_init or trunc_normal_init(0.02),
                     name="fc2")(x)
        return x


class Attention(nn.Module):
    """Fused-qkv self-attention (reference ``lib/models/vit.py:62-92``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    causal: bool = False
    qkv_init: Optional[Callable] = None
    proj_init: Optional[Callable] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        time_axis: bool = False,
        cls_stream: Optional[jax.Array] = None,
    ) -> jax.Array:
        qkv_w = self.param(
            "qkv_kernel", self.qkv_init or trunc_normal_init(0.02),
            (self.dim, 3 * self.dim), jnp.float32,
        )
        qkv_b = (
            self.param("qkv_bias", nn.initializers.zeros, (3 * self.dim,), jnp.float32)
            if self.qkv_bias
            else None
        )
        proj_w = self.param(
            "proj_kernel", self.proj_init or trunc_normal_init(0.02),
            (self.dim, self.dim), jnp.float32,
        )
        proj_b = self.param("proj_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if cls_stream is not None:
            # (frame_out, cls_out): every query attends over [cls; frames]
            return mhsa_cls(x, cls_stream, qkv_w, qkv_b, proj_w, proj_b,
                            self.num_heads, use_pallas=self.use_pallas)
        if time_axis:
            # x: [B, T, N, C], attention over T with batch (B, N); the
            # Pallas path reads the stream layout-native (ops/attention)
            return mhsa_temporal(x, qkv_w, qkv_b, proj_w, proj_b,
                                 self.num_heads, use_pallas=self.use_pallas)
        return mhsa(
            x,
            qkv_w,
            qkv_b,
            proj_w,
            proj_b,
            self.num_heads,
            key_padding_mask=key_padding_mask,
            causal=self.causal,
            use_pallas=self.use_pallas,
        )


class DropPath(nn.Module):
    """Per-sample stochastic depth.

    A tuple input applies ONE shared per-sample mask to every element
    (leading dims must match) — used by the CLS-split block where the cls
    and frame-token streams must drop together, exactly as when they were
    one concatenated tensor.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        if isinstance(x, tuple):
            keep = 1.0 - self.rate
            lead = min(e.shape[0] for e in x)
            assert all(e.shape[0] % lead == 0 for e in x)
            mask = jax.random.bernoulli(
                self.make_rng("droppath"), keep, (lead,)
            )
            def apply(e):
                if e.shape[0] == lead:
                    m = mask.reshape((lead,) + (1,) * (e.ndim - 1))
                    return jnp.where(m, e / keep, jnp.zeros_like(e))
                # per-SAMPLE mask on a [lead*k, ...] element: mask through
                # a free leading-dim split view (same semantics as when
                # the element was stored [lead, k*...])
                f = e.reshape((lead, e.shape[0] // lead) + e.shape[1:])
                m = mask.reshape((lead,) + (1,) * (f.ndim - 1))
                return jnp.where(m, f / keep, jnp.zeros_like(f)).reshape(
                    e.shape)
            return tuple(apply(e) for e in x)
        return drop_path(x, self.rate, False, self.make_rng("droppath"))
