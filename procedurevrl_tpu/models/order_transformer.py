"""Diffusion transformer over clip-embedding sequences ("order transformer").

TPU-first re-design of the reference DiffusionTransformer (reference
``lib/models/tfm_model.py:70-329``): a CLIP-style pre-LN transformer
(QuickGELU MLP, fp32 LayerNorm) over sequences of up to ``max_len`` clip
embeddings, trained as a denoiser over a linear-beta DDPM schedule with
``total_levels == tfm_layers`` time levels evaluated via the x0-property
(each level's noisy input is re-noised from the previous level's denoised
estimate, gradients stopped through the re-noising).

Differences from the reference are layout-only: sequences are batch-major
``[B, T, C]`` (torch MHA is seq-major), the per-sample mask scatter is a
one-hot blend instead of advanced indexing (XLA-friendly, no gather/scatter
in the hot path), and the per-sample random pad start is vectorized.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.models.layers import Attention, LayerNormFp32, Mlp
from procedurevrl_tpu.ops.common import gelu_exact, quick_gelu, sinusoidal_time_embedding


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """reference lib/models/diffusion_model.py:328-331"""
    return np.linspace(np.float32(1e-4), np.float32(0.02), timesteps, dtype=np.float32)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """reference lib/models/diffusion_model.py:317-326"""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float32)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def quadratic_beta_schedule(timesteps: int) -> np.ndarray:
    """reference lib/models/diffusion_model.py:333-336"""
    return np.linspace(1e-4 ** 0.5, 0.02 ** 0.5, timesteps, dtype=np.float32) ** 2


def sigmoid_beta_schedule(timesteps: int) -> np.ndarray:
    """reference lib/models/diffusion_model.py:338-342"""
    betas = np.linspace(-6, 6, timesteps, dtype=np.float32)
    return 1 / (1 + np.exp(-betas)) * (0.02 - 1e-4) + 1e-4


class DiffusionSchedule:
    """Precomputed DDPM coefficients (reference lib/models/tfm_model.py:106-127)."""

    def __init__(self, timesteps: int, schedule: str = "linear"):
        betas = {
            "linear": linear_beta_schedule,
            "cosine": cosine_beta_schedule,
            "quadratic": quadratic_beta_schedule,
            "sigmoid": sigmoid_beta_schedule,
        }[schedule](timesteps)
        alphas = (1.0 - betas).astype(np.float32)
        ac = np.cumprod(alphas, dtype=np.float32)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        self.betas = jnp.asarray(betas, jnp.float32)
        self.sqrt_recip_alphas = jnp.asarray(np.sqrt(1.0 / alphas), jnp.float32)
        self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(ac), jnp.float32)
        self.sqrt_one_minus_alphas_cumprod = jnp.asarray(np.sqrt(1.0 - ac), jnp.float32)
        self.posterior_variance = jnp.asarray(
            betas * (1.0 - ac_prev) / (1.0 - ac), jnp.float32
        )

    def ennoise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q_sample via property 1 (reference lib/models/tfm_model.py:291-302).
        ``t``: [B] int levels; x0/noise: [B, C]."""
        a = self.sqrt_alphas_cumprod[t][:, None]
        b = self.sqrt_one_minus_alphas_cumprod[t][:, None]
        return a * x0 + b * noise


def _normal_init(std: float):
    return lambda key, shape, dtype=jnp.float32: (
        jax.random.normal(key, shape, jnp.float32) * std
    ).astype(dtype)


class ResidualAttentionBlock(nn.Module):
    """CLIP-style pre-LN block (reference lib/models/tfm_model.py:32-53)
    with CLIP init scales (reference ``initialize_parameters`` :251-263):
    attn in-proj std width^-0.5, out-proj and mlp fc2 std
    width^-0.5 * (2*layers)^-0.5, mlp fc1 std (2*width)^-0.5."""

    d_model: int
    n_head: int
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: Optional[jax.Array] = None) -> jax.Array:
        width = self.d_model
        proj_std = (width ** -0.5) * ((2 * self.num_layers) ** -0.5)
        x = x + Attention(
            self.d_model, self.n_head, True, self.dtype,
            qkv_init=_normal_init(width ** -0.5),
            proj_init=_normal_init(proj_std),
            name="attn",
        )(LayerNormFp32(name="ln_1")(x), key_padding_mask=pad_mask)
        x = x + Mlp(
            self.d_model * 4, self.d_model, act=quick_gelu, dtype=self.dtype,
            fc1_init=_normal_init((2 * width) ** -0.5),
            fc2_init=_normal_init(proj_std),
            name="mlp",
        )(LayerNormFp32(name="ln_2")(x))
        return x


class OrderTransformer(nn.Module):
    """Clip-level diffusion transformer.

    Call signature mirrors the reference dispatch (reference
    ``lib/models/tfm_model.py:129-163``): ``pretrain`` masks a random clip
    per sample and denoises it across all levels; ``forecast`` appends a
    mask token after ``num_seg`` observed clips and iteratively denoises it.
    """

    num_seg: int = 8
    tfm_layers: int = 4
    tfm_heads: int = 8
    hidden_size: int = 512
    max_len: int = 9
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.hidden_size
        std = 0.01

        def n_init(s):
            return lambda key, shape, dtype=jnp.float32: (
                jax.random.normal(key, shape, jnp.float32) * s
            ).astype(dtype)

        self.pad_embedding = self.param("pad_embedding", n_init(std), (1, C))
        self.type_embedding = self.param("type_embedding", n_init(std), (2, C))
        self.temporal_embedding = self.param(
            "temporal_embedding", n_init(std), (self.max_len, C)
        )
        # CLIP init scales live inside ResidualAttentionBlock (reference
        # lib/models/tfm_model.py:251-263).
        self.resblocks = [
            ResidualAttentionBlock(C, self.tfm_heads, self.tfm_layers,
                                   self.dtype, name=f"resblocks_{i}")
            for i in range(self.tfm_layers)
        ]
        self.time_fc1 = nn.Dense(C, dtype=self.dtype, name="time_mlp_fc1")
        self.time_fc2 = nn.Dense(C, dtype=self.dtype, name="time_mlp_fc2")
        self.schedule = DiffusionSchedule(self.tfm_layers, "linear")

    # ---- helpers -------------------------------------------------------------

    def _time_embedding(self, t: jax.Array) -> jax.Array:
        """Diffusion-time embedding MLP (reference lib/models/tfm_model.py:89-94)."""
        emb = sinusoidal_time_embedding(t, self.hidden_size // 4)
        emb = self.time_fc1(emb.astype(self.dtype))
        emb = gelu_exact(emb)
        return self.time_fc2(emb)

    def _transformer(self, x: jax.Array, pad_mask: Optional[jax.Array]) -> jax.Array:
        for blk in self.resblocks:
            x = blk(x, pad_mask)
        return x

    def _level_forward(
        self,
        feats: jax.Array,        # [B, L, C] context with noisy token scattered in
        mask_onehot: jax.Array,  # [B, L, 1]
        t: jax.Array,            # [B]
        pad_mask: Optional[jax.Array],
    ) -> jax.Array:
        """One denoising level: add type/pos/time embeddings, run the
        transformer, read out the mask position (reference
        ``lib/models/tfm_model.py:186-197``)."""
        type_emb = (
            self.type_embedding[0][None, None, :] * (1.0 - mask_onehot)
            + self.type_embedding[1][None, None, :] * mask_onehot
        )
        x = feats + type_emb.astype(feats.dtype)
        x = x + self.temporal_embedding[None, : x.shape[1], :].astype(feats.dtype)
        x = x + self._time_embedding(t)[:, None, :].astype(feats.dtype)
        x = self._transformer(x, pad_mask)
        return jnp.sum(x * mask_onehot.astype(x.dtype), axis=1)  # [B, C]

    # ---- public paths ----------------------------------------------------------

    def __call__(self, x: jax.Array, is_pretrain: bool = False, train: bool = False):
        if is_pretrain:
            return self.pretrain(x)
        return self.forecast(x)

    def pretrain(
        self,
        x: jax.Array,
        mask_inds: Optional[jax.Array] = None,
        pad_start: Optional[jax.Array] = None,
        level_noise: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, jax.Array], jax.Array]:
        """Masked-clip denoising over all levels in sequence.

        Args:
            x: [B * max_len, C] clip embeddings, sample-major.
            mask_inds / pad_start / level_noise: optional externally supplied
                randomness (used by parity tests); sampled from the
                'diffusion' RNG stream when None.
        Returns:
            (final_denoised [B, C], mask_inds [B],
             (x0_expanded [L*B, C], denoised_all [L*B, C]), denoised_all)
            — mirroring reference ``lib/models/tfm_model.py:137-204``.
        """
        L = self.max_len
        C = self.hidden_size
        B = x.shape[0] // L
        feats = x.reshape(B, L, C)

        if mask_inds is None or pad_start is None or level_noise is None:
            rng = self.make_rng("diffusion")
            k_mask, k_pad, k_noise = jax.random.split(rng, 3)
        if mask_inds is None:
            mask_inds = jax.random.randint(k_mask, (B,), 0, L)
        positions = jnp.arange(L)[None, :]
        mask_onehot = (positions == mask_inds[:, None]).astype(jnp.float32)[..., None]

        x0 = jnp.sum(feats * mask_onehot.astype(feats.dtype), axis=1)  # [B, C]

        # randomly pad the suffix after the mask token (reference :272-289):
        # pad_start uniform in [mask+1, L-1] when mask is not last, else L.
        if pad_start is None:
            rand_start = jax.random.randint(
                k_pad, (B,), mask_inds + 1, jnp.maximum(mask_inds + 2, L)
            )
            pad_start = jnp.where(mask_inds + 1 == L, L, rand_start)
        if level_noise is None:
            level_noise = jax.random.normal(
                k_noise, (self.tfm_layers, B, C), jnp.float32
            )
        pad_mask = positions >= pad_start[:, None]  # [B, L] True = padded
        feats = jnp.where(
            pad_mask[..., None], self.pad_embedding[0].astype(feats.dtype), feats
        )

        denoised_levels = []
        denoised = None
        for time_i in range(self.tfm_layers):
            t_index = self.tfm_layers - 1 - time_i
            t = jnp.full((B,), t_index, jnp.int32)
            noise = level_noise[time_i].astype(feats.dtype)
            src = x0 if time_i == 0 else denoised
            noisy = self.schedule.ennoise(jax.lax.stop_gradient(src), noise, t)
            level_feats = (
                feats * (1.0 - mask_onehot).astype(feats.dtype)
                + noisy[:, None, :].astype(feats.dtype) * mask_onehot.astype(feats.dtype)
            )
            denoised = self._level_forward(level_feats, mask_onehot, t, pad_mask)
            denoised_levels.append(denoised)

        denoised_all = jnp.concatenate(denoised_levels, axis=0)  # [L_levels*B, C]
        x0_expanded = jnp.tile(x0, (self.tfm_layers, 1))
        return denoised, mask_inds, (x0_expanded, denoised_all), denoised_all

    def forecast(self, x: jax.Array) -> jax.Array:
        """Denoise an appended future-clip token (reference
        ``lib/models/tfm_model.py:206-249``).

        Args:
            x: [B * num_seg, C] clip embeddings, sample-major.
        Returns:
            [B, C] denoised future-clip embedding.
        """
        C = self.hidden_size
        B = x.shape[0] // self.num_seg
        feats = x.reshape(B, self.num_seg, C)
        zero_tok = jnp.zeros((B, 1, C), feats.dtype)
        feats = jnp.concatenate([feats, zero_tok], axis=1)  # [B, num_seg+1, C]
        L = self.num_seg + 1

        positions = jnp.arange(L)[None, :]
        # the generated token sits at the last position (== max_len-1 since
        # num_seg == max_len-1 in all shipped configs)
        mask_onehot = (positions == L - 1).astype(jnp.float32)[..., None]  # [1, L, 1]
        mask_onehot = jnp.broadcast_to(mask_onehot, (B, L, 1))

        denoised = None
        for time_i in range(self.tfm_layers):
            t_index = self.tfm_layers - 1 - time_i
            t = jnp.full((B,), t_index, jnp.int32)
            if time_i == 0:
                level_feats = feats
            else:
                # ennoise with the zero noise token: pure sqrt(alpha_bar) scaling
                noisy = self.schedule.ennoise(
                    jax.lax.stop_gradient(denoised), jnp.zeros_like(denoised), t
                )
                level_feats = (
                    feats * (1.0 - mask_onehot).astype(feats.dtype)
                    + noisy[:, None, :].astype(feats.dtype) * mask_onehot.astype(feats.dtype)
                )
            denoised = self._level_forward(level_feats, mask_onehot, t, None)
        return denoised
