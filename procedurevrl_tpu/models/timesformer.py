"""TimeSformer video encoder, TPU-first.

Re-design of the reference encoder (reference ``lib/models/vit.py:94-423``)
with the same math but idiomatic JAX/TPU structure:

- patch embedding is a patchify-reshape + single MXU matmul instead of a
  Conv2d (k16 s16 conv is exactly a blocked matmul; this removes the
  im2col/layout work XLA would otherwise emit);
- the token stream is kept channels-last; the divided space-time block
  rearranges with reshapes/transposes that XLA folds into the attention
  fusions;
- LayerNorms accumulate in fp32; matmuls run in the configured compute
  dtype (bfloat16 for training) with fp32 accumulation on the MXU;
- blocks can be rematerialized (``jax.checkpoint``) to trade FLOPs for HBM.

Token layout is **time-major**: after the stem the sequence is
``[CLS, (t n)]`` — frame-major (the reference keeps patch-major
``[CLS, (n t)]``, ``lib/models/vit.py:406``).  Attention groups are
identical either way (temporal = fixed patch, spatial = fixed frame), so
every token's value — and the CLS output — is numerically unchanged; the
time-major residence makes the expensive spatial pass a free reshape
(v5e traces showed the per-block patch-major<->frame-major transposes as
a double-digit share of step time) while the tiny temporal pass reads
through an einsum whose relayout XLA folds into the matmuls.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.layers import Attention, DropPath, LayerNormFp32, Mlp
from procedurevrl_tpu.ops.common import interpolate_nearest_1d, interpolate_nearest_2d, trunc_normal_init


class PatchEmbed(nn.Module):
    """16x16/16 patch embedding as patchify + matmul.

    Equivalent to the reference Conv2d stem (reference
    ``lib/models/vit.py:160-180``); the converter folds the conv weight
    ``[D, C, p, p]`` into the ``[p*p*C, D]`` kernel here.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B', H, W, C] -> [B', N, D] with N = (H/p)*(W/p), row-major patches."""
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", trunc_normal_init(0.02), (p * p * c, self.embed_dim), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        # [B, gh, p, gw, p, C] -> [B, gh, gw, p, p, C] -> [B, N, p*p*C]
        patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh * gw, p * p * c).astype(self.dtype)
        out = jnp.einsum(
            "bnk,kd->bnd", patches, kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return out + bias.astype(self.dtype)


class DividedSTBlock(nn.Module):
    """Divided space-time attention block (reference ``lib/models/vit.py:94-158``).

    Factorizes full (S*T)^2 attention into a T-length temporal pass per patch
    location and an (S+1)-length spatial pass per frame with a replicated CLS
    whose outputs are averaged over frames — O(S*T*(S+T)) instead of
    O((S*T)^2).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    attention_type: str = "divided_space_time"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, T: int, W: int, deterministic: bool = True):
        """Divided block on the token stream.

        ``x`` is either the fused ``[B, 1 + T*H*W, D]`` time-major stream
        (token (t, h, w) at ``1 + t*(H*W) + h*W + w``) or — the fast path
        the encoder uses — a split ``(cls [B, 1, D], xt [B, T*H*W, D])``
        tuple.  The split state removes the per-block concatenate/slice
        round-trips of the fused layout (two full-stream copies per block,
        forward and backward); the math is identical.
        """
        D = self.dim

        norm1 = LayerNormFp32(eps=self.norm_eps, name="norm1")
        attn = Attention(D, self.num_heads, self.qkv_bias, self.dtype,
                         self.use_pallas, name="attn")
        norm2 = LayerNormFp32(eps=self.norm_eps, name="norm2")
        mlp = Mlp(int(D * self.mlp_ratio), D, dtype=self.dtype, name="mlp")
        dp = DropPath(self.drop_path_rate, name="drop_path")

        if self.attention_type in ("space_only", "joint_space_time"):
            x = x + dp(attn(norm1(x)), deterministic)
            x = x + dp(mlp(norm2(x)), deterministic)
            return x

        # the frame-token stream ``xt`` lives as [B*T, N, D] — the SPATIAL
        # layout.  The temporal 4-D view [B, T, N, D] is a free
        # leading-dim split of it, whereas the round-2 flat [B, T*N, D]
        # residence needed a REAL copy to/from both attention layouts (the
        # 4-D/spatial forms pad each N-row group to a sublane multiple;
        # profiled at ~15 ms/step of pure reshape copies).
        split_input = isinstance(x, tuple)
        if split_input:
            init_cls, xt = x
        else:
            init_cls, xt = x[:, :1, :], x[:, 1:, :]
        B = init_cls.shape[0]
        if split_input:
            N = xt.shape[1]
        else:
            N = xt.shape[1] // T
            xt = xt.reshape(B * T, N, D)

        temporal_norm1 = LayerNormFp32(eps=self.norm_eps, name="temporal_norm1")
        temporal_attn = Attention(D, self.num_heads, self.qkv_bias, self.dtype,
                                  self.use_pallas, name="temporal_attn")
        temporal_fc = nn.Dense(D, dtype=self.dtype,
                               kernel_init=trunc_normal_init(0.02), name="temporal_fc")

        # ---- temporal attention over T per patch location ----
        xt4 = xt.reshape(B, T, N, D)  # free leading-dim split
        res_temporal = dp(
            temporal_attn(temporal_norm1(xt4), time_axis=True), deterministic
        )
        res_temporal = temporal_fc(res_temporal)  # [B, T, N, D]
        xt = xt + res_temporal.reshape(B * T, N, D)

        # ---- spatial attention over [cls] + H*W per frame ----
        cls_n = norm1(init_cls)  # [B, 1, D]
        cls_rep = jnp.broadcast_to(
            cls_n[:, None], (B, T, 1, D)
        ).reshape(B * T, 1, D)
        res_frames, res_cls = attn(norm1(xt), cls_stream=cls_rep)
        # one shared per-(b,t) drop mask, as when cls+frames were one tensor
        res_frames, res_cls = dp((res_frames, res_cls), deterministic)
        cls_out = res_cls.reshape(B, T, D).mean(axis=1, keepdims=True)
        xt = xt + res_frames
        cls = init_cls + cls_out

        # DropPath applies the per-SAMPLE mask to the [B*T, N, D] stream
        # through a free [B, T, N, D] view (models/layers.py)
        mlp_cls, mlp_xt = dp((mlp(norm2(cls)), mlp(norm2(xt))), deterministic)
        cls = cls + mlp_cls
        xt = xt + mlp_xt
        if split_input:
            return cls, xt
        return jnp.concatenate([cls, xt.reshape(B, T * N, D)], axis=1)


class TimeSformer(nn.Module):
    """TimeSformer-B encoder (reference ``lib/models/vit.py:183-423``).

    Input is channels-last video ``[B, T, H, W, C]``; output is the CLS
    feature ``[B, D]`` (or all tokens with ``return_tokens=True``).
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_frames: int = 8
    attention_type: str = "divided_space_time"
    drop_path_rate: float = 0.1
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    remat_save_qkv: bool = False
    remat_save_attn: bool = True
    remat_save_temporal: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        return_tokens: bool = False,
    ) -> jax.Array:
        B, T, H, W, C = x.shape
        p = self.patch_size
        gw = W // p
        num_patches = (self.img_size // p) ** 2
        D = self.embed_dim

        x = x.astype(self.dtype)
        # stem over all frames at once
        tokens = PatchEmbed(p, D, self.dtype, name="patch_embed")(
            x.reshape(B * T, H, W, C)
        )  # [B*T, N, D]
        n_tok = tokens.shape[1]

        cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, D), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02), (1, num_patches + 1, D), jnp.float32
        )

        # positional embedding with nearest resize at resolution mismatch
        # (reference lib/models/vit.py:375-388)
        if n_tok + 1 != pos_embed.shape[1]:
            cls_pe = pos_embed[:, :1, :]
            other_pe = pos_embed[:, 1:, :]
            side = int(round(other_pe.shape[1] ** 0.5))
            gh_new = n_tok // gw
            other_pe = other_pe.reshape(1, side, side, D)
            other_pe = interpolate_nearest_2d(other_pe, (gh_new, gw), axes=(1, 2))
            pe = jnp.concatenate([cls_pe, other_pe.reshape(1, n_tok, D)], axis=1)
        else:
            pe = pos_embed

        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B * T, 1, D))
        tokens = jnp.concatenate([cls, tokens], axis=1) + pe.astype(self.dtype)

        if self.attention_type != "space_only":
            time_embed = self.param(
                "time_embed",
                trunc_normal_init(0.02),
                (1, self.num_frames, D),
                jnp.float32,
            )
            te = (
                interpolate_nearest_1d(time_embed, T, axis=1)
                if T != self.num_frames
                else time_embed
            )
            # all CLS rows are identical here (cls_token + cls pos embed), so
            # the reference's x[:B, 0] slice is just "one CLS per sample"
            # (reference lib/models/vit.py:393-394)
            cls = tokens[:B, :1, :]
            spatial = tokens[:, 1:, :].reshape(B, T, n_tok, D)
            spatial = spatial + te.astype(self.dtype)[:, :, None, :]
            # the stream stays in the SPATIAL residence [B*T, N, D]; the
            # temporal [B, T, N, D] view is a free leading-dim split (the
            # flat [B, T*N, D] form of earlier rounds copy-converts both
            # ways because the padded N-row tiling differs); cls travels
            # as a separate stream (no per-block concats)
            tokens = (cls, spatial.reshape(B * T, n_tok, D))
            eff_T = T
        else:
            eff_T = 1
            tokens = tokens  # [B*T, 1+N, D], frames independent

        block_cls = DividedSTBlock
        if self.remat:
            # rematerialize everything except the flash-attention outputs:
            # recomputing elementwise/GEMM fwd is cheap, re-running the
            # attention kernels is not. remat_save_qkv additionally keeps
            # the qkv projections (the largest recomputed GEMMs) when HBM
            # allows; remat_save_attn=False saves NOTHING inside blocks
            # (full recompute incl. the attention kernels — the leanest
            # HBM footprint, for fitting larger batches).
            names = ()
            if self.remat_save_attn:
                # gelu_grad: the stored GELU derivative (ops/common.py,
                # gelu_exact_stored) — keeping it is the entire point of
                # computing it in the forward
                names += ("flash_attn_out", "gelu_grad")
            if self.remat_save_qkv:
                names += ("qkv_out",)
            if self.remat_save_temporal:
                # keep the temporal pass (transposes + T x T batched
                # matmuls, ~1/3 of the step) out of the backward recompute
                names += ("temporal_out",)
            block_cls = nn.remat(
                DividedSTBlock, static_argnums=(2, 3, 4), prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
        for i in range(self.depth):
            tokens = block_cls(
                dim=D,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_path_rate=float(
                    self.drop_path_rate * i / max(self.depth - 1, 1)
                ),
                norm_eps=self.norm_eps,
                attention_type=self.attention_type,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(tokens, eff_T, gw, deterministic)

        if self.attention_type == "space_only":
            tokens = tokens.reshape(B, T, n_tok + 1, D).mean(axis=1)

        norm = LayerNormFp32(eps=self.norm_eps, name="norm")
        if isinstance(tokens, tuple):
            cls, xt = tokens
            if return_tokens:
                # back to the flat [B, 1 + T*N, D] contract for callers
                flat = xt.reshape(B, xt.shape[0] // B * xt.shape[1], D)
                return norm(jnp.concatenate([cls, flat], axis=1))
            # LN is per-token: norm(cls) == norm(concat)[:, 0]
            return norm(cls)[:, 0]
        tokens = norm(tokens)
        if return_tokens:
            return tokens
        return tokens[:, 0]
