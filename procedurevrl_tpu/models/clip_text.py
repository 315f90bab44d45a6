"""Frozen CLIP ViT-B/16 text tower.

The reference loads OpenAI CLIP, deletes the visual branch, and freezes the
text tower to produce ASR pseudo-label embeddings (reference
``lib/models/vit.py:256-261`` and ``:425-433``).  This is a clean-room flax
implementation of ``clip_model.encode_text``: token embedding + positional
embedding, 12 pre-LN blocks with causal attention and QuickGELU, final
LayerNorm, readout at the EOT token (argmax of token ids), projection into
the 512-d joint space.  Weights come from the converter
(``utils/converter.py:convert_clip_text``); the tower is frozen by excluding
it from the trainable param partition (see ``train/optimizer.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.layers import Attention, LayerNormFp32, Mlp
from procedurevrl_tpu.ops.common import quick_gelu


class CLIPTextBlock(nn.Module):
    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + Attention(
            self.d_model, self.n_head, True, self.dtype, causal=True, name="attn"
        )(LayerNormFp32(name="ln_1")(x))
        x = x + Mlp(self.d_model * 4, self.d_model, act=quick_gelu,
                    dtype=self.dtype, name="mlp")(LayerNormFp32(name="ln_2")(x))
        return x


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids: jax.Array) -> jax.Array:
        """text_ids: [B, context_length] int32 -> [B, embed_dim]."""
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )

        x = jnp.take(token_embedding, text_ids, axis=0).astype(self.dtype)
        x = x + positional_embedding.astype(self.dtype)
        for i in range(self.layers):
            x = CLIPTextBlock(self.width, self.heads, self.dtype,
                              name=f"resblocks_{i}")(x)
        x = LayerNormFp32(name="ln_final")(x)
        # EOT token has the highest id in every tokenized sequence
        eot = jnp.argmax(text_ids, axis=-1)
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return jnp.einsum(
            "bc,cd->bd", feats, text_projection.astype(feats.dtype),
            preferred_element_type=jnp.float32,
        ).astype(feats.dtype)
