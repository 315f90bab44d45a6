"""ProcedureVRL: the full video-language model.

Composes the video encoder (TimeSformer or MViT-v2), the 512-d projection
head, the diffusion order transformer, the frozen CLIP text tower, and the
finetuning heads, with the same forward dispatch as the reference
``VisionTransformer.forward`` (reference ``lib/models/vit.py:283-358``):

- **order pretraining** (train, ``order_pretrain``): encode B*9 clips,
  match against the step-candidate bank, build CLIP pseudo-labels from ASR
  text + precomputed CLIP visual features, denoise a masked clip across all
  diffusion levels, and return (student logits, teacher logits, MSE pair);
- **zero-shot step classification** (eval, ``match_lang_emb``): normalized
  head embedding @ step bank / temp, softmax;
- **zero-shot step forecasting** (eval, ``num_seg > 0``): per-clip
  embeddings -> order-transformer forecast -> match -> softmax;
- **finetuning**: classification head (COIN) or verb+noun heads (EPIC).

``label_emb`` (the step-candidate bank) is passed as an explicit argument —
not a parameter — keeping data flow functional; it must be L2-normalized
(the reference normalizes it on first device transfer,
``lib/models/vit.py:435-440``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.clip_text import CLIPTextEncoder
from procedurevrl_tpu.models.order_transformer import OrderTransformer
from procedurevrl_tpu.models.timesformer import TimeSformer
from procedurevrl_tpu.ops.common import trunc_normal_init


def _l2norm(x: jax.Array, eps: float = 0.0) -> jax.Array:
    # torch x.norm(dim=1, keepdim=True) has no epsilon; keep identical
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class ProcedureVRL(nn.Module):
    """Full model. See module docstring for the forward contract."""

    # encoder selection / geometry
    encoder_name: str = "timesformer"  # "timesformer" | "mvit"
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    num_frames: int = 8
    attention_type: str = "divided_space_time"
    drop_path_rate: float = 0.1
    # heads / task structure
    num_classes: int = 1000
    label_dim: int = 512          # projection width == step-bank width
    temp: float = 0.02
    match_lang_emb: bool = False
    order_pretrain: bool = False
    order_max_len: int = 9
    order_tfm_layers: int = 4
    order_recog_batch: int = 9
    num_seg: int = 0
    with_text_model: bool = False
    # CLIP text tower geometry (defaults = ViT-B/16 text config)
    text_vocab: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    epic_heads: bool = False      # verb (97) + noun (300) dual head
    drop_e: float = 0.0
    # mvit config dict (only used when encoder_name == "mvit")
    mvit_cfg: Optional[Any] = None
    # TPU execution knobs
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    remat_save_qkv: bool = False
    remat_save_attn: bool = True
    remat_save_temporal: bool = False

    def setup(self):
        if self.encoder_name == "timesformer":
            self.encoder = TimeSformer(
                img_size=self.img_size,
                patch_size=self.patch_size,
                embed_dim=self.embed_dim,
                depth=self.depth,
                num_heads=self.num_heads,
                num_frames=self.num_frames,
                attention_type=self.attention_type,
                drop_path_rate=self.drop_path_rate,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                remat=self.remat,
                remat_save_qkv=self.remat_save_qkv,
                remat_save_attn=self.remat_save_attn,
                remat_save_temporal=self.remat_save_temporal,
                name="encoder",
            )
        elif self.encoder_name == "mvit":
            from procedurevrl_tpu.models.mvit import MViTEncoder

            self.encoder = MViTEncoder(
                cfg=self.mvit_cfg, dtype=self.dtype, remat=self.remat,
                use_pallas=self.use_pallas, name="encoder",
            )
        else:
            raise ValueError(f"Unknown encoder {self.encoder_name}")

        self.head = nn.Dense(
            self.label_dim, dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02), name="head",
        )
        if self.order_pretrain or self.num_seg > 0:
            self.order_tfm = OrderTransformer(
                num_seg=self.num_seg if self.num_seg > 0 else self.order_max_len - 1,
                tfm_layers=self.order_tfm_layers,
                hidden_size=self.label_dim,
                max_len=self.order_max_len,
                dtype=self.dtype,
                name="order_tfm",
            )
        if self.with_text_model:
            self.text_model = CLIPTextEncoder(
                vocab_size=self.text_vocab,
                width=self.text_width,
                heads=self.text_heads,
                layers=self.text_layers,
                embed_dim=self.label_dim,
                dtype=self.dtype,
                name="text_model",
            )
        if not self.match_lang_emb:
            if self.epic_heads:
                self.head_v = nn.Dense(97, dtype=self.dtype,
                                       kernel_init=trunc_normal_init(0.02), name="head_v")
                self.head_n = nn.Dense(300, dtype=self.dtype,
                                       kernel_init=trunc_normal_init(0.02), name="head_n")
            else:
                self.head_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                                         kernel_init=trunc_normal_init(0.02),
                                         name="head_cls")

    # ---- teacher --------------------------------------------------------------

    def get_pseudo_labels(
        self, text: Dict[str, jax.Array], label_emb: jax.Array
    ) -> jax.Array:
        """CLIP teacher: (text(ASR) + precomputed visual) / 2, matched to the
        step bank (reference ``lib/models/vit.py:425-433``).  Without a text
        tower the teacher degrades to the precomputed visual features."""
        vis_emb = text["clip_vis_feat"].astype(jnp.float32)
        if self.with_text_model:
            text_emb = jax.lax.stop_gradient(
                self.text_model(text["clip_text_ids"])
            ).astype(jnp.float32)
            emb = (text_emb + vis_emb) / 2.0
        else:
            emb = vis_emb
        emb = _l2norm(emb)
        return jnp.einsum(
            "bc,kc->bk", emb, label_emb.astype(emb.dtype),
            preferred_element_type=jnp.float32,
        ) / self.temp

    # ---- forward ---------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        text: Optional[Dict[str, jax.Array]] = None,
        label_emb: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """x: video frames, channels-last.

        - order pretraining: [B, M, T, H, W, C] (M == order_max_len);
        - forecasting:       [B, M*T, H, W, C]  (M == num_seg);
        - classification:    [B, T, H, W, C].
        """
        batch_size = x.shape[0]
        deterministic = not train

        if self.order_pretrain and train:
            B, M = x.shape[0], x.shape[1]
            x = x.reshape((B * M,) + x.shape[2:])
        elif self.num_seg > 0:
            B, MT = x.shape[0], x.shape[1]
            T = MT // self.num_seg
            x = x.reshape(B * self.num_seg, T, *x.shape[2:])

        feat = self.encoder(x, deterministic=deterministic)  # [N, D]

        if self.match_lang_emb:
            assert label_emb is not None, "match_lang_emb requires a step bank"
            emb = _l2norm(self.head(feat))
            video_emb = emb
            if self.num_seg > 0:  # zero-shot step forecasting
                emb = _l2norm(self.order_tfm.forecast(video_emb))
            logits = jnp.einsum(
                "bc,kc->bk", emb, label_emb.astype(emb.dtype),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) / self.temp
        else:  # finetuning heads
            if self.num_seg > 0:  # step / task forecasting head
                video_emb = _l2norm(self.head(feat))
                emb = self.order_tfm.forecast(video_emb)
                logits = self.head_cls(emb).astype(jnp.float32)  # no temperature
            else:
                emb = _l2norm(self.head(feat))
                if self.epic_heads:
                    v = self.head_v(emb).astype(jnp.float32) / self.temp
                    n = self.head_n(emb).astype(jnp.float32) / self.temp
                    return (v, n)
                logits = self.head_cls(emb).astype(jnp.float32) / self.temp

        # ---- order pretraining branch (reference lib/models/vit.py:325-352) ----
        if self.match_lang_emb and text is not None and train:
            teacher = self.get_pseudo_labels(text, label_emb)  # [B*M, K]

            _, mask_inds, mse_pair, intermediate = self.order_tfm.pretrain(video_emb)

            inter_emb = _l2norm(intermediate)
            inter_pred = jnp.einsum(
                "bc,kc->bk", inter_emb, label_emb.astype(inter_emb.dtype),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) / self.temp

            # teacher logits of the masked-out clip, tiled across levels
            M = self.order_max_len
            B = teacher.shape[0] // M
            onehot = (jnp.arange(M)[None, :] == mask_inds[:, None]).astype(teacher.dtype)
            masked_teacher = jnp.einsum(
                "bmk,bm->bk", teacher.reshape(B, M, -1), onehot
            )
            inter_teacher = jnp.tile(masked_teacher, (self.order_tfm_layers, 1))

            # random recognition subset to bound memory
            # (reference lib/models/vit.py:345-347)
            n_total = logits.shape[0]
            n_keep = min(batch_size * self.order_recog_batch, n_total)
            perm = jax.random.permutation(self.make_rng("subset"), n_total)[:n_keep]
            student = jnp.concatenate([logits[perm], inter_pred], axis=0)
            teacher_out = jnp.concatenate([teacher[perm], inter_teacher], axis=0)
            return student, teacher_out, mse_pair

        if not train:
            if isinstance(logits, tuple):
                return logits
            return jax.nn.softmax(logits, axis=-1)
        return logits
