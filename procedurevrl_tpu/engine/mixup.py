"""Device-side Mixup/CutMix (timm semantics, batch mode).

The reference applies timm's ``Mixup`` on device per batch for EPIC/COIN
finetuning (reference ``tools/train_net.py:138-142``, ``lib/datasets/mixup.py:97``).
Here it is a pure function of an explicit PRNG key so it can live inside the
compiled train step — a traced ``Beta`` draw and an iota-mask cut box instead
of host-side numpy, keeping shapes static for XLA.

Batch mode only (one lambda per batch), which is what the shipped configs
use (``MIXUP.MODE = "batch"``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jax.Array, num_classes: int, smoothing: float) -> jax.Array:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return oh * (on - off) + off


class Mixup:
    def __init__(
        self,
        mixup_alpha: float = 0.8,
        cutmix_alpha: float = 1.0,
        prob: float = 1.0,
        switch_prob: float = 0.5,
        label_smoothing: float = 0.1,
        num_classes: int = 1000,
    ):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def _cut_box_mask(self, key, h: int, w: int, lam: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Random box covering (1-lam) of the area; returns (mask [h, w],
        corrected lam). timm ``rand_bbox`` semantics."""
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * ratio).astype(jnp.int32)
        cut_w = (w * ratio).astype(jnp.int32)
        ky, kx = jax.random.split(key)
        cy = jax.random.randint(ky, (), 0, h)
        cx = jax.random.randint(kx, (), 0, w)
        y0 = jnp.clip(cy - cut_h // 2, 0, h)
        y1 = jnp.clip(cy + cut_h // 2, 0, h)
        x0 = jnp.clip(cx - cut_w // 2, 0, w)
        x1 = jnp.clip(cx + cut_w // 2, 0, w)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        box = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)
        lam_corrected = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (h * w)
        return box, lam_corrected

    def __call__(self, key: jax.Array, frames: jax.Array, labels: jax.Array):
        """frames: [..., H, W, C] with batch leading; labels: [B] int.

        Returns (mixed_frames, soft_targets [B, num_classes])."""
        k_apply, k_switch, k_lam, k_box = jax.random.split(key, 4)
        apply = jax.random.uniform(k_apply) < self.prob
        use_cutmix = (
            jax.random.uniform(k_switch) < self.switch_prob
            if self.cutmix_alpha > 0.0 and self.mixup_alpha > 0.0
            else jnp.asarray(self.mixup_alpha <= 0.0)
        )
        alpha = jnp.where(use_cutmix, self.cutmix_alpha, self.mixup_alpha)
        lam = jax.random.beta(k_lam, alpha, alpha)

        flipped = jnp.flip(frames, axis=0)
        h, w = frames.shape[-3], frames.shape[-2]
        box, lam_cut = self._cut_box_mask(k_box, h, w, lam)
        box_b = box[..., None].astype(frames.dtype)  # [H, W, 1]

        mixed_mix = lam * frames + (1.0 - lam) * flipped
        mixed_cut = frames * (1.0 - box_b) + flipped * box_b
        mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix.astype(frames.dtype))
        lam_eff = jnp.where(use_cutmix, lam_cut, lam)

        lam_eff = jnp.where(apply, lam_eff, 1.0)
        mixed = jnp.where(apply, mixed, frames)

        y1 = one_hot_smooth(labels, self.num_classes, self.label_smoothing)
        y2 = one_hot_smooth(
            jnp.flip(labels, axis=0), self.num_classes, self.label_smoothing
        )
        soft = lam_eff * y1 + (1.0 - lam_eff) * y2
        return mixed, soft
