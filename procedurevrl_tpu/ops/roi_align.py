"""ROIAlign in pure XLA, channels-last.

The reference's detection path calls ``head_helper.ResNetRoIHead`` —
a class that does not exist in the fork (``video_model_builder.py:350,576``
vs ``head_helper.py``, which only defines the classification heads), so the
reference cannot run detection at all.  This implements the intended
upstream-PySlowFast capability: ROIAlign (Mask R-CNN, arXiv:1703.06870)
with the ``aligned=True`` half-pixel-offset correction used by
``cfg.DETECTION.ALIGNED``.

TPU design notes:
- boxes are [N, 5] ``(batch_idx, x1, y1, x2, y2)`` (the reference's AVA
  box format); per-box batch selection is a gather over the batch axis;
- each output bin averages a **static** ``sampling_ratio x
  sampling_ratio`` grid of bilinear samples (torchvision's adaptive
  ``ceil(roi/out)`` sampling count is data-dependent and would force
  dynamic shapes under jit; a fixed grid keeps one compiled kernel);
- bilinear interpolation is expressed as four gathers + a weighted sum,
  fully vectorized over (boxes, bins, samples) — no Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(features: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample ``features`` [H, W, C] at fractional (y, x) points [...].

    Out-of-range points clamp (matching ROIAlign's behavior after its
    empty-bin guard for the in-image boxes AVA uses)."""
    h, w, _ = features.shape
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy1 = y - y0
    wx1 = x - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    f00 = features[y0i, x0i]
    f01 = features[y0i, x1i]
    f10 = features[y1i, x0i]
    f11 = features[y1i, x1i]
    w00 = ((1 - wy1) * (1 - wx1))[..., None]
    w01 = ((1 - wy1) * wx1)[..., None]
    w10 = (wy1 * (1 - wx1))[..., None]
    w11 = (wy1 * wx1)[..., None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    output_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """ROIAlign over channels-last features.

    Args:
        features: [B, H, W, C].
        boxes: [N, 5] rows ``(batch_idx, x1, y1, x2, y2)`` in input-image
            coordinates.
        output_size: output bins per side.
        spatial_scale: feature-map stride reciprocal (1 / SPATIAL_SCALE_FACTOR).
        sampling_ratio: static bilinear samples per bin side.
        aligned: subtract the half-pixel offset (``DETECTION.ALIGNED``).

    Returns: [N, output_size, output_size, C].
    """
    offset = 0.5 if aligned else 0.0
    idx = boxes[:, 0].astype(jnp.int32)
    x1 = boxes[:, 1] * spatial_scale - offset
    y1 = boxes[:, 2] * spatial_scale - offset
    x2 = boxes[:, 3] * spatial_scale - offset
    y2 = boxes[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: force malformed ROIs to be 1x1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio
    # sample-point offsets inside a bin: (k + 0.5)/s for k in [0, s)
    frac = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    # ys: [N, out, s] -> y1 + (bin + frac) * bin_h
    bins = jnp.arange(output_size, dtype=features.dtype)
    ys = (y1[:, None, None]
          + (bins[None, :, None] + frac[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (bins[None, :, None] + frac[None, None, :]) * bin_w[:, None, None])
    # grid: [N, out, s, out, s]
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (ys.shape[0], output_size, s, output_size, s))
    xx = jnp.broadcast_to(xx, (ys.shape[0], output_size, s, output_size, s))

    per_box_feats = features[idx]  # [N, H, W, C]
    sampled = jax.vmap(_bilinear)(per_box_feats, yy, xx)
    # average the s*s samples per bin
    return sampled.mean(axis=(2, 4))
