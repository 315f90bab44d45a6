"""Accuracy metrics (reference ``lib/utils/metrics.py:10-130,268``).

Functions take logits/probabilities as jnp or np arrays and return python
floats (or traced scalars when called inside jit — all ops are jnp).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def topks_correct(preds, labels, ks: Sequence[int]):
    """Number of top-k-correct predictions for each k
    (reference ``lib/utils/metrics.py:10-43``).

    Uses ``lax.top_k`` (partial selection) instead of a full argsort — the
    pretraining step computes this over 9871 classes every iteration.
    k values are clamped to the class count."""
    preds = jnp.asarray(preds)
    ks = [min(k, preds.shape[1]) for k in ks]
    max_k = max(ks)
    _, top_inds = jax.lax.top_k(preds, max_k)  # [B, max_k]
    correct = top_inds == jnp.asarray(labels)[:, None]
    return [jnp.sum(correct[:, :k]).astype(jnp.float32) for k in ks]


def topk_errors(preds, labels, ks: Sequence[int]):
    num_correct = topks_correct(preds, labels, ks)
    return [(1.0 - x / preds.shape[0]) * 100.0 for x in num_correct]


def topk_accuracies(preds, labels, ks: Sequence[int]):
    num_correct = topks_correct(preds, labels, ks)
    return [(x / preds.shape[0]) * 100.0 for x in num_correct]


def multitask_topks_correct(preds: Tuple, labels: Tuple, ks: Sequence[int]):
    """Joint (verb, noun) top-k: a sample counts when *both* tasks have the
    true label inside their top-k (reference ``lib/utils/metrics.py:69-103``)."""
    min_cls = min(jnp.asarray(p).shape[1] for p in preds)
    ks = [min(k, min_cls) for k in ks]
    max_k = max(ks)
    joint = None
    for p, l in zip(preds, labels):
        _, top_inds = jax.lax.top_k(jnp.asarray(p), max_k)  # [B, max_k]
        correct = top_inds == l[:, None]  # [B, max_k]
        # cumulative "within top-j" per sample
        within = jnp.cumsum(correct, axis=1) > 0  # [B, max_k]
        joint = within if joint is None else (joint & within)
    return [jnp.sum(joint[:, k - 1]).astype(jnp.float32) for k in ks]


def multitask_topk_accuracies(preds: Tuple, labels: Tuple, ks: Sequence[int]):
    num_correct = multitask_topks_correct(preds, labels, ks)
    return [(x / preds[0].shape[0]) * 100.0 for x in num_correct]


def retrieval_metrics(similarity) -> dict:
    """Text->video retrieval R@1/5/10 and median rank from a similarity
    matrix (reference ``tools/train_net.py:33-45``; row i's positive is
    column i)."""
    import numpy as np

    x = np.asarray(similarity)
    sx = np.sort(-x, axis=1)
    d = -np.diag(x)[:, None]
    ind = np.where(sx - d == 0)[1]
    return {
        "R1": float(np.sum(ind == 0)) / len(ind),
        "R5": float(np.sum(ind < 5)) / len(ind),
        "R10": float(np.sum(ind < 10)) / len(ind),
        "MR": float(np.median(ind)) + 1,
    }


def mean_class_recall(preds, labels, num_classes: int):
    """Macro-averaged per-class recall (reference ``lib/utils/metrics.py:268``)."""
    pred_cls = jnp.argmax(preds, axis=1)
    correct = (pred_cls == labels).astype(jnp.float32)
    per_class_correct = jnp.zeros(num_classes).at[labels].add(correct)
    per_class_total = jnp.zeros(num_classes).at[labels].add(1.0)
    recall = per_class_correct / jnp.maximum(per_class_total, 1.0)
    present = per_class_total > 0
    return jnp.sum(jnp.where(present, recall, 0.0)) / jnp.maximum(
        jnp.sum(present), 1
    ) * 100.0
