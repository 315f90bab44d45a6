"""Loss functions.

Pins the semantics the reference actually trains with
(reference ``tools/train_net.py:129-173`` and ``lib/models/losses.py``):

- pretraining: ``KLDivLoss(reduction='batchmean')`` between
  ``log_softmax(student)`` and a top-k-sharpened teacher distribution, plus
  ``MSELoss(reduction='mean')`` on the diffusion (target, prediction) pair;
- finetuning: mean cross-entropy, label-smoothing CE (0.2, 'smooth'),
  or soft-target CE under mixup; EPIC uses ``0.5*(CE_verb + CE_noun)``;
- MIL-NCE (reference ``lib/models/losses.py:11-23``), available unwired
  exactly as in the reference.

All reductions are over the *global* batch: under pjit with the batch
sharded over the data axis, the means below compile to per-chip partial
sums + an ICI psum — the TPU equivalent of DDP's gradient all-reduce.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_sharpen(probs: jax.Array, k: int) -> jax.Array:
    """Keep entries equal to one of the top-k values, renormalize
    (reference ``tools/train_net.py:156-158``)."""
    if k == 0:
        return probs
    topv = jax.lax.top_k(probs, k)[0]  # [B, k]
    keep = (probs[:, None, :] == topv[:, :, None]).astype(probs.dtype)
    sharpened = jnp.sum(probs[:, None, :] * keep, axis=1)
    return sharpened / jnp.sum(sharpened, axis=1, keepdims=True)


def kl_div_batchmean(log_pred: jax.Array, target_probs: jax.Array) -> jax.Array:
    """torch ``KLDivLoss(reduction='batchmean')``: sum(t*(log t - x)) / B,
    with 0*log(0) := 0."""
    t = target_probs
    logt = jnp.where(t > 0, jnp.log(jnp.where(t > 0, t, 1.0)), 0.0)
    pointwise = jnp.where(t > 0, t * (logt - log_pred), 0.0)
    return jnp.sum(pointwise) / log_pred.shape[0]


def pretrain_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    mse_pair: Tuple[jax.Array, jax.Array],
    topk: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """KL(student || sharpened teacher) + diffusion MSE.

    Returns (total, kl, mse)."""
    teacher = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
    teacher = jax.lax.stop_gradient(topk_sharpen(teacher, topk))
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
    kl = kl_div_batchmean(logp, teacher)
    mse = jnp.mean(
        (mse_pair[0].astype(jnp.float32) - mse_pair[1].astype(jnp.float32)) ** 2
    )
    return kl + mse, kl, mse


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch; integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_cross_entropy(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.2
) -> jax.Array:
    """timm ``LabelSmoothingCrossEntropy`` (reference ``tools/train_net.py:130``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_cross_entropy(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    """timm ``SoftTargetCrossEntropy`` (mixup path)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-target_probs * logp, axis=-1))


def bce(probs: jax.Array, targets: jax.Array) -> jax.Array:
    eps = 1e-12
    p = jnp.clip(probs.astype(jnp.float32), eps, 1 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))


def bce_logit(logits: jax.Array, targets: jax.Array) -> jax.Array:
    x = logits.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(x, 0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    )


def milnce(video_emb: jax.Array, text_emb: jax.Array) -> jax.Array:
    """MIL-NCE over candidate narrations (reference ``lib/models/losses.py:11-23``).

    video_emb: [B, C]; text_emb: [B, n_cand, C] or [B, C].
    """
    if text_emb.ndim == 2:
        text_emb = text_emb[:, None, :]
    x = jnp.einsum("bc,knc->bkn", video_emb, text_emb,
                   preferred_element_type=jnp.float32)
    x = x.reshape(x.shape[0], -1)  # [B, B*n]
    B, n = video_emb.shape[0], text_emb.shape[1]
    # positives: the diagonal block (own narrations)
    pos_mask = (
        jnp.arange(x.shape[1])[None, :] // n == jnp.arange(B)[:, None]
    )
    nominator = jax.scipy.special.logsumexp(
        jnp.where(pos_mask, x, -jnp.inf), axis=1
    )
    denominator = jax.scipy.special.logsumexp(x, axis=1)
    return jnp.mean(denominator - nominator)


def epic_loss(
    verb_logits: jax.Array,
    noun_logits: jax.Array,
    verb_labels: jax.Array,
    noun_labels: jax.Array,
    loss_fn=cross_entropy,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """0.5*(verb + noun) (reference ``tools/train_net.py:166-169``)."""
    lv = loss_fn(verb_logits, verb_labels)
    ln = loss_fn(noun_logits, noun_labels)
    return 0.5 * (lv + ln), lv, ln


def get_loss_func(name: str):
    """Loss registry (reference ``lib/models/losses.py:45-50``)."""
    return {
        "cross_entropy": cross_entropy,
        "smooth": label_smoothing_cross_entropy,
        "bce": bce,
        "bce_logit": bce_logit,
        "milnce": milnce,
        "soft_target": soft_target_cross_entropy,
    }[name]
