"""Precise-BN recomputation (reference ``lib/utils/bn_helper.py:10-76``).

During training the running BN statistics lag the weights; precise BN
re-estimates them with frozen weights over ``num_batches`` loader batches.

The reference mutates layer momentum in place (sets it to 1.0 so each
forward leaves exactly the batch stats in ``running_*``) and averages.  The
functional equivalent here inverts the momentum update analytically: one
train-mode ``apply`` with ``mutable=['batch_stats']`` produces
``new = (1-m)*old + m*batch``, so ``batch = (new - (1-m)*old) / m`` — exact
recovery of the per-batch statistics without touching module state.  The
precise stats then follow the reference's streaming average:
``mean = avg_i(mean_i)``, ``var = avg_i(var_i + mean_i^2) - mean^2``.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def recover_batch_stats(old_stats, new_stats, momentum: float = 0.1):
    """Invert one running-average update to get the raw batch statistics."""
    return jax.tree_util.tree_map(
        lambda new, old: (new - (1.0 - momentum) * old) / momentum,
        new_stats, old_stats,
    )


def compute_precise_bn_stats(
    apply_train_stats: Callable,
    model_state,
    batches: Iterable,
    num_batches: int = 200,
    momentum: float = 0.1,
):
    """Recompute BN running statistics over ``num_batches`` batches.

    ``apply_train_stats(model_state, batch) -> new_model_state`` must run a
    train-mode forward that updates the ``batch_stats`` collection (weights
    frozen — no optimizer step).  Returns the precise ``model_state``.
    """
    mean_acc = None
    sq_acc = None  # running E[x^2] accumulator per BN leaf pair
    n = 0
    for batch in batches:
        if n >= num_batches:
            break
        new_state = apply_train_stats(model_state, batch)
        bstats = recover_batch_stats(model_state, new_state, momentum)
        n += 1
        if mean_acc is None:
            mean_acc = jax.tree_util.tree_map(jnp.zeros_like, bstats)
            sq_acc = jax.tree_util.tree_map(jnp.zeros_like, bstats)
        # streaming average (reference bn_helper.py:62-69)
        mean_acc = jax.tree_util.tree_map(
            lambda acc, b: acc + (b - acc) / n, mean_acc, bstats
        )
        # for the 'var' leaves we need var + mean^2; build that tree
        sq_tree = _var_plus_mean_sq(bstats)
        sq_acc = jax.tree_util.tree_map(
            lambda acc, b: acc + (b - acc) / n, sq_acc, sq_tree
        )
    if mean_acc is None:
        return model_state
    return _finalize(mean_acc, sq_acc)


def _is_bn_leaf_dict(d) -> bool:
    return isinstance(d, dict) and set(d.keys()) == {"mean", "var"}


def _var_plus_mean_sq(tree):
    if _is_bn_leaf_dict(tree):
        return {"mean": tree["mean"], "var": tree["var"] + tree["mean"] ** 2}
    if isinstance(tree, dict):
        return {k: _var_plus_mean_sq(v) for k, v in tree.items()}
    return tree


def _finalize(mean_acc, sq_acc):
    """var = E[x^2] - E[x]^2 per BN (reference bn_helper.py:71-74)."""
    if _is_bn_leaf_dict(mean_acc):
        m = mean_acc["mean"]
        return {"mean": m, "var": sq_acc["var"] - m ** 2}
    if isinstance(mean_acc, dict):
        return {
            k: _finalize(mean_acc[k], sq_acc[k]) for k in mean_acc
        }
    return mean_acc


def aggregate_sub_bn_stats(model_state):
    """Collapse per-split BN statistics to aggregated single-set stats
    (reference ``lib/utils/misc.py:254-269`` +
    ``SubBatchNorm3d.aggregate_stats``, ``batchnorm_helper.py:83-95``).

    Our :class:`VideoBatchNorm` derives the aggregate on the fly at eval,
    so training never needs this; it exists for exporting a split-stat
    checkpoint as plain-BN statistics.  Returns (new_model_state,
    num_aggregated)."""
    import numpy as np

    count = 0

    def walk(tree):
        nonlocal count
        if isinstance(tree, dict) and set(tree.keys()) == {"mean", "var"}:
            mean, var = tree["mean"], tree["var"]
            if hasattr(mean, "ndim") and mean.ndim == 2:
                count += 1
                agg_mean = mean.mean(axis=0)
                agg_var = var.mean(axis=0) + ((mean - agg_mean) ** 2).mean(axis=0)
                return {"mean": agg_mean, "var": agg_var}
            return tree
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(model_state), count
