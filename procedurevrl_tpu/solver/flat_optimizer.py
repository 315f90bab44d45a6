"""Single-fusion flat Adam/AdamW (TPU extension; the reference keeps
torch's per-tensor optimizer loop, ``lib/models/optimizer.py:10-118``).

Why: the round-4 step profile shows the per-parameter optimizer "swarm"
— one XLA fusion per parameter tensor, ~190 tensors x (adam scaling +
decay + LR scale) — costing 24.7 ms/step on MViT-v2-S (388 fusions,
~10 % of the step) against a ~1.2 ms HBM roofline for the same traffic:
small fusions are launch/DMA-latency-bound, not bandwidth-bound.  This
module runs the whole update as ONE fused elementwise pass over a single
flat [P] buffer.

Differences from round-1's rejected ``optax.flatten`` probe (51.1 vs
53.3 clips/sec, see ``solver/optimizer.py``): no generic ravel_pytree
machinery and no per-group transform chains — the per-group weight decay
and LR multipliers are baked into two PRECOMPUTED flat coefficient
vectors at init (frozen params get ``lr_mult = 0``), so the marshalling
per step is exactly one grad concat in and one update split out.

Numerics match the per-leaf optax chain exactly (same op order:
``scale_by_adam`` bias correction, then decoupled/coupled decay, then
``-lr_mult * lr(t)``); the only state difference is that frozen leaves'
moments accumulate here (their update is still zeroed by the
coefficient), so ``set_to_zero`` checkpoints are not bit-compatible —
parameter trajectories are.

Scope: adam/adamw with float32 moments; SGD and bf16 moments keep the
per-leaf path (``construct_optimizer`` gates).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FlatAdamState(NamedTuple):
    count: jax.Array      # int32 step counter (optax convention)
    m: jax.Array          # [P] float32 first moment
    v: jax.Array          # [P] float32 second moment


def _leaf_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [("/".join(getattr(k, "key", str(k)) for k in path), leaf)
            for path, leaf in flat]


def flat_adam(params, group_of: Callable[[str], str], wd_of: dict,
              mult_of: dict, sched: Callable, *, decoupled_wd: bool,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              ) -> optax.GradientTransformation:
    """One-fusion Adam/AdamW over the flat parameter vector.

    ``group_of(path)`` labels each leaf; ``wd_of``/``mult_of`` map labels
    to weight decay / LR multiplier ('frozen' label = update zeroed).
    ``decoupled_wd`` selects adamw (decay added to the scaled update) vs
    adam (decay added to the gradient before moment updates)."""
    paths = _leaf_paths(params)
    sizes = [int(np.prod(leaf.shape)) for _, leaf in paths]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    # pad to a multiple of 1024: keeps the flat buffers lane-aligned and
    # divisible by any mesh data axis, so zero1_state_shardings can shard
    # the [P] moments (coefficients in the pad are 0 -> pad stays 0)
    P = (offsets[-1] + 1023) // 1024 * 1024
    pad = P - offsets[-1]

    # per-leaf scalar coefficients (NOT materialized [P] numpy constants:
    # those get baked into the HLO as ~P*4-byte literals — a 121M-param
    # model produced a ~1 GB compile request, rejected by the axon tunnel
    # with HTTP 413; jnp.full segments embed only scalars and XLA fuses
    # the concat into the elementwise update)
    wd_c, mult_c = [], []
    for (path, _) in paths:
        g = group_of(path)
        wd_c.append(0.0 if g == "frozen" else float(wd_of[g]))
        mult_c.append(0.0 if g == "frozen" else float(mult_of[g]))

    def coeff_vec(values):
        parts = [jnp.full((s,), c, jnp.float32)
                 for s, c in zip(sizes, values)]
        if pad:
            parts.append(jnp.zeros((pad,), jnp.float32))
        return jnp.concatenate(parts)

    def flatten(tree):
        parts = [jnp.ravel(x).astype(jnp.float32)
                 for x in jax.tree_util.tree_leaves(tree)]
        if pad:
            parts.append(jnp.zeros((pad,), jnp.float32))
        return jnp.concatenate(parts)

    def split_like(flat, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        outs = []
        for leaf, size, off in zip(leaves, sizes, offsets):
            outs.append(jax.lax.dynamic_slice_in_dim(flat, off, size)
                        .reshape(leaf.shape).astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, outs)

    def init_fn(params):
        del params
        return FlatAdamState(
            count=jnp.zeros([], jnp.int32),
            m=jnp.zeros((P,), jnp.float32),
            v=jnp.zeros((P,), jnp.float32),
        )

    def update_fn(updates, state, params=None):
        wd_vec = coeff_vec(wd_c)
        mult_vec = coeff_vec(mult_c)
        g = flatten(updates)
        p = flatten(params)
        if not decoupled_wd:          # adam: coupled decay on the grad
            g = g + wd_vec * p
        count = optax.safe_int32_increment(state.count)
        m = (1.0 - b1) * g + b1 * state.m
        v = (1.0 - b2) * jnp.square(g) + b2 * state.v
        t = count.astype(jnp.float32)
        m_hat = m / (1.0 - jnp.power(b1, t))
        v_hat = v / (1.0 - jnp.power(b2, t))
        upd = m_hat / (jnp.sqrt(v_hat) + eps)
        if decoupled_wd:              # adamw: decay added to the update
            upd = upd + wd_vec * p
        upd = upd * (-mult_vec * sched(state.count))
        return split_like(upd, updates), FlatAdamState(count, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


class FusedAdamState(NamedTuple):
    count: jax.Array
    m: dict               # param-tree-shaped float32 first moments
    v: dict               # param-tree-shaped float32 second moments


def fused_adam(params, group_of: Callable[[str], str], wd_of: dict,
               mult_of: dict, sched: Callable, *, decoupled_wd: bool,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               ) -> optax.GradientTransformation:
    """Per-leaf SINGLE-EXPRESSION Adam/AdamW (``TPU.FUSED_OPT``).

    Same per-leaf structure as the default optax chain but the whole
    update (moments + bias correction + decay + LR) is one expression per
    parameter, so XLA emits ONE fusion per leaf instead of one per chain
    stage (the round-4 profile shows 388 optimizer fusions for ~194
    leaves at ~64 us each).  No flat marshalling — the flat [P] variant
    (``flat_adam``) measured a large e2e NEGATIVE from its concat/split
    traffic; this keeps zero extra HBM passes.  Trajectories match the
    chain exactly (shared tests)."""
    paths = _leaf_paths(params)
    coeffs = []
    for path, _ in paths:
        g = group_of(path)
        if g == "frozen":
            coeffs.append((0.0, 0.0))
        else:
            coeffs.append((float(wd_of[g]), float(mult_of[g])))

    def _tree_of(values, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        return jax.tree_util.tree_unflatten(treedef, list(values))

    def init_fn(params):
        zeros = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.copy, zeros),
        )

    def update_fn(updates, state, params=None):
        count = optax.safe_int32_increment(state.count)
        t = count.astype(jnp.float32)
        c1 = 1.0 - jnp.power(b1, t)
        c2 = 1.0 - jnp.power(b2, t)
        lr = sched(state.count)

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        p_leaves = jax.tree_util.tree_leaves(params)
        m_leaves = jax.tree_util.tree_leaves(state.m)
        v_leaves = jax.tree_util.tree_leaves(state.v)

        us, ms, vs = [], [], []
        for g, p, m, v, (wd, mult) in zip(g_leaves, p_leaves, m_leaves,
                                          v_leaves, coeffs):
            gf = g.astype(jnp.float32)
            if not decoupled_wd and wd:
                gf = gf + wd * p.astype(jnp.float32)
            m2 = b1 * m + (1.0 - b1) * gf
            v2 = b2 * v + (1.0 - b2) * jnp.square(gf)
            u = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            if decoupled_wd and wd:
                u = u + wd * p.astype(jnp.float32)
            us.append(((-mult) * lr * u).astype(g.dtype))
            ms.append(m2)
            vs.append(v2)
        return (jax.tree_util.tree_unflatten(treedef, us),
                FusedAdamState(count, _tree_of(ms, state.m),
                               _tree_of(vs, state.v)))

    return optax.GradientTransformation(init_fn, update_fn)
