"""Optimizer construction with the reference's param-group rules
(reference ``lib/models/optimizer.py:10-118``), as optax transforms.

Group assignment is by parameter *path* in the flax tree, mirroring the
reference's name matching:

- finetune (``TRAIN.MULT != 1`` or ``TRAIN.LINEAR``): paths containing
  ``head`` or ``order`` are the trainable group (wd = SOLVER.WEIGHT_DECAY,
  lr_mult 1); everything else is the encoder group — frozen under LINEAR,
  otherwise wd = BN.WEIGHT_DECAY with lr_mult = TRAIN.MULT
  (reference ``:20-41``);
- pretraining: ``bn`` params get BN.WEIGHT_DECAY; ``text_model`` params are
  frozen when MULT == 0 and lr-scaled by MULT otherwise; the rest get
  SOLVER.WEIGHT_DECAY (reference ``:42-88``).

Weight decay is *coupled* (added to the gradient) for sgd/adam, matching
torch, and decoupled for adamw.  The per-iteration LR lives inside the
compiled step via ``optax.scale_by_schedule`` instead of the reference's
host-side ``set_lr`` (``:132-143``).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def _group_of(path: str, cfg) -> str:
    """Group label for one parameter path ('a/b/c').

    The reference additionally freezes via ``requires_grad=False`` (which
    silently drops those params from updates regardless of optim group):
    the CLIP text tower always (reference ``lib/models/vit.py:261``) and the
    512-d projection ``head`` during finetuning (``:244,248``); replicated
    here as the 'frozen' label (optax zero updates — also prevents weight
    decay, matching torch where no grad means no decay).
    """
    if "text_model" in path or "text_module" in path:
        return "frozen"
    finetune = cfg.TRAIN.MULT != 1.0 or cfg.TRAIN.LINEAR
    if finetune:
        is_pretrain_head = cfg.TRAIN.LABEL_EMB != ""
        if path.startswith("head/") and not is_pretrain_head:
            return "frozen"
        if "head" in path or "order" in path:
            return "heads"
        return "frozen" if cfg.TRAIN.LINEAR else "encoder"
    if cfg.TRAIN.LABEL_EMB == "" and path.startswith("head/"):
        return "frozen"
    if "bn" in path:
        return "bn"
    return "main"


def stop_frozen_gradients(params, cfg):
    """stop_gradient every 'frozen'-group leaf — the computational
    equivalent of torch ``requires_grad=False`` (reference
    ``lib/models/vit.py:244-261``): the backward never emits the frozen
    subtree's wgrad (or, for a fully frozen encoder, any of its dgrads),
    instead of computing full gradients and zeroing the *update* as
    ``optax.set_to_zero`` alone does.  For the COIN linear probes
    (TRAIN.LINEAR) this deletes the entire encoder backward — measured
    2.7x on the full-size step (BASELINE.md round 5: 224.7 vs 83.1
    clips/sec/chip).  Group labels are
    the same ``_group_of`` the optimizer masks with, so update semantics
    are unchanged; ``grad_norm`` then covers exactly the parameters torch
    would count (those with grads)."""
    def f(path, p):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if _group_of(name, cfg) == "frozen":
            return jax.lax.stop_gradient(p)
        return p

    return jax.tree_util.tree_map_with_path(f, params)


def _adam_scaling(cfg) -> optax.GradientTransformation:
    """scale_by_adam with the configured moment storage dtype
    (``TPU.MOMENT_DTYPE``; bf16 moments via solver/low_precision)."""
    if cfg.TPU.MOMENT_DTYPE == "bfloat16":
        from procedurevrl_tpu.solver.low_precision import scale_by_adam_lp

        return scale_by_adam_lp(b1=0.9, b2=0.999, eps=1e-8, seed=cfg.RNG_SEED)
    assert cfg.TPU.MOMENT_DTYPE == "float32", cfg.TPU.MOMENT_DTYPE
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def _core(cfg, wd: float, lr_mult: float, sched: Callable) -> optax.GradientTransformation:
    method = cfg.SOLVER.OPTIMIZING_METHOD
    neg = lambda s: -lr_mult * sched(s)
    if method == "sgd":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        if cfg.SOLVER.MOMENTUM:
            parts.append(
                optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)
            )
        parts.append(optax.scale_by_schedule(neg))
        return optax.chain(*parts)
    if method == "adam":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts += [_adam_scaling(cfg), optax.scale_by_schedule(neg)]
        return optax.chain(*parts)
    if method == "adamw":
        return optax.chain(
            _adam_scaling(cfg),
            optax.add_decayed_weights(wd),
            optax.scale_by_schedule(neg),
        )
    raise NotImplementedError(f"Does not support {method} optimizer")


def construct_optimizer(params, cfg, sched: Callable) -> optax.GradientTransformation:
    """Build the optax transform for a param tree.

    Args:
        params: the flax param tree (used only for group labelling).
        cfg: config node.
        sched: step -> LR function (see ``lr_policy.lr_schedule``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups = set()
    for path, _ in flat:
        p = "/".join(getattr(k, "key", str(k)) for k in path)
        groups.add(_group_of(p, cfg))

    wd_of = {
        "heads": cfg.SOLVER.WEIGHT_DECAY,
        "encoder": cfg.BN.WEIGHT_DECAY,
        "bn": cfg.BN.WEIGHT_DECAY,
        "text": cfg.SOLVER.WEIGHT_DECAY,
        "main": cfg.SOLVER.WEIGHT_DECAY,
    }
    mult_of = {
        "heads": 1.0,
        "encoder": cfg.TRAIN.MULT,
        "bn": 1.0,
        "text": cfg.TRAIN.MULT,
        "main": 1.0,
    }
    # TPU.FLAT_OPT: single-fusion flat adam/adamw (solver/flat_optimizer).
    # Round-1 rejected optax.flatten (51.1 vs 53.3 clips/sec: generic
    # ravel_pytree + per-group chains); the round-4 profile showed the
    # per-leaf swarm at 24.7 ms/step vs a ~1.2 ms roofline, so the
    # hand-rolled flat path (precomputed wd/lr-mult coefficient vectors,
    # one concat in / one split out) re-opens the question.
    if (cfg.TPU.FLAT_OPT
            and cfg.SOLVER.OPTIMIZING_METHOD in ("adam", "adamw")
            and cfg.TPU.MOMENT_DTYPE == "float32"):
        from procedurevrl_tpu.solver.flat_optimizer import flat_adam

        return flat_adam(
            params, lambda p: _group_of(p, cfg), wd_of, mult_of, sched,
            decoupled_wd=cfg.SOLVER.OPTIMIZING_METHOD == "adamw",
        )
    # TPU.FUSED_OPT: per-leaf single-expression update — one XLA fusion
    # per parameter instead of one per optax chain stage, zero extra HBM
    # traffic (the flat [P] variant above measured a large e2e negative
    # from its concat/split marshalling)
    if (cfg.TPU.FUSED_OPT
            and cfg.SOLVER.OPTIMIZING_METHOD in ("adam", "adamw")
            and cfg.TPU.MOMENT_DTYPE == "float32"):
        from procedurevrl_tpu.solver.flat_optimizer import fused_adam

        return fused_adam(
            params, lambda p: _group_of(p, cfg), wd_of, mult_of, sched,
            decoupled_wd=cfg.SOLVER.OPTIMIZING_METHOD == "adamw",
        )

    transforms = {}
    for g in groups:
        if g == "frozen":
            transforms[g] = optax.set_to_zero()
        else:
            # NOT optax.flatten: the ravel/concat of all grads per step
            # measured slower than the per-parameter update swarm it
            # replaces (51.1 vs 53.3 clips/sec/chip on the v5e bench)
            transforms[g] = _core(cfg, wd_of[g], mult_of[g], sched)

    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _group_of(
                "/".join(getattr(k, "key", str(k)) for k in path), cfg
            ),
            tree,
        )

    return optax.multi_transform(transforms, label_fn)
