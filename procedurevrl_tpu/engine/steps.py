"""Compiled train / eval steps.

One ``train_step = jit(grad(loss))`` per config — the TPU-native equivalent
of the reference's per-iteration python loop body
(reference ``tools/train_net.py:101-247``).  Differences by design:

- the per-iteration LR is a traced schedule inside the step (no host sync);
- gradient accumulation to GLOBAL_BATCH_SIZE streams micro-batches through
  a compiled ``grad_step`` into a device-resident accumulator and applies
  with ``apply_step`` (same mean-of-microbatch-grads semantics as reference
  ``tools/train_net.py:176-192`` — grads divided by num_iters — without
  staging [accum, B, ...] video in HBM);
- DDP's all-reduce becomes the psum XLA inserts for the global-mean loss
  when the batch is sharded over the ``data`` mesh axis;
- metric all-reduce (reference ``:200,216,234``) is free: metrics are
  computed on the global batch inside the jit.

The returned functions are pure; compile them with ``jax.jit`` +
``NamedSharding`` via ``compile_step``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from procedurevrl_tpu.engine import losses as L
from procedurevrl_tpu.engine.mixup import Mixup
from procedurevrl_tpu.parallel.mesh import batch_sharding, replicated
from procedurevrl_tpu.utils import metrics as metrics_lib


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # non-trainable model collections (BatchNorm running statistics for the
    # ResNet/SlowFast/X3D family); None for the BN-free transformer models
    model_state: Any = None

    @classmethod
    def create(
        cls, params, tx: optax.GradientTransformation, model_state: Any = None
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state=model_state,
        )

    @property
    def eval_variables(self) -> Dict[str, Any]:
        """Variables dict for ``model.apply`` at eval time."""
        if self.model_state is None:
            return {"params": self.params}
        return {"params": self.params, "batch_stats": self.model_state}


def normalize_frames(frames: jax.Array, cfg) -> jax.Array:
    """Device-side (x/255 - mean)/std for uint8 frames shipped by the
    TPU.HOST_UINT8 pipeline; float frames pass through (already normalized
    on the host). Fuses into the stem under jit."""
    if frames.dtype != jnp.uint8:
        return frames
    mean = jnp.asarray(cfg.DATA.MEAN, jnp.float32)
    std = jnp.asarray(cfg.DATA.STD, jnp.float32)
    return (frames.astype(jnp.float32) / 255.0 - mean) / std


def _model_rngs(rng: jax.Array, step: jax.Array) -> Dict[str, jax.Array]:
    base = jax.random.fold_in(rng, step)
    names = ("diffusion", "subset", "droppath", "dropout", "mixup")
    keys = jax.random.split(base, len(names))
    return dict(zip(names, keys))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg,
    label_emb: Optional[jnp.ndarray],
    sched: Callable,
    accum_steps: int = 1,
) -> Callable:
    """Build the train step for the task the config selects.

    Batch pytree contract (leading axis = global micro-batch):
        frames: [B, ...] video (layout per model docstring), float32 or
            uint8 (device-normalized);
        labels: [B] int, or verb/noun int arrays for EPIC;
        clip_text_ids / clip_vis_feat: pretraining meta, [B, M, 77]/[B, M, C].

    With ``accum_steps > 1`` the returned function carries ``.grad_step``
    and ``.apply_step`` attributes for the streaming-accumulation loop.
    """
    is_pretrain = cfg.TRAIN.LABEL_EMB != "" and cfg.TRAIN.TEXT != ""
    is_epic = cfg.TRAIN.DATASET == "Epickitchens"
    loss_name = cfg.MODEL.LOSS_FUNC
    topk = cfg.TRAIN.TOPK
    label_emb_dev = None if label_emb is None else jnp.asarray(label_emb)
    mixup_fn = (
        Mixup(
            mixup_alpha=cfg.MIXUP.ALPHA,
            cutmix_alpha=cfg.MIXUP.CUTMIX_ALPHA,
            prob=cfg.MIXUP.PROB,
            switch_prob=cfg.MIXUP.SWITCH_PROB,
            label_smoothing=0.1,
            num_classes=cfg.MODEL.NUM_CLASSES,
        )
        if cfg.MIXUP.ENABLED
        else None
    )

    has_bn = bool(getattr(model, "has_batch_stats", False))

    def apply_train(params, model_state, frames, rngs, **kw):
        """model.apply in train mode, threading BatchNorm running stats
        (the ResNet/SlowFast/X3D family) when the model has them."""
        if not has_bn:
            out = model.apply({"params": params}, frames, train=True,
                              rngs=rngs, **kw)
            return out, model_state
        out, mut = model.apply(
            {"params": params, "batch_stats": model_state}, frames,
            train=True, rngs=rngs, mutable=["batch_stats"], **kw,
        )
        return out, mut["batch_stats"]

    def loss_and_metrics(params, model_state, batch, rngs):
        if not is_pretrain:
            # frozen-group params (COIN linear probe: the whole encoder;
            # any finetune: the 512-d pretrain projection head) take no
            # gradient at all — torch requires_grad=False semantics
            # (solver/optimizer.stop_frozen_gradients).  Pretraining is
            # left untouched: its only frozen group is the CLIP text
            # tower, already stopped at its output
            # (models/procedurevrl.py:157), and skipping keeps the
            # headline step's HLO byte-identical (compile-cache warm).
            from procedurevrl_tpu.solver.optimizer import (
                stop_frozen_gradients,
            )

            params = stop_frozen_gradients(params, cfg)
        frames = normalize_frames(batch["frames"], cfg)
        if is_pretrain:
            meta = {
                "clip_text_ids": batch["clip_text_ids"].reshape(
                    -1, batch["clip_text_ids"].shape[-1]
                ),
                "clip_vis_feat": batch["clip_vis_feat"].reshape(
                    -1, batch["clip_vis_feat"].shape[-1]
                ),
            }
            (student, teacher, mse_pair), new_ms = apply_train(
                params, model_state, frames, rngs,
                text=meta, label_emb=label_emb_dev,
            )
            loss, kl, mse = L.pretrain_loss(student, teacher, mse_pair, topk)
            preds = jax.nn.softmax(student.astype(jnp.float32), axis=1)
            labels = jnp.broadcast_to(
                batch["labels"].reshape(-1)[:1], (preds.shape[0],)
            )
            # topks_correct clamps k to the class count; clamping to the
            # batch size here would silently log top-B for micro-batch < 5
            top1, top5 = metrics_lib.topk_errors(preds, labels, (1, 5))
            return loss, ({"loss": loss, "kl": kl, "mse": mse,
                           "top1_err": top1, "top5_err": top5}, new_ms)
        if is_epic:
            (v, n), new_ms = apply_train(params, model_state, frames, rngs)
            loss_fn = L.get_loss_func(loss_name if loss_name != "kldiv" else "cross_entropy")
            loss, lv, ln = L.epic_loss(
                v, n, batch["verb"], batch["noun"], loss_fn
            )
            v1, v5 = metrics_lib.topk_accuracies(v, batch["verb"], (1, 5))
            n1, n5 = metrics_lib.topk_accuracies(n, batch["noun"], (1, 5))
            a1, a5 = metrics_lib.multitask_topk_accuracies(
                (v, n), (batch["verb"], batch["noun"]), (1, 5)
            )
            return loss, ({"loss": loss, "verb_loss": lv, "noun_loss": ln,
                           "verb_top1_acc": v1, "verb_top5_acc": v5,
                           "noun_top1_acc": n1, "noun_top5_acc": n5,
                           "top1_acc": a1, "top5_acc": a5}, new_ms)
        # plain finetuning (COIN step cls / forecast / task cls)
        labels = batch["labels"].reshape(-1)
        if mixup_fn is not None:
            frames, soft = mixup_fn(rngs["mixup"], frames, labels)
            logits, new_ms = apply_train(params, model_state, frames, rngs)
            loss = L.soft_target_cross_entropy(logits, soft)
        else:
            logits, new_ms = apply_train(params, model_state, frames, rngs)
            if loss_name == "smooth":
                loss = L.label_smoothing_cross_entropy(logits, labels, 0.2)
            else:
                loss = L.get_loss_func(loss_name)(logits, labels)
        top1, top5 = metrics_lib.topk_errors(logits, labels, (1, 5))
        return loss, ({"loss": loss, "top1_err": top1, "top5_err": top5}, new_ms)

    def train_step(state: TrainState, batch, rng: jax.Array):
        """Fused grad + update (the no-accumulation fast path)."""
        rngs = _model_rngs(rng, state.step)
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (metrics, new_ms)), grads = grad_fn(
            state.params, state.model_state, batch, rngs
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["lr"] = sched(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=new_opt, model_state=new_ms),
            metrics,
        )

    if accum_steps == 1:
        return train_step

    # ---- gradient accumulation to GLOBAL_BATCH_SIZE --------------------------
    # (reference tools/train_net.py:176-192: accumulate num_iters micro-batch
    # grads, divide by num_iters, then step). Exposed as (grad, apply) so the
    # host loop streams micro-batches instead of staging [accum, B, ...] video
    # in HBM.

    def grad_step(params, step, grads_acc, batch, rng: jax.Array,
                  model_state=None):
        rngs = _model_rngs(rng, step)
        (_, (metrics, new_ms)), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(params, model_state, batch, rngs)
        grads = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        return grads, metrics, new_ms

    def apply_step(state: TrainState, grads):
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            model_state=state.model_state,
        )

    train_step.grad_step = grad_step
    train_step.apply_step = apply_step
    return train_step


def make_bn_stats_step(model, cfg) -> Callable:
    """Train-mode forward that only updates BatchNorm running statistics
    (weights frozen) — the compiled kernel behind precise-BN recomputation
    (reference ``tools/train_net.py:357-380``, ``lib/utils/bn_helper.py``)."""

    def stats_step(params, model_state, batch, rng: jax.Array):
        frames = normalize_frames(batch["frames"], cfg)
        rngs = _model_rngs(rng, jnp.zeros((), jnp.int32))
        _, mut = model.apply(
            {"params": params, "batch_stats": model_state}, frames,
            train=True, rngs=rngs, mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    return stats_step


def make_eval_step(model, cfg, label_emb: Optional[jnp.ndarray]) -> Callable:
    """Eval forward: returns post-softmax predictions
    (reference ``lib/models/vit.py:355-357``).

    Takes the full variables dict (``TrainState.eval_variables``) so
    BatchNorm models evaluate with their running statistics."""
    label_emb_dev = None if label_emb is None else jnp.asarray(label_emb)

    def eval_step(variables, batch):
        return model.apply(
            variables, normalize_frames(batch["frames"], cfg),
            label_emb=label_emb_dev, train=False,
        )

    return eval_step


def compile_step(fn, mesh, donate_state: bool = True):
    """jit a (state, batch, rng) step with state replicated and batch
    sharded over the data axis."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep, data, rep),
        donate_argnums=(0,) if donate_state else (),
    )
