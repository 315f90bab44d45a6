"""Training loop (reference ``tools/train_net.py``).

One compiled ``train_step`` drives the whole epoch; the per-iteration host
work is only batch transfer (sharded ``device_put``), metric fetch, and
meter logging.  Supports the same three task modes as the reference:
order pretraining (KLDiv + diffusion MSE), COIN finetuning (CE variants),
EPIC verb+noun finetuning.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.datasets import loader as loader_mod
from procedurevrl_tpu.engine.steps import TrainState, make_eval_step, make_train_step
from procedurevrl_tpu.models.build import build_model
from procedurevrl_tpu.parallel.mesh import batch_sharding, build_mesh, replicated, shard_batch
from procedurevrl_tpu.solver import construct_optimizer, get_lr_at_epoch, lr_schedule
from procedurevrl_tpu.utils import checkpoint as cu
from procedurevrl_tpu.utils import logging as logging_util
from procedurevrl_tpu.utils import meters as meters_mod
from procedurevrl_tpu.utils import misc

logger = logging_util.get_logger(__name__)


def _init_shapes(cfg):
    """Model input shape for parameter init, per task mode."""
    B = 2
    T = cfg.DATA.NUM_FRAMES
    H = W = cfg.DATA.TRAIN_CROP_SIZE
    if cfg.DEV.ORDER_PRETRAIN_ENABLED:
        return (B, cfg.DEV.ORDER_PRETRAIN_MAX_LEN, T, H, W, 3)
    if cfg.MODEL.NUM_SEG > 0:
        return (B, cfg.MODEL.NUM_SEG * T, H, W, 3)
    return (B, T, H, W, 3)


def init_params(cfg, model, label_emb):
    """Initialize params on device (traced through the training branch so
    every head/embedding exists)."""
    return init_variables(cfg, model, label_emb)[0]


def init_variables(cfg, model, label_emb):
    """Initialize (params, model_state); ``model_state`` carries the
    BatchNorm ``batch_stats`` collection for the ResNet/SlowFast/X3D family
    and is None for the BN-free transformer models."""
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    x = jnp.zeros(_init_shapes(cfg), jnp.float32)
    kwargs = dict(train=False)
    is_pretrain = cfg.TRAIN.LABEL_EMB != "" and cfg.TRAIN.TEXT != ""
    if is_pretrain:
        M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
        kwargs = dict(
            train=True,
            text={
                "clip_text_ids": jnp.zeros((2 * M, 77), jnp.int32),
                "clip_vis_feat": jnp.zeros((2 * M, 512), jnp.float32),
            },
        )
    if label_emb is not None:
        kwargs["label_emb"] = jnp.asarray(label_emb)
    rngs = {
        "params": rng,
        "diffusion": jax.random.fold_in(rng, 1),
        "subset": jax.random.fold_in(rng, 2),
        "droppath": jax.random.fold_in(rng, 3),
    }
    variables = jax.jit(
        lambda: model.init(rngs, x, **kwargs),
    )()
    return variables["params"], variables.get("batch_stats")


def build_trainer(cfg):
    """Build everything train() needs (reference ``train_net.py:380-414``)."""
    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)
    train_loader = loader_mod.construct_loader(cfg, "train")
    steps_per_epoch = max(len(train_loader), 1)

    cur_global = cfg.TRAIN.BATCH_SIZE * max(jax.process_count(), 1)
    accum = max(cfg.GLOBAL_BATCH_SIZE // max(cur_global, 1), 1)
    opt_steps_per_epoch = max(steps_per_epoch // accum, 1)
    sched = lr_schedule(cfg, opt_steps_per_epoch)
    params, model_state = init_variables(cfg, model, label_emb)
    # external pretrained encoder init (ImageNet ViT / MViT IN1k / released
    # TimeSformer), the reference's build-time load_pretrained. Only pull
    # params to host when there is actually a checkpoint to merge.
    if cfg.MODEL.PRETRAINED and cfg.TIMESFORMER.PRETRAINED_MODEL:
        params = jax.device_put(
            cu.load_pretrained_encoder(cfg, jax.device_get(params))
        )
    # optimizer group labels only need the tree structure, not the values
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    tx = construct_optimizer(shapes, cfg, sched)
    state = TrainState.create(params, tx, model_state)

    train_step = make_train_step(model, tx, cfg, label_emb, sched, accum)
    eval_step = make_eval_step(model, cfg, label_emb)
    return (
        mesh, model, label_emb, state, tx, train_step, eval_step,
        train_loader, steps_per_epoch, accum, opt_steps_per_epoch,
    )


def train_epoch(
    train_loader, state, compiled, cfg, cur_epoch, mesh, train_meter,
    accum, rng, grad_apply=None, writer=None,
):
    """One epoch (reference ``tools/train_net.py:56-247``)."""
    data_size = len(train_loader)
    train_meter.iter_tic()
    is_epic = cfg.TRAIN.DATASET == "Epickitchens"
    grads = None
    pending = []
    profile_range = (
        range(cfg.TPU.PROFILE_START,
              cfg.TPU.PROFILE_START + cfg.TPU.PROFILE_STEPS)
        if cfg.TPU.PROFILE_STEPS > 0 and cur_epoch == 0
        and jax.process_index() == 0 else range(0)
    )
    prefetched = loader_mod.prefetch_to_device(
        train_loader, mesh, size=cfg.TPU.PREFETCH_DEPTH
    )
    for cur_iter, (dev_batch, n_valid, _extra, batch) in enumerate(prefetched):
        if profile_range and cur_iter == profile_range.start:
            jax.profiler.start_trace(f"{cfg.OUTPUT_DIR}/profile")
        if profile_range and cur_iter == profile_range.stop:
            jax.profiler.stop_trace()
        dev_batch.pop("index", None)
        train_meter.data_toc()

        if accum == 1:
            state, metrics = compiled(state, dev_batch, rng)
        else:
            grad_fn, apply_fn, zeros_fn = grad_apply
            if cur_iter % accum == 0:
                grads = zeros_fn(state.params)
            # distinct rng per micro-batch (grad_step folds in state.step,
            # which is constant within an accumulation group)
            micro_rng = jax.random.fold_in(rng, cur_iter % accum)
            grads, metrics, new_ms = grad_fn(
                state.params, state.step, grads, dev_batch, micro_rng,
                state.model_state,
            )
            if new_ms is not None:
                state = state.replace(model_state=new_ms)
            if (cur_iter + 1) % accum == 0:
                state = apply_fn(state, grads)
                grads = None

        # defer the device->host metric fetch to the log boundary so steps
        # pipeline (the reference syncs with .item() every iteration,
        # tools/train_net.py:234-236; on TPU that sync stalls the queue)
        mb = batch["frames"].shape[0] * max(jax.process_count(), 1)
        pending.append((cur_iter, metrics, mb))
        if (cur_iter + 1) % cfg.LOG_PERIOD == 0 or cur_iter + 1 == data_size:
            for it, m_dev, mb_i in pending:
                m = {k: float(v) for k, v in jax.device_get(m_dev).items()}
                loss = m["loss"]
                misc.check_nan_losses(loss)
                lr = m.get(
                    "lr", get_lr_at_epoch(cfg, cur_epoch + float(it) / data_size)
                )
                if is_epic:
                    train_meter.update_stats(
                        m.get("top1_acc"), m.get("top5_acc"), loss, lr, mb_i,
                        extra={k: v for k, v in m.items()
                               if k.startswith(("verb", "noun"))},
                    )
                else:
                    train_meter.update_stats(
                        m.get("top1_err"), m.get("top5_err"), loss, lr, mb_i,
                        extra={k: v for k, v in m.items()
                               if k in ("kl", "mse", "grad_norm")},
                    )
                if writer is not None:
                    # every drained entry at its own global step (the
                    # reference writes train scalars every iteration,
                    # reference tools/train_net.py:224-247)
                    writer.add_scalars(
                        {f"Train/{k}": v for k, v in m.items()},
                        global_step=cur_epoch * data_size + it,
                    )
            pending = []
        train_meter.iter_toc()
        train_meter.log_iter_stats(cur_epoch, cur_iter)
        train_meter.iter_tic()
    if profile_range and profile_range.start < data_size <= profile_range.stop:
        # epoch ended inside the requested window: close the trace
        jax.profiler.stop_trace()
    train_meter.log_epoch_stats(cur_epoch)
    train_meter.reset()
    return state


def eval_epoch(val_loader, state, eval_step, val_meter, cfg, cur_epoch, mesh):
    """reference ``tools/train_net.py:252-344``.

    Batches are prefetched to device one step ahead (same pipelining as
    ``train_epoch``); the final partial val batch is padded by the loader,
    so metrics only count the ``n_valid`` real rows.
    """
    from procedurevrl_tpu.utils import metrics as metrics_lib

    compiled = jax.jit(
        eval_step, in_shardings=(replicated(mesh), batch_sharding(mesh))
    )
    n_batches = 0
    val_meter.iter_tic()
    prefetched = loader_mod.prefetch_to_device(
        val_loader, mesh, size=cfg.TPU.PREFETCH_DEPTH
    )
    for cur_iter, (dev_batch, n_valid, _extra, batch) in enumerate(prefetched):
        n_batches += 1
        preds = jax.device_get(
            compiled(state.eval_variables, {"frames": dev_batch["frames"]})
        )
        if isinstance(preds, tuple):  # EPIC: verb/noun/action triplet
            # (reference tools/train_net.py:298-325 via the EPICValMeter)
            vp = jnp.asarray(preds[0][:n_valid])
            np_ = jnp.asarray(preds[1][:n_valid])
            vl = jnp.asarray(batch["verb"][:n_valid])
            nl = jnp.asarray(batch["noun"][:n_valid])
            v1, v5 = metrics_lib.topk_accuracies(vp, vl, (1, 5))
            n1, n5 = metrics_lib.topk_accuracies(np_, nl, (1, 5))
            a1, a5 = metrics_lib.multitask_topk_accuracies(
                (vp, np_), (vl, nl), (1, 5))
            val_meter.update_stats(
                (float(v1), float(n1), float(a1)),
                (float(v5), float(n5), float(a5)), n_valid)
        else:
            labels = jnp.asarray(batch["labels"].reshape(-1)[:n_valid])
            top1, top5 = metrics_lib.topk_errors(
                jnp.asarray(preds[:n_valid]), labels, (1, 5))
            val_meter.update_stats(float(top1), float(top5), n_valid)
        val_meter.iter_toc()
        val_meter.log_iter_stats(cur_epoch, cur_iter)
        val_meter.iter_tic()
    assert n_batches > 0, "val loader produced no batches"
    val_meter.log_epoch_stats(cur_epoch)
    val_meter.reset()


def train(cfg):
    """Full training entry (reference ``tools/train_net.py:417-530``)."""
    logging_util.setup_logging(cfg.OUTPUT_DIR)
    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        # snapshot DEFAULT_B/T/S + epoch-factor schedule adjustment before
        # loaders/models read the cfg (reference train_net.py:419-424)
        from procedurevrl_tpu.utils.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)
        if cfg.MULTIGRID.LONG_CYCLE:
            assert cfg.TPU.MESH_MODEL == 1 and not cfg.TPU.SHARD_OPT_STATE, (
                "long-cycle multigrid rebuilds the step per phase; "
                "combine it with TP/ZeRO shardings explicitly if needed"
            )
    logger.info("Train with config:")
    logger.info(cfg)

    (mesh, model, label_emb, state, tx, train_step, eval_step, train_loader,
     steps_per_epoch, accum, _opt_steps) = build_trainer(cfg)
    misc.log_model_info(state.params, cfg)

    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    rep, data = replicated(mesh), batch_sharding(mesh)
    rng = jax.device_put(jax.random.PRNGKey(cfg.RNG_SEED), rep)
    state_sharding = rep
    if cfg.TPU.MESH_MODEL > 1:
        # Megatron-style tensor parallelism over the `model` axis
        # (parallel/mesh.py:tp_state_shardings). The Pallas attention
        # kernels are partition-aware (ops/pallas_partition): they run on
        # each model shard's own head group, no gather.  The spatial pass
        # keeps the split-q/k/v kernel under TP (SPATIAL_FUSED_QKV gating
        # is centralized in utils/parser.py:load_config).
        from procedurevrl_tpu.parallel.mesh import tp_state_shardings

        state_sharding = tp_state_shardings(state, mesh)
    elif cfg.TPU.SHARD_OPT_STATE:
        # ZeRO-1: AdamW moments partitioned over the data axis
        # (parallel/mesh.py:zero1_state_shardings); composes with grad
        # accumulation — the streaming accumulator gets the same plan
        from procedurevrl_tpu.parallel.mesh import zero1_state_shardings

        state_sharding = zero1_state_shardings(state, mesh)
    state = jax.device_put(state, state_sharding)

    def _compile_phase(step_fn, accum_, sharding):
        """(compiled, grad_apply) for one training phase; re-invoked when a
        long-cycle shape change swaps the step function."""
        if accum_ == 1:
            return (
                jax.jit(step_fn, in_shardings=(sharding, data, rep),
                        out_shardings=(sharding, rep), donate_argnums=(0,)),
                None,
            )
        grad_shard = rep
        params_shard = rep
        if cfg.TPU.MESH_MODEL > 1:
            # accum x TP: the streaming accumulator mirrors the Megatron
            # column/row param layout so each micro-step's grads land on
            # the shard that owns the matching param slice (no gather);
            # reference GLOBAL_BATCH_SIZE contract:
            # reference tools/train_net.py:176-192
            from procedurevrl_tpu.parallel.mesh import tp_param_shardings

            grad_shard = tp_param_shardings(state.params, mesh)
            params_shard = grad_shard
        elif cfg.TPU.SHARD_OPT_STATE:
            from procedurevrl_tpu.parallel.mesh import zero1_grad_shardings

            grad_shard = zero1_grad_shardings(state.params, mesh)
        grad_fn = jax.jit(
            step_fn.grad_step,
            in_shardings=(params_shard, rep, grad_shard, data, rep, rep),
            out_shardings=(grad_shard, rep, rep),
            donate_argnums=(2,))
        apply_fn = jax.jit(step_fn.apply_step,
                           in_shardings=(sharding, grad_shard),
                           out_shardings=sharding, donate_argnums=(0, 1))
        zeros_fn = jax.jit(
            lambda p: jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), p
            ),
            out_shardings=grad_shard,
        )
        return None, (grad_fn, apply_fn, zeros_fn)

    compiled, grad_apply = _compile_phase(train_step, accum, state_sharding)

    val_loader = (
        loader_mod.construct_loader(cfg, "val")
        if cfg.TRAIN.EVAL_PERIOD <= cfg.SOLVER.MAX_EPOCH else None
    )
    train_meter = meters_mod.TrainMeter(steps_per_epoch, cfg)
    val_meter_cls = (
        meters_mod.EPICValMeter if cfg.TRAIN.DATASET == "Epickitchens"
        else meters_mod.ValMeter
    )
    val_meter = val_meter_cls(len(val_loader) if val_loader else 0, cfg)
    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from procedurevrl_tpu.visualization import TensorboardWriter

        writer = TensorboardWriter(cfg)

    ckpt = cu.AsyncCheckpointer() if cfg.TPU.ASYNC_CHECKPOINT else None
    stats_step = None
    if cfg.BN.USE_PRECISE_STATS and state.model_state is not None:
        # compiled once; reused before every checkpoint/eval epoch
        from procedurevrl_tpu.engine.steps import make_bn_stats_step

        stats_step = jax.jit(
            make_bn_stats_step(model, cfg),
            in_shardings=(rep, rep, data, rep),
        )
    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            # long-cycle phase change: new (T, S, B) shape — rebuild the
            # loader/step/meter; the live weights and optimizer state carry
            # over (the reference rebuilds the trainer and reloads the last
            # checkpoint, reference train_net.py:487-506; params here are
            # shape-independent — pos/time embeddings interpolate at apply)
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                logger.info(
                    "Long cycle at epoch %d: T=%d S=%d B=%d", cur_epoch + 1,
                    cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE,
                    cfg.TRAIN.BATCH_SIZE,
                )
                train_loader = loader_mod.construct_loader(cfg, "train")
                steps_per_epoch = max(len(train_loader), 1)
                cur_global = cfg.TRAIN.BATCH_SIZE * max(jax.process_count(), 1)
                accum = max(cfg.GLOBAL_BATCH_SIZE // max(cur_global, 1), 1)
                from procedurevrl_tpu.solver import lr_schedule as _lr_sched

                sched_p = _lr_sched(cfg, max(steps_per_epoch // accum, 1))
                train_step = make_train_step(
                    model, tx, cfg, label_emb, sched_p, accum
                )
                compiled, grad_apply = _compile_phase(
                    train_step, accum, state_sharding
                )
                train_meter = meters_mod.TrainMeter(steps_per_epoch, cfg)
        loader_mod.shuffle_dataset(train_loader, cur_epoch)
        state = train_epoch(
            train_loader, state, compiled, cfg, cur_epoch, mesh, train_meter,
            accum, rng, grad_apply, writer,
        )
        is_checkp = cu.is_checkpoint_epoch(cfg, cur_epoch)
        is_eval = val_loader is not None and misc.is_eval_epoch(cfg, cur_epoch)
        if (is_checkp or is_eval) and stats_step is not None:
            # precise BN before checkpoint/eval (reference train_net.py:511-514).
            # Close the prefetch generator explicitly: precise BN consumes
            # only NUM_BATCHES_PRECISE batches, and an abandoned generator
            # would strand the loader's producer thread until GC.
            import contextlib

            from procedurevrl_tpu.utils.bn import compute_precise_bn_stats

            prefetched_bn = loader_mod.prefetch_to_device(
                train_loader, mesh, size=cfg.TPU.PREFETCH_DEPTH
            )
            with contextlib.closing(prefetched_bn):
                precise = compute_precise_bn_stats(
                    lambda ms, b: stats_step(state.params, ms, b, rng),
                    state.model_state,
                    (b for b, _n, _e, _h in prefetched_bn),
                    min(cfg.BN.NUM_BATCHES_PRECISE, len(train_loader)),
                )
            state = state.replace(model_state=precise)
        if is_checkp:
            if ckpt is not None:
                ckpt.save(cfg.OUTPUT_DIR, state, cfg, cur_epoch)
            else:
                cu.save_checkpoint(cfg.OUTPUT_DIR, state, cfg, cur_epoch)
        if is_eval:
            # eval failures abort: a broken eval path must not let training
            # keep running while looking healthy.
            eval_epoch(val_loader, state, eval_step, val_meter, cfg,
                       cur_epoch, mesh)
    if ckpt is not None:
        ckpt.wait()  # drain the in-flight save (and surface its errors)
    if writer is not None:
        writer.close()
    logger.info("Training done.")
    return state
