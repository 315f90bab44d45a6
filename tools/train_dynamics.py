"""Varied-data training-dynamics run at full size (VERDICT round-4 #6).

Runs TD_STEPS (default 300) full-size order-pretraining train steps on
the real chip with a PER-STEP FRESH synthetic batch and the config's real
LR schedule compressed onto TD_STEPS (the shipped pretrain policy is
steps_with_relative_lrs with no warmup; any STEPS boundaries and warmup
fraction are rescaled by TD_STEPS/MAX_EPOCH — reference
``lib/utils/lr_policy.py:8-87``), logging loss / kl / mse / lr /
grad-norm per step to a JSONL.

With fresh batches every step, the pre-update loss IS a validation
signal by construction (each batch is unseen when its loss is computed),
so the trajectory distinguishes "optimizes cleanly" from "stalls after
warmup" — and explains the fixed-batch 3.3-4.5 plateau/oscillation of
the round-4 row: on synthetic noise inputs the KL term's floor is the
sharpened teacher's entropy, which this tool also estimates from the
synthetic teacher features so the plateau level has a yardstick.

Usage:
    python tools/train_dynamics.py [out.jsonl]
Env: TD_STEPS (300), TD_B (2), BENCH_MODEL (timesformer)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_dynamics.jsonl"
    import jax
    import numpy as np

    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()
    from procedurevrl_tpu.engine.steps import TrainState, make_train_step
    from procedurevrl_tpu.models.build import build_model
    from procedurevrl_tpu.parallel.mesh import (
        batch_sharding, build_mesh, replicated, shard_batch,
    )
    from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
    from tools.train_net import init_params

    n_steps = int(os.environ.get("TD_STEPS", "300"))
    B = int(os.environ.get("TD_B", "2"))
    bench_model = os.environ.get("BENCH_MODEL", "timesformer")

    cfg = get_cfg()
    cfg.merge_from_file(
        "configs/HowTo100M/procedurevrl_mvitv2_adamw.yaml"
        if bench_model == "mvit"
        else "configs/HowTo100M/procedurevrl_adamw.yaml"
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.OUTPUT_DIR = "/tmp/bench_out"

    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    T, S = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE

    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    # REAL schedule engaged across this run, compressed onto TD_STEPS:
    # "epochs" = steps here (steps_per_epoch=1), so MAX_EPOCH, any STEPS
    # boundaries (steps_with_relative_lrs — the shipped pretrain policy),
    # and the warmup fraction are all rescaled by n_steps / MAX_EPOCH.
    # A config with no warmup keeps none (the reference pretrain config
    # has WARMUP_EPOCHS 0; forcing one would spike step 0 to
    # WARMUP_START_LR = 0.01 = 200x base).
    sched_cfg = cfg.clone()
    scale = n_steps / max(cfg.SOLVER.MAX_EPOCH, 1)
    sched_cfg.SOLVER.MAX_EPOCH = n_steps
    sched_cfg.SOLVER.STEPS = [int(round(s * scale)) for s in cfg.SOLVER.STEPS]
    sched_cfg.SOLVER.WARMUP_EPOCHS = cfg.SOLVER.WARMUP_EPOCHS * scale
    sched = lr_schedule(sched_cfg, 1)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        cfg, sched)
    state = TrainState.create(params, tx)
    train_step = make_train_step(model, tx, cfg, label_emb, sched, 1)
    rep, data = replicated(mesh), batch_sharding(mesh)
    step = jax.jit(train_step, in_shardings=(rep, data, rep),
                   donate_argnums=(0,))
    state = jax.device_put(state, rep)
    key = jax.device_put(jax.random.PRNGKey(0), rep)

    def fresh_batch(i: int):
        r = np.random.RandomState(1000 + i)
        feats = r.randn(B, M, 512).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        return shard_batch(mesh, {
            "frames": r.randint(0, 256, (B, M, T, S, S, 3)).astype(np.uint8),
            "labels": np.zeros((B,), np.int32),
            "clip_text_ids": r.randint(1, 49000, (B, M, 77)).astype(np.int32),
            "clip_vis_feat": feats,
        })

    print(f"# {n_steps} steps, fresh batch/step, schedule: "
          f"{cfg.SOLVER.LR_POLICY} steps {sched_cfg.SOLVER.STEPS} warmup "
          f"{sched_cfg.SOLVER.WARMUP_EPOCHS:.1f} steps base_lr "
          f"{cfg.SOLVER.BASE_LR}", file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    with open(out_path, "w") as f:
        for i in range(n_steps):
            batch = fresh_batch(i)
            state, metrics = step(state, batch, key)
            row = {k: float(np.asarray(v)) for k, v in metrics.items()
                   if np.asarray(v).ndim == 0}
            row["step"] = i
            f.write(json.dumps(row) + "\n")
            if i % 10 == 0 or i == n_steps - 1:
                print(f"# step {i}: loss {row.get('loss', float('nan')):.4f} "
                      f"kl {row.get('kl', float('nan')):.4f} "
                      f"mse {row.get('mse', float('nan')):.4f} "
                      f"lr {row.get('lr', float('nan')):.2e}",
                      file=sys.stderr, flush=True)
            if not np.isfinite(row.get("loss", 0.0)):
                print(f"# NON-FINITE LOSS at step {i}", file=sys.stderr)
                break
    dt = time.perf_counter() - t_start
    print(f"# done in {dt:.0f}s ({dt / n_steps * 1e3:.0f} ms/step incl. "
          f"host batch-gen + upload); log at {out_path}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
