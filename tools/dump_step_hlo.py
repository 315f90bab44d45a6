"""Dump the optimized (post-layout-assignment) HLO of a bench train step.

The axon tunnel rejects custom XLA_FLAGS (no --xla_dump_to), but
``jit(...).lower(...).compile().as_text()`` returns the scheduled HLO
with layout annotations, which is what the layout-tax investigations
need (CLAUDE.md round-4 frontier: MViT stage-1 ``{1,2,0}``
transposed-layout fusions ~3 ms/step, input remat copies ~4 ms/step).

Usage::

    BENCH_MODEL=mvit python tools/dump_step_hlo.py /tmp/mvit_step.hlo

Reuses bench.py's model/step construction so the dumped module is
EXACTLY the benched executable (same compile cache key).  Analysis is
plain grep over the dump, e.g.::

    grep -n "copy" /tmp/mvit_step.hlo | head
    grep -n "transpose" /tmp/mvit_step.hlo | head
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step.hlo"

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

    bench_model = os.environ.get("BENCH_MODEL", "timesformer")
    cfg = get_cfg()
    cfg.merge_from_file(
        "configs/HowTo100M/procedurevrl_mvitv2_adamw.yaml"
        if bench_model == "mvit"
        else "configs/HowTo100M/procedurevrl_adamw.yaml"
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.OUTPUT_DIR = "/tmp/bench_out"

    B = int(os.environ.get("BENCH_B", "2"))
    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    T = cfg.DATA.NUM_FRAMES
    S = cfg.DATA.TRAIN_CROP_SIZE

    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    sched = lr_schedule(cfg, 1000)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        cfg, sched)
    state = TrainState.create(params, tx)
    train_step = make_train_step(model, tx, cfg, label_emb, sched, 1)

    rep, data = replicated(mesh), batch_sharding(mesh)
    step = jax.jit(train_step, in_shardings=(rep, data, rep),
                   donate_argnums=(0,))

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "frames": rng.randn(B, M, T, S, S, 3).astype(np.float32),
        "labels": np.zeros((B,), np.int32),
        "clip_text_ids": rng.randint(1, 49000, (B, M, 77)).astype(np.int32),
        "clip_vis_feat": rng.randn(B, M, 512).astype(np.float32),
    })
    key = jax.device_put(jax.random.PRNGKey(0), rep)

    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (state, batch, key))
    compiled = step.lower(*abstract).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB of HLO to {out_path}")


if __name__ == "__main__":
    main()
