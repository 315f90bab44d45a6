"""Dump the optimized HLO of the headline train step (bench.py's exact
setup) and print a copy/transpose census.

The round-4 MViT frontier items — stage-1 ``{1,2,0}``-layout transpose
fusions (~3 ms/step) and input remat copies (~4 ms/step) — need the
compiled module text to root-cause which operand layout (conv-preferred
vs attention-preferred) forces the relayout.  Env knobs as bench.py
(BENCH_MODEL / BENCH_B / BENCH_REMAT ...).

Usage: python tools/hlo_dump.py [out.hlo.txt]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step.hlo.txt"

    import jax
    import numpy as np

    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()
    from procedurevrl_tpu.engine.steps import TrainState, make_train_step
    from procedurevrl_tpu.models.build import build_model
    from procedurevrl_tpu.parallel.mesh import (
        batch_sharding, build_mesh, replicated,
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
    if os.environ.get("BENCH_REMAT"):
        cfg.TPU.REMAT = os.environ["BENCH_REMAT"] == "1"
    if os.environ.get("BENCH_PALLAS"):
        cfg.TPU.USE_PALLAS_ATTENTION = os.environ["BENCH_PALLAS"] == "1"
    B = int(os.environ.get("BENCH_B", "2"))
    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    T, S = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE

    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    sched = lr_schedule(cfg, 1000)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ), cfg, sched,
    )
    state = TrainState.create(params, tx)
    train_step = make_train_step(model, tx, cfg, label_emb, sched, 1)
    rep, data = replicated(mesh), batch_sharding(mesh)
    step = jax.jit(train_step, in_shardings=(rep, data, rep),
                   donate_argnums=(0,))
    batch_abs = {
        "frames": jax.ShapeDtypeStruct((B, M, T, S, S, 3), np.float32),
        "labels": jax.ShapeDtypeStruct((B,), np.int32),
        "clip_text_ids": jax.ShapeDtypeStruct((B, M, 77), np.int32),
        "clip_vis_feat": jax.ShapeDtypeStruct((B, M, 512), np.float32),
    }
    key_abs = jax.ShapeDtypeStruct((2,), np.uint32)
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    print("# lowering + compiling", file=sys.stderr, flush=True)
    compiled = step.lower(state_abs, batch_abs, key_abs).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"# wrote {len(txt) / 1e6:.1f} MB to {out_path}",
          file=sys.stderr, flush=True)

    # census: copies / transposes / fusions mentioning transposed layouts
    census = defaultdict(lambda: [0, []])
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?\S+ = (\S+?)\[", ls)
        if not m:
            continue
        op = re.sub(r"\.\d+$", "", m.group(1))
        if re.search(r"\bcopy\(", ls):
            census["copy"][0] += 1
            census["copy"][1].append(ls[:160])
        elif re.search(r"\btranspose\(", ls):
            census["transpose"][0] += 1
            census["transpose"][1].append(ls[:160])
    for op, (n, samples) in census.items():
        print(f"== {op}: {n} instructions ==")
        for s in samples[:40]:
            print("  ", s)


if __name__ == "__main__":
    main()
