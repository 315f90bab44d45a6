"""Capture a TPU profile of the headline train step and print the top HLO
ops / categories by self time.

Reuses bench.py's setup (env knobs BENCH_B / BENCH_REMAT / BENCH_PALLAS ...),
wraps a few steady-state steps in ``jax.profiler.trace``, then parses the
``.xplane.pb`` directly with the TSL protobuf schema (the tensorboard
profile plugin's converter is broken in this image).

Usage: python tools/profile_bench.py [trace_dir]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, n_steps: int = 4) -> None:
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
    if os.environ.get("BENCH_REMAT"):
        cfg.TPU.REMAT = os.environ["BENCH_REMAT"] == "1"
    if os.environ.get("BENCH_PALLAS"):
        cfg.TPU.USE_PALLAS_ATTENTION = os.environ["BENCH_PALLAS"] == "1"
    B = int(os.environ.get("BENCH_B", "2"))
    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    T, S = cfg.DATA.NUM_FRAMES, cfg.DATA.TRAIN_CROP_SIZE

    mesh = build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    rep, data = replicated(mesh), batch_sharding(mesh)
    rng = np.random.RandomState(0)

    if os.environ.get("BENCH_EVAL") == "1":
        # profile the zero-shot eval forward exactly as bench.py's
        # BENCH_EVAL mode runs it (minus the scan harness: the profiler
        # wants individual dispatches)
        from procedurevrl_tpu.engine.steps import make_eval_step

        cfg = get_cfg()
        cfg.merge_from_file("configs/COIN/step_classification.yaml")
        cfg.DEV.LOAD_DUMMY_DATA = True
        cfg.OUTPUT_DIR = "/tmp/bench_out"
        cfg.DEV.MATCH_LANG_EMB = True
        T = cfg.DATA.NUM_FRAMES
        model, label_emb = build_model(cfg)
        params = init_params(cfg, model, label_emb)
        Bv = int(os.environ.get("BENCH_EVAL_B", "16"))
        Sv = cfg.DATA.TEST_CROP_SIZE
        ev = jax.jit(make_eval_step(model, cfg, label_emb),
                     in_shardings=(rep, data))
        frames = rng.randint(0, 256, (Bv, T, Sv, Sv, 3)).astype(np.uint8)
        batch = {"frames": jax.device_put(frames, data)}
        variables = jax.device_put({"params": params}, rep)
        for _ in range(2):
            out = ev(variables, batch)
            jax.block_until_ready(out)
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                out = ev(variables, batch)
            jax.block_until_ready(out)
        return

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
    step = jax.jit(train_step, in_shardings=(rep, data, rep),
                   donate_argnums=(0,))
    batch = shard_batch(mesh, {
        "frames": rng.randn(B, M, T, S, S, 3).astype(np.float32),
        "labels": np.zeros((B,), np.int32),
        "clip_text_ids": rng.randint(1, 49000, (B, M, 77)).astype(np.int32),
        "clip_vis_feat": rng.randn(B, M, 512).astype(np.float32),
    })
    key = jax.device_put(jax.random.PRNGKey(0), rep)
    state = jax.device_put(state, rep)
    for _ in range(2):
        state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])


def summarize(trace_dir: str, top: int = 35) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = plane.event_metadata
        by_name = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                head = name.split(" = ")[0]
                # async DMA events ("-start"/"-done") overlap the sync
                # schedule; summing their self-times would overcount ~8x
                if "-start" in head or "-done" in head:
                    continue
                dur = ev.duration_ps / 1e6  # us
                by_name[name] += dur
                total += dur
        if not by_name:
            continue
        print(f"== plane {plane.name}: XLA op self-time total "
              f"{total / 1e3:.2f} ms over trace ==")
        # bucket by the op's OPCODE (the word between the result shape and
        # its operand list), NOT substring over the whole op string — an
        # op's operand list names its producers (e.g. a fusion consuming
        # %custom-call.N), which a substring match misattributes
        import re

        def opcode_of(name: str) -> str:
            head, _, body = name.partition(" = ")
            m = re.search(r"[\)\}] ([a-zA-Z][\w\-.]*)\(", body)
            if m:
                return m.group(1).lower()
            # fall back to the head's op label ("%fusion.1734" -> fusion)
            return head.lstrip("%").split(".")[0].lower()

        cats = defaultdict(float)
        for name, dur in by_name.items():
            op = opcode_of(name)
            n = name.split(" = ")[0].lower()
            if "custom-call" in op or "custom-call" in n:
                cat = "pallas kernels"
            elif "fusion" in op:
                cat = "fusions"
            elif "convolution" in op or op.startswith("dot"):
                cat = "matmul/conv"
            elif "copy" in op or "transpose" in op or "bitcast" in op:
                cat = "copies/relayout"
            elif "all-reduce" in op or "all-gather" in op:
                cat = "collectives"
            elif "dynamic" in op:
                cat = "dynamic slice/update"
            else:
                cat = "other"
            cats[cat] += dur
        for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:24s} {dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%")
        print(f"  -- top {top} ops --")
        for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {dur / 1e3:9.3f} ms  {100 * dur / total:5.1f}%  {name[:110]}")
        break


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_bench"
    if not glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True):
        capture(trace_dir)
    summarize(trace_dir)
