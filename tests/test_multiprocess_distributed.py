"""Multi-process distributed execution proof (2 real processes).

The one distributed surface the virtual 8-device mesh cannot exercise is
the PROCESS boundary: ``jax.distributed.initialize`` rendezvous, per-host
loader sharding (each process loads only its contiguous shard of the
global batch), cross-process collectives (gloo on CPU, ICI on TPU), and
master-only checkpointing — the reference's per-rank semantics
(``lib/utils/multiprocessing.py:8-61``, rank = shard_id * num_proc +
local_rank; DistributedSampler ``lib/datasets/loader.py``).

This test spawns the REAL CLI (``tools/run_net.py``) as 2 coordinated
processes x 4 virtual CPU devices each, trains one tiny epoch, and
asserts against a single-process 8-device run of the same global batch:

- per-iteration train losses match (the loader fixes in round 5 —
  process-stable synthetic seeds + pid-free per-sample RNG — plus the
  ``make_array_from_process_local_data`` batch assembly make this exact
  up to cross-process reduction order);
- the final checkpoint's trained parameters match to 1e-6;
- only the master process writes checkpoints or logs.

Relies on ``parallel/mesh.shard_batch``'s multi-process branch: a plain
``device_put`` against the global sharding raises on non-addressable
devices.
"""

from __future__ import annotations

import json
import os
import pickle
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
from flax.serialization import msgpack_restore

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--cfg", "configs/COIN/step_classification.yaml",
    "DEV.LOAD_DUMMY_DATA", "True",
    "TEST.ENABLE", "False",
    "SOLVER.MAX_EPOCH", "1",
    "TIMESFORMER.DEPTH", "1",
    "DATA.NUM_FRAMES", "2",
    "DATA.TRAIN_CROP_SIZE", "32",
    "DATA.TEST_CROP_SIZE", "32",
    "DATA.TRAIN_JITTER_SCALES", "[36, 40]",
    "TPU.COMPUTE_DTYPE", "float32",
    "GLOBAL_BATCH_SIZE", "8",
    "LOG_PERIOD", "1",
]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    return env


def _run(args, n_devices, timeout=540):
    return subprocess.run(
        [sys.executable, "tools/run_net.py"] + args,
        cwd=REPO, env=_env(n_devices), timeout=timeout,
        capture_output=True, text=True,
    )


def _iter_losses(stdout_log: str):
    losses = []
    for line in open(stdout_log):
        m = re.search(r"json_stats: (\{.*\})", line)
        if m:
            d = json.loads(m.group(1))
            if d.get("_type") == "train_iter":
                losses.append(float(d["loss"]))
    return losses


def _flat_params(ckpt_path: str):
    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    tree = msgpack_restore(payload["model_state"])

    def flat(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flat(v, pre + k + "/")
            else:
                yield pre + k, np.asarray(v)

    return dict(flat(tree))


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    out1 = str(tmp_path / "single")
    out2 = str(tmp_path / "multi")

    r = _run(COMMON + ["TRAIN.BATCH_SIZE", "8", "OUTPUT_DIR", out1], 8)
    assert r.returncode == 0, r.stderr[-3000:]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    mp = ["TPU.NUM_PROCESSES", "2",
          "TPU.COORDINATOR_ADDRESS", f"localhost:{port}",
          "TRAIN.BATCH_SIZE", "4", "OUTPUT_DIR", out2]
    worker1 = subprocess.Popen(
        [sys.executable, "tools/run_net.py"] + COMMON + mp
        + ["TPU.PROCESS_ID", "1"],
        cwd=REPO, env=_env(4), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        r0 = _run(COMMON + mp + ["TPU.PROCESS_ID", "0"], 4)
        out_w1, _ = worker1.communicate(timeout=540)
    finally:
        if worker1.poll() is None:
            worker1.kill()
    assert r0.returncode == 0, r0.stderr[-3000:]
    assert worker1.returncode == 0, out_w1[-3000:]

    # per-iteration loss equivalence (identical global batches: the loader
    # slices one epoch-seeded permutation into contiguous per-host shards)
    l1 = _iter_losses(os.path.join(out1, "stdout.log"))
    l2 = _iter_losses(os.path.join(out2, "stdout.log"))
    assert len(l1) == len(l2) > 0
    np.testing.assert_allclose(l2, l1, atol=5e-4, rtol=1e-5)

    # trained parameters of the saved checkpoint match (cross-process psum
    # reduction order is the only difference source)
    ck1 = os.path.join(out1, "checkpoints", "checkpoint_epoch_00001.pyth")
    ck2 = os.path.join(out2, "checkpoints", "checkpoint_epoch_00001.pyth")
    p1, p2 = _flat_params(ck1), _flat_params(ck2)
    assert set(p1) == set(p2)
    for k in p1:
        np.testing.assert_allclose(
            p2[k].astype(np.float64), p1[k].astype(np.float64),
            atol=1e-6, rtol=1e-6, err_msg=k,
        )

    # master-only contract: the non-master process wrote no checkpoint or
    # json stats (its stdout has neither; the shared OUTPUT_DIR has exactly
    # the master's files)
    assert "Saved checkpoint" not in out_w1
    assert "json_stats" not in out_w1
    assert sorted(os.listdir(os.path.join(out2, "checkpoints"))) == [
        "checkpoint_epoch_00001.pyth"
    ]
