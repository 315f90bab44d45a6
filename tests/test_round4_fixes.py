"""Round-4 regression tests.

Covers the import-time backend-initialization fix: the CLI tools must not
initialize ANY jax backend at import (reference CLI tools are equally lazy —
``/root/reference/tools/run_net.py`` touches CUDA only inside ``main``).  On
this image an eager ``jax.process_index()`` during module import would
initialize the axon TPU plugin before ``load_config`` can select the CPU
platform, hanging every tool (even pure-CPU runs) whenever the TPU tunnel
is unreachable.
"""

from __future__ import annotations

import subprocess
import sys


def test_tool_imports_do_not_initialize_backends():
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from procedurevrl_tpu.utils.parser import load_config, parse_args\n"
        "from procedurevrl_tpu.utils.misc import launch_job\n"
        "from tools.train_net import train\n"
        "from tools.test_net import test\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backends initialized: {list(xb._backends)}'\n"
        "print('LAZY_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert "LAZY_OK" in r.stdout, r.stdout + r.stderr


def test_get_logger_master_detection_no_backend():
    """_is_master reads the distributed global state (process 0 by default)
    without creating a backend."""
    from jax._src import xla_bridge as xb

    from procedurevrl_tpu.utils import logging as logging_util

    assert logging_util._is_master() is True
    logger = logging_util.get_logger(__name__)
    assert logger is not None
    # conftest already initialized the CPU backend for the suite; the
    # subprocess test above is the authoritative no-init check.  Here just
    # assert the helper itself never raises and stays cheap.
    assert "cpu" in xb._backends or not xb._backends


def test_load_config_tp_gates_fused_qkv():
    """TPU.MESH_MODEL > 1 must disable the fused-qkv spatial path for EVERY
    tool (gating centralized in load_config), while an explicit user
    override stays in force (setdefault)."""
    code = (
        "import os, sys; sys.path.insert(0, '/root/repo')\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "from types import SimpleNamespace\n"
        "from procedurevrl_tpu.utils.parser import load_config\n"
        "mk = lambda: SimpleNamespace(\n"
        "    cfg_file='configs/HowTo100M/procedurevrl_adamw.yaml',\n"
        "    opts=['TPU.MESH_MODEL', '2', 'TPU.MESH_DATA', '1'],\n"
        "    init_method='')\n"
        "load_config(mk())\n"
        "assert os.environ['SPATIAL_FUSED_QKV'] == '0'\n"
        "os.environ['SPATIAL_FUSED_QKV'] = '1'\n"
        "load_config(mk())\n"
        "assert os.environ['SPATIAL_FUSED_QKV'] == '1'  # override kept\n"
        "print('GATE_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd="/root/repo",
    )
    assert "GATE_OK" in r.stdout, r.stdout + r.stderr


def test_kernel_bench_families_construct(monkeypatch):
    """Every kernel_bench family builds its operands and reaches the
    measurement harness (mocked out — executing interpret-mode kernels at
    bench scale is a TPU-only affair).  Guards the tool against geometry
    bit-rot when kernel signatures change."""
    import tools.kernel_bench as kb

    calls = []

    def fake_bench(loss, args, grad_arg=0, n=kb.N_ITERS):
        calls.append(len(args))
        return 0.0, 0.0

    monkeypatch.setattr(kb, "_bench", fake_bench)
    for name, fn in kb.FAMILIES.items():
        fwd, fb = fn()
        assert (fwd, fb) == (0.0, 0.0), name
    assert len(calls) == len(kb.FAMILIES)


def test_mvit_kernels_shard_over_batch():
    """The MViT pooled-attention kernels are partition-aware: batch-sharded
    operands under an 8-device mesh reproduce the replicated loss and grads
    (without the wrappers GSPMD would all-gather and replicate the opaque
    custom call — the round-2 weakness fixed for the TimeSformer kernels in
    round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit, flash_attention_mvit_hl,
    )
    from procedurevrl_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(data=8, model=1)
    rng = np.random.RandomState(17)
    B, H, d = 8, 4, 96
    q_shape, k_shape = (4, 7, 7), (4, 4, 4)
    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    scale = d ** -0.5
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    # head-last operands [B, L, H*d]; rel is the concatenated [rt|rh|rw]
    hl_args = (mk(B, qn, H * d), mk(B, kn, H * d), mk(B, kn, H * d),
               mk(B, 1, H * d), mk(B, 1, H * d),
               mk(B, qn, H * sum(k_shape)))

    def loss_hl(*a):
        return jnp.sum(jnp.sin(
            flash_attention_mvit_hl(*a, k_shape, H, scale)))

    base = jax.jit(jax.value_and_grad(loss_hl, argnums=(0, 5)))(*hl_args)
    shard = NamedSharding(mesh, P("data", None, None))
    with mesh:
        a_s = [jax.device_put(t, shard) for t in hl_args]
        out = jax.jit(jax.value_and_grad(loss_hl, argnums=(0, 5)))(*a_s)
    np.testing.assert_allclose(float(base[0]), float(out[0]), rtol=1e-5)
    for a, b in zip(base[1], out[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # per-head operands [B*H, L, d] (both saved-probs and recompute bwd)
    ph_args = (mk(B * H, qn, d), mk(B * H, kn, d), mk(B * H, kn, d),
               mk(B * H, 1, d), mk(B * H, 1, d),
               mk(B * H, qn, sum(k_shape)))

    def loss_ph(*a):
        return jnp.sum(jnp.sin(flash_attention_mvit(*a, k_shape, scale)))

    base_p = jax.jit(jax.value_and_grad(loss_ph, argnums=(1,)))(*ph_args)
    with mesh:
        a_s = [jax.device_put(t, shard) for t in ph_args]
        out_p = jax.jit(jax.value_and_grad(loss_ph, argnums=(1,)))(*a_s)
    np.testing.assert_allclose(float(base_p[0]), float(out_p[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base_p[1][0]),
                               np.asarray(out_p[1][0]),
                               atol=1e-4, rtol=1e-4)


def test_checkpoint_mismatch_error_names_file(tmp_path):
    """An incompatible checkpoint restore (wrong model config or a stale
    OUTPUT_DIR picked up by AUTO_RESUME) raises an error naming the
    checkpoint path and the likely cause, not flax's bare key-mismatch."""
    import pickle

    import jax
    import jax.numpy as jnp
    import optax
    import pytest
    from flax import serialization

    from procedurevrl_tpu.engine.steps import TrainState
    from procedurevrl_tpu.utils import checkpoint as ckpt

    tx = optax.sgd(0.1)
    target = TrainState.create({"a": jnp.zeros((2,)), "b": jnp.ones((3,))},
                               tx)
    other = TrainState.create({"a": jnp.zeros((2,))}, tx)
    f = tmp_path / "checkpoint_epoch_00001.pyth"
    payload = {
        "model_state": serialization.to_bytes(jax.device_get(other.params)),
        "optimizer_state": serialization.to_bytes(
            jax.device_get(other.opt_state)),
        "epoch": 1,
    }
    pickle.dump(payload, open(f, "wb"))
    with pytest.raises(ValueError, match="does not match the current model"):
        ckpt.load_checkpoint(str(f), target)


def test_grad_accum_composes_with_tp(tmp_path):
    """Streaming accumulation with TPU.MESH_MODEL=2 (Megatron column/row
    param + accumulator shardings) reproduces the replicated accum run on
    the 8-device mesh — closes the round-3 NotImplementedError
    (reference GLOBAL_BATCH_SIZE contract, reference
    ``tools/train_net.py:176-192``)."""
    import jax
    import numpy as np

    from test_round3_fixes import _tiny_coin_cfg
    from tools.train_net import train

    cfg = _tiny_coin_cfg(tmp_path / "rep")
    state_rep = train(cfg)

    cfg_t = _tiny_coin_cfg(tmp_path / "tp")
    cfg_t.TPU.MESH_DATA = 4
    cfg_t.TPU.MESH_MODEL = 2
    state_t = train(cfg_t)

    assert int(state_rep.step) == 4  # 8 micro-batches / accum 2
    assert int(state_t.step) == 4
    flat_a, tree_a = jax.tree_util.tree_flatten(jax.device_get(state_rep.params))
    flat_b, tree_b = jax.tree_util.tree_flatten(jax.device_get(state_t.params))
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-5, rtol=2e-5
        )


def test_submit_print_commands_emits_per_host_launch_lines(tmp_path):
    """--print_commands emits one run_net command per host with the
    coordinator at host 0 and consecutive process ids (the Cloud-TPU-VM
    contract; reference ``tools/submit.py:83-143``)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/submit.py",
         "--cfg", "configs/COIN/step_classification.yaml",
         "--print_commands", "--hosts", "tpu-vm-0,tpu-vm-1",
         "--coordinator_port", "9999",
         "NUM_GPUS", "1"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("python ")]
    assert len(lines) == 2, r.stdout
    for rank, line in enumerate(lines):
        assert "--init_method tpu-vm-0:9999" in line
        assert f"--shard_id {rank}" in line
        assert f"TPU.PROCESS_ID {rank}" in line
        assert "TPU.NUM_PROCESSES 2" in line
        assert "TPU.COORDINATOR_ADDRESS tpu-vm-0:9999" in line
        assert "NUM_GPUS 1" in line  # trailing opts pass through


def test_submit_trainer_requeue_and_coordinator(monkeypatch):
    """The submitit Trainer derives the coordinator from the first node of
    the job env, and the preemption hook requeues with AUTO_RESUME so the
    restarted job resumes from the latest checkpoint (reference
    ``tools/submit.py:134-143``)."""
    import sys
    import types

    sys.path.insert(0, "/root/repo/tools")
    import submit as submit_mod

    # fake submitit: JobEnvironment + DelayedSubmission
    fake = types.ModuleType("submitit")

    class FakeEnv:
        hostnames = ["node-a", "node-b", "node-c"]
        global_rank = 1
        num_tasks = 3

    fake.JobEnvironment = FakeEnv
    fake.helpers = types.SimpleNamespace(
        DelayedSubmission=lambda fn: ("DELAYED", fn)
    )
    monkeypatch.setitem(sys.modules, "submitit", fake)

    import argparse

    args = argparse.Namespace(
        cfg_file="configs/COIN/step_classification.yaml",
        num_hosts=3, coordinator_port=1234, job_dir="", partition="x",
        timeout=1, print_commands=False, hosts="", opts=[],
    )
    tr = submit_mod.Trainer(args)
    seen = {}
    tr._run = lambda pid, n, coord: seen.update(pid=pid, n=n, coord=coord)
    tr()
    assert seen == {"pid": 1, "n": 3, "coord": "node-a:1234"}

    tag, requeued = tr.checkpoint()
    assert tag == "DELAYED"
    assert isinstance(requeued, submit_mod.Trainer)
    assert requeued.args.opts[-2:] == ["TRAIN.AUTO_RESUME", "True"]
