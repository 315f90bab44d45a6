"""tools/submit.py topology emission + requeue contract.

String-level validation of the per-host launcher against a fake
2-host x 4-chip topology (reference ``tools/submit.py:83-153``): rank
math, coordinator derivation from the first host, opts passthrough, and
the preemption requeue hook adding ``TRAIN.AUTO_RESUME True``
(reference ``tools/submit.py:134-143``).
"""

from __future__ import annotations

import sys
import types

sys.path.insert(0, "/root/repo")

from tools import submit


def _args(**over):
    ns = types.SimpleNamespace(
        cfg_file="configs/HowTo100M/procedurevrl_adamw.yaml",
        num_hosts=2,
        coordinator_port=8476,
        job_dir="",
        partition="learnfair",
        timeout=4200,
        print_commands=True,
        hosts="tpu-vm-a,tpu-vm-b",
        opts=["TRAIN.BATCH_SIZE", "32"],
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_print_commands_two_host_topology(capsys):
    submit.launch(_args())
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith("#")]
    headers = [ln for ln in out.splitlines() if ln.startswith("# on ")]
    assert headers == ["# on tpu-vm-a:", "# on tpu-vm-b:"]
    assert len(lines) == 2
    for rank, line in enumerate(lines):
        # rank math: shard_id == host index; coordinator is host 0
        assert f"--num_shards 2 --shard_id {rank} " in line
        assert "--init_method tpu-vm-a:8476" in line
        assert "TPU.COORDINATOR_ADDRESS tpu-vm-a:8476" in line
        assert f"TPU.NUM_PROCESSES 2 TPU.PROCESS_ID {rank}" in line
        # opts passthrough, verbatim, after the topology keys
        assert line.endswith("TRAIN.BATCH_SIZE 32")
        assert line.startswith(
            "python tools/run_net.py "
            "--cfg configs/HowTo100M/procedurevrl_adamw.yaml"
        )


def test_print_commands_synthesizes_hostnames(capsys):
    submit.launch(_args(hosts="", num_hosts=4, coordinator_port=9999))
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith("#")]
    assert len(lines) == 4
    for rank, line in enumerate(lines):
        assert f"--num_shards 4 --shard_id {rank} " in line
        assert "--init_method host0:9999" in line


def test_requeue_hook_adds_auto_resume(monkeypatch):
    """Preemption requeue re-submits with TRAIN.AUTO_RESUME True so the
    requeued job resumes from the latest checkpoint."""
    captured = {}

    fake = types.ModuleType("submitit")
    fake.helpers = types.SimpleNamespace(
        DelayedSubmission=lambda trainer: captured.setdefault("t", trainer)
    )
    monkeypatch.setitem(sys.modules, "submitit", fake)

    args = _args()
    submit.Trainer(args).checkpoint()
    assert isinstance(captured["t"], submit.Trainer)
    assert args.opts[-2:] == ["TRAIN.AUTO_RESUME", "True"]
    # original opts preserved ahead of the requeue flag
    assert args.opts[:2] == ["TRAIN.BATCH_SIZE", "32"]
