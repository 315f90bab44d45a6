"""Multi-host job launcher (reference ``tools/submit.py``).

The reference launches one Slurm task per node with submitit, derives the
NCCL rendezvous address from the first node, and requeues on preemption
(reference ``tools/submit.py:83-155``).  The TPU equivalent:

- on a Slurm cluster (submitit installed): same submitit flow, but each
  task initializes ``jax.distributed`` with the coordinator at node 0 —
  XLA/ICI replaces NCCL, so no socket/env plumbing beyond the coordinator;
- without Slurm: ``--print_commands`` emits the per-host command lines
  (one process per TPU host, as on Cloud TPU VMs where each worker runs
  the same binary), which is the GKE/xmanager-style contract.

Requeue-on-preemption is preserved through ``TRAIN.AUTO_RESUME`` +
checkpointing: a requeued job resumes from the latest checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procedurevrl_tpu.utils.parser import load_config


def parse_args():
    parser = argparse.ArgumentParser("Multi-host launcher")
    parser.add_argument("--cfg", dest="cfg_file", type=str, required=True)
    parser.add_argument("--num_hosts", type=int, default=1)
    parser.add_argument("--coordinator_port", type=int, default=8476)
    parser.add_argument("--job_dir", type=str, default="")
    parser.add_argument("--partition", type=str, default="learnfair")
    parser.add_argument("--timeout", type=int, default=4200, help="minutes")
    parser.add_argument("--print_commands", action="store_true",
                        help="emit per-host commands instead of submitting")
    parser.add_argument("--hosts", type=str, default="",
                        help="comma-separated host list; first is coordinator")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


class Trainer:
    """submitit callable with checkpoint/requeue (reference ``:28-81``)."""

    def __init__(self, args):
        self.args = args

    def __call__(self):
        import submitit

        env = submitit.JobEnvironment()
        coordinator = f"{env.hostnames[0]}:{self.args.coordinator_port}"
        self._run(env.global_rank, env.num_tasks, coordinator)

    def _run(self, process_id: int, num_processes: int, coordinator: str):
        self.args.num_shards = num_processes
        self.args.shard_id = process_id
        self.args.init_method = coordinator
        cfg = load_config(self.args)
        cfg.TPU.COORDINATOR_ADDRESS = coordinator
        cfg.TPU.NUM_PROCESSES = num_processes
        cfg.TPU.PROCESS_ID = process_id
        from procedurevrl_tpu.utils.misc import launch_job
        from tools.run_net import get_func

        train, test = get_func(cfg)
        if cfg.TRAIN.ENABLE:
            launch_job(cfg=cfg, init_method=coordinator, func=train)
        if cfg.TEST.ENABLE:
            launch_job(cfg=cfg, init_method=coordinator, func=test)

    def checkpoint(self):
        """Preemption hook: requeue with AUTO_RESUME (reference ``:134-143``)."""
        import submitit

        self.args.opts = list(self.args.opts or []) + ["TRAIN.AUTO_RESUME", "True"]
        return submitit.helpers.DelayedSubmission(Trainer(self.args))


def launch(args):
    """reference ``tools/submit.py:83-153``."""
    if args.print_commands or not _has_submitit():
        hosts = args.hosts.split(",") if args.hosts else (
            [f"host{i}" for i in range(args.num_hosts)]
        )
        coordinator = f"{hosts[0]}:{args.coordinator_port}"
        extra = " ".join(args.opts or [])
        for rank, host in enumerate(hosts):
            print(
                f"# on {host}:\n"
                f"python tools/run_net.py --cfg {args.cfg_file} "
                f"--num_shards {len(hosts)} --shard_id {rank} "
                f"--init_method {coordinator} "
                f"TPU.COORDINATOR_ADDRESS {coordinator} "
                f"TPU.NUM_PROCESSES {len(hosts)} TPU.PROCESS_ID {rank} "
                f"{extra}"
            )
        return

    import submitit

    executor = submitit.AutoExecutor(
        folder=args.job_dir or "submitit_logs/%j", slurm_max_num_timeout=30
    )
    executor.update_parameters(
        nodes=args.num_hosts,
        tasks_per_node=1,
        timeout_min=args.timeout,
        slurm_partition=args.partition,
        name="procedurevrl_tpu",
    )
    job = executor.submit(Trainer(args))
    print("Submitted job", job.job_id)


def _has_submitit() -> bool:
    try:
        import submitit  # noqa: F401

        return True
    except ImportError:
        return False


def main():
    launch(parse_args())


if __name__ == "__main__":
    main()
