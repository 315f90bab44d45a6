"""Device mesh + sharding policy.

TPU-native replacement for the reference's NCCL data-parallel stack
(reference ``lib/utils/distributed.py``, ``lib/utils/multiprocessing.py``,
``lib/models/build.py:49-53``): instead of one process per accelerator with
DDP gradient hooks, one process per *host* owns all local chips; a global
2-D ``jax.sharding.Mesh`` with axes ``("data", "model")`` spans all chips,
the batch is sharded over ``data``, parameters/optimizer state are
replicated (the full ProcedureVRL model is ~200M params and fits per chip,
matching the reference's pure-DP design — SURVEY.md §2.8), and XLA inserts
the gradient ``psum`` over ICI where DDP used NCCL all-reduce.

``model`` is carried for forward-compat (tensor-parallel sharding of the
encoder MLPs at larger scales); all shipped configs run ``model=1``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    model: int = 1,
) -> Mesh:
    """Create the global device mesh.

    Args:
        devices: devices to use (default: all of ``jax.devices()``, which is
            globally consistent across hosts after ``jax.distributed``).
        data: data-axis size; -1 means all remaining devices.
        model: model-axis size.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    if len(devices) == 1:
        arr = np.asarray(devices).reshape(data, model)
    else:
        arr = mesh_utils.create_device_mesh((data, model), devices=list(devices))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis (the DistributedSampler
    equivalent at the array level; reference ``lib/datasets/utils.py:358-372``)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, replicate_keys: Sequence[str] = ()):
    """Device-put a host-global batch pytree with the leading axis sharded
    over ``data``.

    Scalars and leaves whose path matches ``replicate_keys`` are replicated;
    any other leaf whose leading dim doesn't divide the data axis is an
    error (silent replication would hide a mis-shaped batch and burn
    redundant compute on every device).

    Under multi-process execution (``jax.process_count() > 1``) each
    process passes its HOST-LOCAL batch shard (what the per-host loader
    yields) and the leaves are assembled into global arrays with
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    against a mesh-wide sharding raises on non-addressable devices (the
    reference's per-rank DistributedSampler + DDP contract,
    ``lib/datasets/utils.py:358-372``, at the array level).
    """
    ndata = mesh.shape[DATA_AXIS]
    nproc = jax.process_count()
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(path, x):
        x = np.asarray(x)
        name = jax.tree_util.keystr(path)
        if x.ndim == 0 or any(k in name for k in replicate_keys):
            if nproc > 1:
                return jax.make_array_from_process_local_data(rep, x)
            return jax.device_put(x, rep)
        if (x.shape[0] * nproc) % ndata != 0:
            raise ValueError(
                f"batch leaf {name!r} has global leading dim "
                f"{x.shape[0] * nproc} ({x.shape[0]} per process) which "
                f"does not divide the data axis ({ndata} devices); pad the "
                f"batch or pass the key in replicate_keys"
            )
        if nproc > 1:
            return jax.make_array_from_process_local_data(bs, x)
        return jax.device_put(x, bs)

    return jax.tree_util.tree_map_with_path(put, batch)


def local_batch_slice(global_batch: int, num_hosts: int, host_id: int) -> slice:
    """Per-host shard of the global batch (per-host data loading;
    reference DistributedSampler semantics)."""
    assert global_batch % num_hosts == 0
    per = global_batch // num_hosts
    return slice(host_id * per, (host_id + 1) * per)


def _zero1_leaf_spec(mesh: Mesh, min_size: int):
    """Leaf rule shared by the ZeRO-1 moment and grad-accumulator plans:
    shard the first axis over ``data`` when it divides the axis size and
    the tensor is big enough to matter."""
    rep = replicated(mesh)
    n = mesh.shape[DATA_AXIS]

    def leaf_spec(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if len(shape) >= 1 and shape[0] % n == 0 and size >= min_size:
            return NamedSharding(mesh, P(DATA_AXIS))
        return rep

    return leaf_spec


def zero1_grad_shardings(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Sharding plan for the streaming gradient accumulator under ZeRO-1:
    the accumulator is partitioned over ``data`` with the same leaf rule as
    the AdamW moments, so GLOBAL_BATCH_SIZE accumulation composes with
    ``TPU.SHARD_OPT_STATE`` — each micro-step's replicated grads land in a
    sharded buffer (a reduce-scatter in effect) and the apply step reads
    moments and accumulator with matching layouts."""
    return jax.tree_util.tree_map(_zero1_leaf_spec(mesh, min_size), params)


def zero1_state_shardings(state, mesh: Mesh, min_size: int = 2 ** 16):
    """ZeRO-1-style sharding plan for a TrainState: optimizer moments are
    partitioned over the ``data`` axis, params/step/model_state replicated.

    The reference has no optimizer sharding (pure DDP replicates
    everything); this is a TPU extension (``TPU.SHARD_OPT_STATE``) for
    production scale: with AdamW the m/v moments are 2x the param bytes —
    sharding them over N data-parallel chips cuts per-chip optimizer
    memory by ~(N-1)/N.  The update becomes ZeRO-1 semantics
    automatically: XLA partitions the elementwise moment update along the
    sharded axis and inserts the all-gather that re-materializes the
    replicated parameter update — no hand-written collectives.

    Leaves are sharded on their first axis when it divides the data-axis
    size and the tensor is big enough to matter; everything else
    (scalars, counts, small embeddings) stays replicated.
    """
    opt_shardings = jax.tree_util.tree_map(
        _zero1_leaf_spec(mesh, min_size), state.opt_state
    )
    rep = replicated(mesh)
    return type(state)(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        opt_state=opt_shardings,
        model_state=(
            None if state.model_state is None
            else jax.tree_util.tree_map(lambda _: rep, state.model_state)
        ),
    )


def tp_param_shardings(params, mesh: Mesh):
    """Megatron-style tensor-parallel sharding plan for the transformer
    params: attention qkv / MLP fc1 kernels column-sharded over ``model``,
    proj / fc2 kernels row-sharded, everything else replicated.

    With the batch sharded over ``data`` and these parameter shardings,
    the GSPMD partitioner runs each attention/MLP block as a
    column-parallel -> row-parallel pair and inserts one all-reduce per
    block over the ``model`` axis — the standard Megatron-LM decomposition
    (arXiv:1909.08053) with zero hand-written collectives.  The reference
    has no TP (DDP replicates everything); this is a TPU extension for
    models that outgrow one chip.  The Pallas attention kernels are
    partition-aware (``ops/pallas_partition``): under ``model > 1`` each
    shard runs the kernel on its own head group.
    """
    rep = replicated(mesh)
    col = NamedSharding(mesh, P(None, MODEL_AXIS))  # [in, out-sharded]
    row = NamedSharding(mesh, P(MODEL_AXIS, None))  # [in-sharded, out]

    def spec(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(names)
        leaf = names[-1]
        if getattr(x, "ndim", 0) != 2:
            return rep
        if leaf in ("qkv_kernel",) or (leaf == "kernel" and "fc1" in joined):
            return col
        if leaf in ("proj_kernel",) or (leaf == "kernel" and "fc2" in joined):
            return row
        return rep

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_state_shardings(state, mesh: Mesh):
    """TrainState-wide TP sharding plan: params AND optimizer moments get
    the Megatron column/row layout (the moment trees mirror the param tree,
    so the same path-based rule applies); step/scalars replicated."""
    rep = replicated(mesh)
    return type(state)(
        step=rep,
        params=tp_param_shardings(state.params, mesh),
        opt_state=tp_param_shardings(state.opt_state, mesh),
        model_state=(
            None if state.model_state is None
            else jax.tree_util.tree_map(lambda _: rep, state.model_state)
        ),
    )
