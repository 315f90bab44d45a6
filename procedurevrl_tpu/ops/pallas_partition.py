"""Partition-aware wrappers for the Pallas attention kernels.

A bare ``pallas_call`` lowers to an opaque custom call that the GSPMD /
Shardy partitioner cannot split, so under a multi-device mesh the operands
get all-gathered and the kernel runs replicated (the reason round-2
hard-required the XLA attention path whenever ``TPU.MESH_MODEL > 1``).

``jax.experimental.custom_partitioning`` fixes this the TPU-native way:
each kernel declares an einsum-style sharding rule — batch dim sharded
freely (``data``), token dims replicated, channel dim shardable by whole
head groups (``model``) — and a per-shard lowering that re-invokes the
kernel with the LOCAL head count.  Megatron TP then runs the kernels on
each model shard's own heads with zero hand-written collectives, and pure
DP runs them on each data shard's rows instead of a gathered batch.

Wrappers activate only when more than one device is visible (a
single-chip jit keeps the exact round-2 HLO and compile cache).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _axis_count(mesh, names) -> int:
    if names is None:
        return 1
    if isinstance(names, (tuple, list)):
        out = 1
        for a in names:
            out *= mesh.shape[a]
        return out
    return mesh.shape[names]


def _wrap(impl: Callable, *, n_tensors: int, static_argnums,
          rule: str, need_replication: Sequence[str],
          shard_c: bool = True, rank: int = 3):
    """custom_partitioning wrapper for an attention kernel whose tensor
    args/outputs are all ``[B, ..., C]`` with shared batch/channel specs.

    Any number of trailing static args is supported (custom_partitioning
    passes them positionally before ``mesh``).  When ``shard_c`` the FIRST
    static must be ``num_heads``: the per-shard lowering recomputes the
    local head count from the local channel width, so a ``model``-axis
    channel sharding runs each shard's own head group.  Channel shardings
    that do not divide the head count are legalized to replicated (the
    partitioner inserts the reshard).  Outputs may have other ranks than
    ``rank`` — only dim 0 (batch) is ever sharded on them.
    """
    part = custom_partitioning(impl, static_argnums=static_argnums)
    n_static = len(static_argnums)

    def _out_sharding(mesh, b_names, c_names, result_shape):
        def one(r):
            nd = len(r.shape)
            mid = (None,) * (nd - 2)
            c = c_names if (shard_c and nd == rank) else None
            return NamedSharding(mesh, P(b_names, *mid, c))
        return jax.tree.map(one, result_shape)

    def partition(*cb_args):
        statics = cb_args[:n_static]
        mesh, arg_shapes, result_shape = cb_args[n_static:]
        q = arg_shapes[0]
        spec = tuple(q.sharding.spec)
        spec += (None,) * (rank - len(spec))
        b_names = spec[0]
        c_names = spec[-1] if shard_c else None
        num_heads = statics[0] if shard_c else None
        if c_names is not None and num_heads % _axis_count(mesh, c_names):
            c_names = None
        C = q.shape[-1]
        mid = (None,) * (rank - 2)
        ns = NamedSharding(mesh, P(b_names, *mid, c_names))
        arg_shardings = tuple(ns for _ in arg_shapes)
        out_shardings = _out_sharding(mesh, b_names, c_names, result_shape)

        def lower_fn(*args):
            if shard_c:
                local_heads = num_heads * args[0].shape[-1] // C
                return impl(*args, local_heads, *statics[1:])
            return impl(*args, *statics)

        return mesh, lower_fn, out_shardings, arg_shardings

    def infer_sharding_from_operands(*cb_args):
        mesh, arg_shapes, result_shape = cb_args[n_static:]
        q = arg_shapes[0]
        spec = tuple(q.sharding.spec)
        spec += (None,) * (rank - len(spec))
        c = spec[-1] if shard_c else None
        return _out_sharding(mesh, spec[0], c, result_shape)

    part.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(need_replication),
    )
    return part


def partition_aware(plain: Callable, partitioned: Callable) -> Callable:
    """Route through the custom_partitioning wrapper only under a
    multi-device runtime; a single chip keeps the plain pallas_call (same
    HLO, warm compile cache)."""

    @functools.wraps(plain)
    def dispatch(*args):
        if jax.device_count() > 1:
            return partitioned(*args)
        return plain(*args)

    return dispatch
