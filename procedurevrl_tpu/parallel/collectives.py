"""Collective helpers (reference ``lib/utils/distributed.py``).

Most of the reference's NCCL surface disappears on TPU: under a global-view
jit, losses/metrics over the sharded batch already compile to ICI psums,
and eval outputs are globally-addressable arrays (no gather needed).  These
helpers cover the residual explicit uses:

- ``all_reduce_mean`` / ``all_gather_batch``: shard_map-level collectives for
  code that computes per-shard values (reference ``distributed.py:31-69``
  and the differentiable ``AllGather`` at ``:13-29`` — in JAX
  ``lax.all_gather`` is differentiable by construction, the backward is the
  gradient slice);
- host-side object broadcast/gather over DCN (reference's gloo
  ``all_gather_unaligned``, ``:245-281``) via ``multihost_utils``;
- rank/world predicates (``is_master_proc``, ``get_world_size``,
  ``distributed.py:160-210``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from procedurevrl_tpu.parallel.mesh import DATA_AXIS


def all_reduce_mean(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Mean of per-shard values over the data axis (the reference's
    ``all_reduce`` of scalar metrics, ``distributed.py:53-69``)."""

    def body(v):
        return jax.lax.pmean(v, DATA_AXIS)

    return shard_map(
        body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
    )(x)


def all_gather_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Differentiable all-gather of batch-sharded activations (the dormant
    reference ``AllGather`` autograd fn, ``distributed.py:13-29``; gradients
    slice back to the local shard automatically). Output is replicated."""

    def body(v):
        return jax.lax.all_gather(v, DATA_AXIS, axis=0, tiled=True)

    return shard_map(
        body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
        check_rep=False,
    )(x)


def broadcast_object(obj: Any, is_source: bool | None = None) -> Any:
    """Host-side pickled-object broadcast from process 0 (the reference's
    gloo side channel, ``distributed.py:167-178``)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(
        obj, is_source=is_source
    )


def sync_global_barrier(name: str = "barrier") -> None:
    """Cross-host barrier (reference ``synchronize``, ``distributed.py``)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def get_world_size() -> int:
    return jax.device_count()


def get_rank() -> int:
    return jax.process_index()


def is_master_proc(num_gpus: int = None) -> bool:
    """reference ``distributed.py:160-166``."""
    del num_gpus
    return jax.process_index() == 0
