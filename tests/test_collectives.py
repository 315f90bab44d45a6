"""Collective helpers on the 8-device CPU mesh: psum means, differentiable
all-gather with sliced gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from procedurevrl_tpu.parallel.collectives import (
    all_gather_batch, all_reduce_mean, get_world_size, is_master_proc,
)
from procedurevrl_tpu.parallel.mesh import batch_sharding, build_mesh


def test_all_reduce_mean():
    mesh = build_mesh()
    n = mesh.shape["data"]
    x = jnp.arange(n, dtype=jnp.float32)
    x = jax.device_put(x, batch_sharding(mesh))
    out = all_reduce_mean(mesh, x)
    assert float(out.reshape(-1)[0]) == float(np.mean(np.arange(n)))


def test_all_gather_batch_and_grad_slicing():
    mesh = build_mesh()
    n = mesh.shape["data"]
    x = jnp.arange(2 * n, dtype=jnp.float32).reshape(2 * n, 1)
    x = jax.device_put(x, batch_sharding(mesh))

    gathered = all_gather_batch(mesh, x)
    np.testing.assert_array_equal(
        np.asarray(gathered).ravel(), np.arange(2 * n)
    )

    # gradient flows back sliced: d/dx sum(g(x)**2) == 2x
    def loss(x):
        return jnp.sum(all_gather_batch(mesh, x) ** 2)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x))


def test_rank_helpers():
    assert get_world_size() == len(jax.devices())
    assert is_master_proc() is True
