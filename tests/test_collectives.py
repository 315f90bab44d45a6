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


def test_zero1_opt_state_sharding_matches_replicated():
    """TPU.SHARD_OPT_STATE: one train step with AdamW moments partitioned
    over the 8-device data axis produces the same loss and parameters as
    the fully-replicated step (XLA inserts the ZeRO-1 gather), and the
    moment arrays are actually sharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.engine.steps import TrainState, make_train_step
    from procedurevrl_tpu.models.build import build_model
    from procedurevrl_tpu.parallel.mesh import (
        batch_sharding, build_mesh, replicated, shard_batch,
        zero1_state_shardings,
    )
    from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
    from tools.train_net import init_params

    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.MODEL.MODEL_NAME = "vit_base_patch16_224_develop"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.TEXT_MODEL = ""
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.TRAIN.LABEL_EMB = ""
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False

    mesh = build_mesh()
    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    sched = lr_schedule(cfg, 10)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ), cfg, sched,
    )
    step_fn = make_train_step(model, tx, cfg, label_emb, sched, 1)
    rep, data = replicated(mesh), batch_sharding(mesh)

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "frames": rng.randn(8, 2, 32, 32, 3).astype(np.float32),
        "labels": rng.randint(0, 8, (8,)).astype(np.int32),
    })
    key = jax.device_put(jax.random.PRNGKey(0), rep)

    state_r = jax.device_put(TrainState.create(params, tx), rep)
    new_r, m_r = jax.jit(step_fn, in_shardings=(rep, data, rep))(
        state_r, batch, key)

    state_z = TrainState.create(params, tx)
    zshard = zero1_state_shardings(state_z, mesh, min_size=1024)
    state_z = jax.device_put(state_z, zshard)
    new_z, m_z = jax.jit(
        step_fn, in_shardings=(zshard, data, rep),
        out_shardings=(zshard, rep),
    )(state_z, batch, key)

    assert abs(float(m_r["loss"]) - float(m_z["loss"])) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(new_r.params),
                    jax.tree_util.tree_leaves(new_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    # at least one moment leaf is genuinely partitioned
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(new_z.opt_state)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no optimizer leaf ended up sharded"


def test_tensor_parallel_param_sharding_matches_replicated():
    """mesh (data=4, model=2): Megatron-style column/row parameter
    shardings on qkv/proj/fc1/fc2 produce the same loss and updated params
    as the fully-replicated 8-way DP step (GSPMD inserts the per-block
    all-reduce over the model axis)."""
    import jax
    import numpy as np

    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.engine.steps import TrainState, make_train_step
    from procedurevrl_tpu.models.build import build_model
    from procedurevrl_tpu.parallel.mesh import (
        batch_sharding, build_mesh, replicated, shard_batch,
        tp_param_shardings, tp_state_shardings,
    )
    from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
    from tools.train_net import init_params

    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.MODEL.MODEL_NAME = "vit_base_patch16_224_develop"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.TEXT_MODEL = ""
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.TRAIN.LABEL_EMB = ""
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.TPU.USE_PALLAS_ATTENTION = False  # kernels are not partition-aware

    model, label_emb = build_model(cfg)
    params = init_params(cfg, model, label_emb)
    sched = lr_schedule(cfg, 10)
    tx = construct_optimizer(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ), cfg, sched,
    )
    step_fn = make_train_step(model, tx, cfg, label_emb, sched, 1)

    rng = np.random.RandomState(0)
    np_batch = {
        "frames": rng.randn(8, 2, 32, 32, 3).astype(np.float32),
        "labels": rng.randint(0, 8, (8,)).astype(np.int32),
    }
    key = jax.random.PRNGKey(0)

    # reference: pure 8-way DP
    mesh_dp = build_mesh(data=8, model=1)
    rep = replicated(mesh_dp)
    state_r = jax.device_put(TrainState.create(params, tx), rep)
    new_r, m_r = jax.jit(
        step_fn, in_shardings=(rep, batch_sharding(mesh_dp), rep)
    )(state_r, shard_batch(mesh_dp, np_batch), jax.device_put(key, rep))

    # 4x2 (data, model) with TP param shardings
    mesh_tp = build_mesh(data=4, model=2)
    rep_tp = replicated(mesh_tp)
    p_shard = tp_param_shardings(params, mesh_tp)
    assert any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree_util.tree_leaves(p_shard)
    )
    state_t = TrainState.create(jax.device_put(params, p_shard), tx)
    st_shard = tp_state_shardings(state_t, mesh_tp)
    state_t = jax.device_put(state_t, st_shard)
    new_t, m_t = jax.jit(
        step_fn, in_shardings=(st_shard, batch_sharding(mesh_tp), rep_tp),
        out_shardings=(st_shard, rep_tp),
    )(state_t, shard_batch(mesh_tp, np_batch), jax.device_put(key, rep_tp))

    assert abs(float(m_r["loss"]) - float(m_t["loss"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(new_r.params),
                    jax.tree_util.tree_leaves(new_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
