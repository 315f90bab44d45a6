"""Round-3 wiring fixes (VERDICT round-2 items 6-9).

- EPIC eval-epoch logs the verb/noun/action triplet via ``EPICValMeter``
  (reference ``tools/train_net.py:298-325``, ``lib/utils/meters.py:798-978``);
- per-LOG_PERIOD TensorBoard writing emits one scalar dict per drained
  iteration (reference writes train scalars every iteration,
  reference ``tools/train_net.py:224-247``).
"""

import os

import numpy as np
import pytest

from procedurevrl_tpu.config import get_cfg


def _tiny_epic_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "EK",
                     "egocentric_action_classification.yaml")
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.ENABLE = False
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.LOG_PERIOD = 2
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.MIXUP.ENABLED = False
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_epic_eval_epoch_logs_triplet(tmp_path, monkeypatch):
    """EPIC val-epoch stats carry verb/noun/action top-1 and top-5."""
    from procedurevrl_tpu.utils import logging as logging_util
    from tools.train_net import train

    records = []
    real = logging_util.log_json_stats
    monkeypatch.setattr(
        logging_util, "log_json_stats",
        lambda stats: (records.append(dict(stats)), real(stats))[1],
    )
    cfg = _tiny_epic_cfg(tmp_path)
    train(cfg)
    val_epochs = [r for r in records if r.get("_type") == "val_epoch"]
    assert val_epochs, "no val_epoch stats logged"
    stats = val_epochs[-1]
    for key in ("verb_top1_acc", "verb_top5_acc", "noun_top1_acc",
                "noun_top5_acc", "top1_acc", "top5_acc"):
        assert key in stats, f"missing {key} in EPIC val_epoch stats"
        assert 0.0 <= float(stats[key]) <= 100.0
    # train-iter stats also carry the verb/noun extras
    train_iters = [r for r in records if r.get("_type") == "train_iter"]
    assert any("verb_top1_acc" in r for r in train_iters)


def test_epic_val_meter_is_best_epoch():
    from procedurevrl_tpu.utils.meters import EPICValMeter

    cfg = get_cfg()
    m = EPICValMeter(4, cfg)
    m.update_stats((50.0, 40.0, 30.0), (80.0, 70.0, 60.0), 8)
    assert m.log_epoch_stats(0) is True  # first epoch: action top1 improved
    m.reset()
    m.update_stats((10.0, 10.0, 10.0), (20.0, 20.0, 20.0), 8)
    assert m.log_epoch_stats(1) is False  # worse action top1
    assert m.max_acc["action_top1"] == 30.0


class _FakeWriter:
    def __init__(self):
        self.calls = []  # (scalars_dict, global_step)

    def add_scalars(self, scalars, global_step=None):
        self.calls.append((dict(scalars), global_step))

    def close(self):
        pass


def test_tensorboard_writes_every_iteration(tmp_path, monkeypatch):
    """Every drained pending entry gets its own add_scalars call at its own
    global step (not just the last of each LOG_PERIOD window)."""
    import procedurevrl_tpu.visualization as vis_mod
    from tools.train_net import train

    fake = _FakeWriter()
    monkeypatch.setattr(vis_mod, "TensorboardWriter", lambda cfg: fake)

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "COIN",
                     "step_classification.yaml")
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 8
    cfg.TEST.ENABLE = False
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.LOG_PERIOD = 4
    cfg.TRAIN.EVAL_PERIOD = 10
    cfg.TRAIN.CHECKPOINT_PERIOD = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TENSORBOARD.ENABLE = True
    cfg.OUTPUT_DIR = str(tmp_path)
    train(cfg)

    # 64 synthetic samples / batch 8 = 8 iterations -> 8 writes, steps 0..7
    steps = [s for _, s in fake.calls]
    assert steps == list(range(8)), steps
    assert all("Train/loss" in sc for sc, _ in fake.calls)


def _tiny_coin_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "COIN",
                     "step_classification.yaml")
    )
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.GLOBAL_BATCH_SIZE = 16  # accum = 2
    cfg.TEST.ENABLE = False
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.LOG_PERIOD = 4
    cfg.TRAIN.EVAL_PERIOD = 10
    cfg.TRAIN.CHECKPOINT_PERIOD = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_grad_accum_composes_with_zero1(tmp_path):
    """Streaming accumulation with TPU.SHARD_OPT_STATE (ZeRO-1 moments +
    sharded grad accumulator) reproduces the replicated-accumulation run
    on the 8-device mesh (VERDICT round-2 item 8)."""
    import jax

    from tools.train_net import train

    cfg = _tiny_coin_cfg(tmp_path / "rep")
    state_rep = train(cfg)

    cfg_z = _tiny_coin_cfg(tmp_path / "zero1")
    cfg_z.TPU.SHARD_OPT_STATE = True
    state_z = train(cfg_z)

    assert int(state_rep.step) == 4  # 8 micro-batches / accum 2
    assert int(state_z.step) == 4
    pa = jax.device_get(state_rep.params)
    pb = jax.device_get(state_z.params)
    flat_a, tree_a = jax.tree_util.tree_flatten(pa)
    flat_b, tree_b = jax.tree_util.tree_flatten(pb)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-5, rtol=2e-5
        )


def test_flash_kernels_partition_under_tp_mesh():
    """flash_attention_headfused / flash_attention_cls run sharded over a
    (data x model) mesh via custom_partitioning — batch over data, head
    groups over model — and match the unsharded result, fwd and grad
    (VERDICT round-2 item 3)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from procedurevrl_tpu.ops.pallas_attention import (
        flash_attention_cls, flash_attention_headfused,
    )
    from procedurevrl_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(data=4, model=2)
    rng = np.random.RandomState(0)
    B, N, H, d = 8, 196, 12, 64
    C = H * d
    q, k, v = (jnp.asarray(rng.randn(B, N, C).astype(np.float32))
               for _ in range(3))
    qc, kc, vc = (jnp.asarray(rng.randn(B, 1, C).astype(np.float32))
                  for _ in range(3))
    scale = d ** -0.5
    shard = NamedSharding(mesh, P("data", None, "model"))

    def loss(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_headfused(q, k, v, H, scale)))

    base = jax.jit(jax.value_and_grad(loss))(q, k, v)
    with mesh:
        qs, ks, vs = (jax.device_put(t, shard) for t in (q, k, v))
        sharded = jax.jit(jax.value_and_grad(loss))(qs, ks, vs)
    np.testing.assert_allclose(float(base[0]), float(sharded[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(sharded[1]),
                               atol=1e-4, rtol=1e-4)

    def loss_cls(q, k, v, qc, kc, vc):
        o, oc = flash_attention_cls(q, k, v, qc, kc, vc, H, scale)
        return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.sin(oc))

    base_c = jax.jit(loss_cls)(q, k, v, qc, kc, vc)
    with mesh:
        args_s = [jax.device_put(t, shard) for t in (q, k, v, qc, kc, vc)]
        shard_c = jax.jit(loss_cls)(*args_s)
    np.testing.assert_allclose(float(base_c), float(shard_c), rtol=1e-5)
