"""Device-prefetch iterator: order preservation, sharded placement,
host batch passthrough."""

import jax
import numpy as np

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.datasets import loader as loader_mod
from procedurevrl_tpu.datasets.build import build_dataset
from procedurevrl_tpu.parallel.mesh import build_mesh


def test_prefetch_to_device_order_and_placement():
    cfg = get_cfg()
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.TRAIN.DATASET = "howto100m_develop"
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.MODEL.NUM_CLASSES = 7
    ds = build_dataset("howto100m_develop", cfg, "train")
    loader = loader_mod.Loader(ds, global_batch_size=16, shuffle=False,
                               drop_last=True, num_workers=2)
    mesh = build_mesh()

    seen = []
    for dev_batch, n_valid, extra, host_batch in loader_mod.prefetch_to_device(
        loader, mesh, size=2
    ):
        assert isinstance(dev_batch["frames"], jax.Array)
        assert dev_batch["frames"].shape == host_batch["frames"].shape
        # sharded over the data axis of the mesh
        assert len(dev_batch["frames"].sharding.device_set) == len(jax.devices())
        seen.append(np.asarray(host_batch["index"]))
    assert len(seen) == 4
    np.testing.assert_array_equal(np.concatenate(seen), np.arange(64))
