"""Build-time pretrained-encoder init (ImageNet ViT -> TimeSformer
inflation), the reference load_pretrained path
(reference ``lib/models/vit.py:487-505``, ``lib/models/helpers.py:100``)."""

import os
import tempfile

import jax
import numpy as np
import torch

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.models.build import build_model
from procedurevrl_tpu.utils import checkpoint as cu
from tools.train_net import init_params


def _imagenet_vit_state(dim=768, depth=1):
    sd = {
        "patch_embed.proj.weight": torch.randn(dim, 3, 16, 16),
        "patch_embed.proj.bias": torch.randn(dim),
        "cls_token": torch.randn(1, 1, dim),
        "pos_embed": torch.randn(1, 197, dim),
        "norm.weight": torch.randn(dim),
        "norm.bias": torch.randn(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[p + ln + ".weight"] = torch.randn(dim)
            sd[p + ln + ".bias"] = torch.randn(dim)
        sd[p + "attn.qkv.weight"] = torch.randn(3 * dim, dim)
        sd[p + "attn.qkv.bias"] = torch.randn(3 * dim)
        sd[p + "attn.proj.weight"] = torch.randn(dim, dim)
        sd[p + "attn.proj.bias"] = torch.randn(dim)
        sd[p + "mlp.fc1.weight"] = torch.randn(4 * dim, dim)
        sd[p + "mlp.fc1.bias"] = torch.randn(4 * dim)
        sd[p + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim)
        sd[p + "mlp.fc2.bias"] = torch.randn(dim)
    return sd


def test_pretrained_encoder_init():
    sd = _imagenet_vit_state()
    f = tempfile.mktemp(suffix=".pth")
    torch.save(sd, f)
    try:
        cfg = get_cfg()
        cfg.DEV.LOAD_DUMMY_DATA = True
        cfg.TRAIN.DATASET = "howto100m_develop"
        cfg.MODEL.MODEL_NAME = "vit_base_patch16_224_develop"
        cfg.MODEL.NUM_CLASSES = 8
        cfg.TIMESFORMER.DEPTH = 1
        cfg.TIMESFORMER.PRETRAINED_MODEL = f
        cfg.DATA.NUM_FRAMES = 2
        model, bank = build_model(cfg)
        params = jax.device_get(init_params(cfg, model, bank))
        p2 = cu.load_pretrained_encoder(cfg, params)

        blk = p2["encoder"]["blocks_0"]
        np.testing.assert_allclose(
            blk["attn"]["qkv_kernel"], sd["blocks.0.attn.qkv.weight"].numpy().T
        )
        # temporal attention inflated from spatial attention
        np.testing.assert_allclose(
            blk["temporal_attn"]["qkv_kernel"],
            sd["blocks.0.attn.qkv.weight"].numpy().T,
        )
        # temporal_fc zero-initialized (residual no-op at start)
        assert np.abs(blk["temporal_fc"]["kernel"]).sum() == 0
        np.testing.assert_allclose(
            p2["encoder"]["cls_token"], sd["cls_token"].numpy()
        )
    finally:
        os.unlink(f)
