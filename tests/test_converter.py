"""Full-checkpoint converter: reference key layout -> flax trees, including
the MViT video_encoder nesting and IN1k 2D->3D inflation."""

import numpy as np
import torch

from procedurevrl_tpu.utils.converter import (
    convert_procedurevrl, inflate_mvit_in1k, strip_prefixes,
)


def _ts_encoder_state(dim=16, depth=1, heads=2):
    s = {}
    s["patch_embed.proj.weight"] = torch.randn(dim, 3, 16, 16)
    s["patch_embed.proj.bias"] = torch.randn(dim)
    s["cls_token"] = torch.randn(1, 1, dim)
    s["pos_embed"] = torch.randn(1, 5, dim)
    s["time_embed"] = torch.randn(1, 2, dim)
    for i in range(depth):
        p = f"blocks.{i}."
        for ln in ("norm1", "norm2", "temporal_norm1"):
            s[p + ln + ".weight"] = torch.randn(dim)
            s[p + ln + ".bias"] = torch.randn(dim)
        for a in ("attn", "temporal_attn"):
            s[p + a + ".qkv.weight"] = torch.randn(3 * dim, dim)
            s[p + a + ".qkv.bias"] = torch.randn(3 * dim)
            s[p + a + ".proj.weight"] = torch.randn(dim, dim)
            s[p + a + ".proj.bias"] = torch.randn(dim)
        s[p + "temporal_fc.weight"] = torch.randn(dim, dim)
        s[p + "temporal_fc.bias"] = torch.randn(dim)
        s[p + "mlp.fc1.weight"] = torch.randn(4 * dim, dim)
        s[p + "mlp.fc1.bias"] = torch.randn(4 * dim)
        s[p + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim)
        s[p + "mlp.fc2.bias"] = torch.randn(dim)
    s["norm.weight"] = torch.randn(dim)
    s["norm.bias"] = torch.randn(dim)
    return s


def test_convert_full_timesformer_checkpoint():
    dim = 16
    state = {"model." + k: v for k, v in _ts_encoder_state(dim).items()}
    state["model.head.weight"] = torch.randn(8, dim)
    state["model.head.bias"] = torch.randn(8)
    state["model.head_cls.weight"] = torch.randn(5, 8)
    state["model.head_cls.bias"] = torch.randn(5)
    tree = convert_procedurevrl(state)
    assert set(tree) == {"encoder", "head", "head_cls"}
    assert tree["encoder"]["patch_embed"]["kernel"].shape == (16 * 16 * 3, dim)
    assert tree["head"]["kernel"].shape == (dim, 8)
    assert tree["head_cls"]["kernel"].shape == (8, 5)
    # transpose semantics: torch [out, in] -> flax [in, out]
    np.testing.assert_array_equal(
        tree["head"]["kernel"],
        state["model.head.weight"].numpy().T,
    )


def test_convert_mvit_checkpoint_nesting():
    s = {}
    s["video_encoder.patch_embed.proj.weight"] = torch.randn(8, 3, 3, 7, 7)
    s["video_encoder.patch_embed.proj.bias"] = torch.randn(8)
    s["video_encoder.cls_token"] = torch.randn(1, 1, 8)
    p = "video_encoder.blocks.0."
    for ln in ("norm1", "norm2"):
        s[p + ln + ".weight"] = torch.randn(8)
        s[p + ln + ".bias"] = torch.randn(8)
    s[p + "attn.qkv.weight"] = torch.randn(24, 8)
    s[p + "attn.qkv.bias"] = torch.randn(24)
    s[p + "attn.proj.weight"] = torch.randn(8, 8)
    s[p + "attn.proj.bias"] = torch.randn(8)
    s[p + "attn.pool_q.weight"] = torch.randn(4, 1, 3, 3, 3)
    s[p + "attn.norm_q.weight"] = torch.randn(4)
    s[p + "attn.norm_q.bias"] = torch.randn(4)
    s[p + "attn.rel_pos_h"] = torch.randn(7, 4)
    s[p + "mlp.fc1.weight"] = torch.randn(32, 8)
    s[p + "mlp.fc1.bias"] = torch.randn(32)
    s[p + "mlp.fc2.weight"] = torch.randn(8, 32)
    s[p + "mlp.fc2.bias"] = torch.randn(8)
    s["video_encoder.norm.weight"] = torch.randn(8)
    s["video_encoder.norm.bias"] = torch.randn(8)
    s["head.weight"] = torch.randn(6, 8)
    s["head.bias"] = torch.randn(6)

    tree = convert_procedurevrl(s)
    enc = tree["encoder"]
    assert enc["patch_embed_kernel"].shape == (3, 7, 7, 3, 8)
    assert enc["blocks_0"]["attn"]["pool_q"]["kernel"].shape == (3, 3, 3, 1, 4)
    assert enc["blocks_0"]["attn"]["rel_pos_h"].shape == (7, 4)
    assert tree["head"]["kernel"].shape == (8, 6)


def test_inflate_mvit_in1k():
    s = {
        "patch_embed.proj.weight": torch.randn(8, 3, 7, 7),
        "blocks.0.attn.pool_q.weight": torch.randn(4, 1, 3, 3),
        "blocks.0.attn.rel_pos_h": torch.randn(13, 4),
        "blocks.0.mlp.fc1.weight": torch.randn(32, 8),
    }
    out = inflate_mvit_in1k(s, time_kernel=3,
                            rel_pos_lens={"blocks.0.attn.rel_pos_h": 27})
    assert out["patch_embed.proj.weight"].shape == (8, 3, 3, 7, 7)
    # time-repeated, identical slices
    np.testing.assert_array_equal(
        out["patch_embed.proj.weight"][:, :, 0],
        out["patch_embed.proj.weight"][:, :, 2],
    )
    assert out["blocks.0.attn.pool_q.weight"].shape == (4, 1, 3, 3, 3)
    assert out["blocks.0.attn.rel_pos_h"].shape == (27, 4)
    assert out["blocks.0.mlp.fc1.weight"].shape == (32, 8)


def test_strip_prefixes():
    s = {"module.model.a": 1, "module.model.b": 2}
    assert set(strip_prefixes(s)) == {"a", "b"}
    s2 = {"model.a": 1, "other.b": 2}  # mixed: no strip
    assert set(strip_prefixes(s2)) == {"model.a", "other.b"}
