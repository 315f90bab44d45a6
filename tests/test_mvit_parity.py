"""MViT pooled-attention / block / encoder parity vs self-contained torch
oracles restating the reference math (reference
``lib/models/slowfast_mvit/attention.py:14-568``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from procedurevrl_tpu.models.mvit import (
    MultiScaleAttention, MultiScaleBlock, MViTConfig, MViTEncoder,
)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def oracle_attention_pool(tensor, pool, thw_shape, has_cls, norm=None):
    """reference attention.py:14-48"""
    if pool is None:
        return tensor, thw_shape
    cls_tok = None
    if has_cls:
        cls_tok, tensor = tensor[:, :, :1, :], tensor[:, :, 1:, :]
    B, N, L, C = tensor.shape
    T, H, W = thw_shape
    tensor = tensor.reshape(B * N, T, H, W, C).permute(0, 4, 1, 2, 3).contiguous()
    tensor = pool(tensor)
    thw_shape = [tensor.shape[2], tensor.shape[3], tensor.shape[4]]
    L_pooled = tensor.shape[2] * tensor.shape[3] * tensor.shape[4]
    tensor = tensor.reshape(B, N, C, L_pooled).transpose(2, 3)
    if cls_tok is not None:
        tensor = torch.cat((cls_tok, tensor), dim=2)
    if norm is not None:
        tensor = norm(tensor)
    return tensor, thw_shape


def oracle_rel_pos_spatial(attn, q, has_cls, q_shape, k_shape, Rh_table, Rw_table):
    """reference attention.py:67-117 with pre-gathered tables."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, n_head, q_N, dim = q.shape
    r_q = q[:, :, sp:].reshape(B, n_head, q_t, q_h, q_w, dim)
    rel_h = torch.einsum("bythwc,hkc->bythwk", r_q, Rh_table)
    rel_w = torch.einsum("bythwc,wkc->bythwk", r_q, Rw_table)
    attn[:, :, sp:, sp:] = (
        attn[:, :, sp:, sp:].view(B, -1, q_t, q_h, q_w, k_t, k_h, k_w)
        + rel_h[:, :, :, :, :, None, :, None]
        + rel_w[:, :, :, :, :, None, None, :]
    ).view(B, -1, q_t * q_h * q_w, k_t * k_h * k_w)
    return attn


def oracle_rel_pos_temporal(attn, q, has_cls, q_shape, k_shape, Rt_table):
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, n_head, q_N, dim = q.shape
    r_q = q[:, :, sp:].reshape(B, n_head, q_t, q_h, q_w, dim)
    rel = torch.einsum("bythwc,tkc->bythwk", r_q, Rt_table)
    attn[:, :, sp:, sp:] = (
        attn[:, :, sp:, sp:].view(B, -1, q_t, q_h, q_w, k_t, k_h, k_w)
        + rel[:, :, :, :, :, :, None, None]
    ).view(B, -1, q_t * q_h * q_w, k_t * k_h * k_w)
    return attn


def rel_dist(q_size, k_size):
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (
        torch.arange(q_size)[:, None] * q_ratio
        - torch.arange(k_size)[None, :] * k_ratio
    )
    dist += (k_size - 1) * k_ratio
    return dist.long()


class OracleMSA(nn.Module):
    """MultiScaleAttention oracle: conv pooling, fused qkv, rel pos,
    residual pooling (reference attention.py:162-442)."""

    def __init__(self, dim, dim_out, input_size, num_heads, kernel, stride_q,
                 stride_kv, rel_pos=True, residual_pooling=True):
        super().__init__()
        self.num_heads = num_heads
        self.dim_out = dim_out
        head_dim = dim_out // num_heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim_out * 3, bias=True)
        self.proj = nn.Linear(dim_out, dim_out)
        hd = head_dim
        mk = lambda s: nn.Conv3d(hd, hd, kernel, stride=s,
                                 padding=[k // 2 for k in kernel], groups=hd,
                                 bias=False)
        self.pool_q = mk(stride_q) if np.prod(stride_q) * np.prod(kernel) > 1 else None
        self.pool_k = mk(stride_kv) if np.prod(stride_kv) * np.prod(kernel) > 1 else None
        self.pool_v = mk(stride_kv) if np.prod(stride_kv) * np.prod(kernel) > 1 else None
        self.norm_q = nn.LayerNorm(hd, eps=1e-6) if self.pool_q is not None else None
        self.norm_k = nn.LayerNorm(hd, eps=1e-6) if self.pool_k is not None else None
        self.norm_v = nn.LayerNorm(hd, eps=1e-6) if self.pool_v is not None else None
        self.rel_pos = rel_pos
        self.residual_pooling = residual_pooling
        if rel_pos:
            size = input_size[1]
            q_size = size // stride_q[1]
            kv_size = size // stride_kv[1]
            rel_sp_dim = 2 * max(q_size, kv_size) - 1
            self.rel_pos_h = nn.Parameter(torch.randn(rel_sp_dim, hd) * 0.02)
            self.rel_pos_w = nn.Parameter(torch.randn(rel_sp_dim, hd) * 0.02)
            self.rel_pos_t = nn.Parameter(
                torch.randn(2 * input_size[0] - 1, hd) * 0.02
            )

    def forward(self, x, thw):
        B, N, _ = x.shape
        qkv = (self.qkv(x).reshape(B, N, 3, self.num_heads, -1)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, q_shape = oracle_attention_pool(q, self.pool_q, thw, True, self.norm_q)
        k, k_shape = oracle_attention_pool(k, self.pool_k, thw, True, self.norm_k)
        v, v_shape = oracle_attention_pool(v, self.pool_v, thw, True, self.norm_v)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        if self.rel_pos:
            Rh = self.rel_pos_h[rel_dist(q_shape[1], k_shape[1])]
            Rw = self.rel_pos_w[rel_dist(q_shape[2], k_shape[2])]
            Rt = self.rel_pos_t[rel_dist(q_shape[0], k_shape[0])]
            attn = oracle_rel_pos_spatial(attn, q, True, q_shape, k_shape, Rh, Rw)
            attn = oracle_rel_pos_temporal(attn, q, True, q_shape, k_shape, Rt)
        attn = attn.softmax(dim=-1)
        x = attn @ v
        if self.residual_pooling:
            x[:, :, 1:, :] += q[:, :, 1:, :]
        x = x.transpose(1, 2).reshape(B, -1, self.dim_out)
        return self.proj(x), q_shape


def copy_msa_params(oracle: OracleMSA, params: dict, with_pool=True,
                    rel_pos=True):
    """Copy flax MultiScaleAttention params into the torch oracle."""
    sd = {}
    sd["qkv.weight"] = torch.tensor(np.asarray(params["qkv"]["kernel"]).T)
    sd["qkv.bias"] = torch.tensor(np.asarray(params["qkv"]["bias"]))
    sd["proj.weight"] = torch.tensor(np.asarray(params["proj"]["kernel"]).T)
    sd["proj.bias"] = torch.tensor(np.asarray(params["proj"]["bias"]))
    if with_pool:
        for name in ("q", "k", "v"):
            w = np.asarray(params[f"pool_{name}"]["kernel"])  # [kt,kh,kw,1,hd]
            sd[f"pool_{name}.weight"] = torch.tensor(
                w.transpose(4, 3, 0, 1, 2)
            )
            sd[f"norm_{name}.weight"] = torch.tensor(
                np.asarray(params[f"norm_{name}"]["scale"]))
            sd[f"norm_{name}.bias"] = torch.tensor(
                np.asarray(params[f"norm_{name}"]["bias"]))
    if rel_pos:
        sd["rel_pos_h"] = torch.tensor(np.asarray(params["rel_pos_h"]))
        sd["rel_pos_w"] = torch.tensor(np.asarray(params["rel_pos_w"]))
        sd["rel_pos_t"] = torch.tensor(np.asarray(params["rel_pos_t"]))
    oracle.load_state_dict(sd)


@pytest.mark.parametrize("stride_q", [(1, 1, 1), (1, 2, 2)])
def test_multiscale_attention_parity(stride_q):
    rng = np.random.RandomState(0)
    dim, dim_out, heads = 8, 16, 2
    thw = (2, 4, 4)
    kernel, stride_kv = (3, 3, 3), (1, 2, 2)
    N = 1 + int(np.prod(thw))
    x = rng.randn(2, N, dim).astype(np.float32)

    msa = MultiScaleAttention(
        dim=dim, dim_out=dim_out, input_size=thw, num_heads=heads,
        qkv_bias=True, kernel_q=kernel, kernel_kv=kernel,
        stride_q=stride_q, stride_kv=stride_kv, mode="conv",
        has_cls_embed=True, rel_pos_spatial=True, rel_pos_temporal=True,
        residual_pooling=True,
    )
    variables = msa.init(jax.random.PRNGKey(0), jnp.asarray(x), thw)
    out_jax, q_shape = msa.apply(variables, jnp.asarray(x), thw)

    oracle = OracleMSA(dim, dim_out, thw, heads, kernel, stride_q, stride_kv)
    copy_msa_params(oracle, variables["params"])
    with torch.no_grad():
        out_t, q_shape_t = oracle(torch.tensor(x), list(thw))

    assert tuple(q_shape) == tuple(q_shape_t)
    np.testing.assert_allclose(
        np.asarray(out_jax), out_t.numpy(), atol=2e-5, rtol=2e-5
    )


def test_block_schedule_matches_reference_derivation():
    """MViT-v2-S schedule: dims 96->768, heads 1->8, q-pool at 1/3/14,
    adaptive KV strides (reference mvit.py:141-246)."""
    from procedurevrl_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file("configs/HowTo100M/procedurevrl_mvitv2_adamw.yaml")
    cfg.DATA.NUM_FRAMES = 16
    mc = MViTConfig.from_cfg(cfg)
    plan, patch_dims, final_dim = mc.block_schedule()
    assert patch_dims == [8, 56, 56]
    assert final_dim == 768
    assert plan[0]["num_heads"] == 1 and plan[15]["num_heads"] == 8
    assert plan[1]["stride_q"] == (1, 2, 2)
    assert plan[0]["stride_kv"] == (1, 8, 8)
    assert plan[2]["stride_kv"] == (1, 4, 4)   # adaptive halving after q-pool
    assert plan[14]["dim"] == 384 and plan[14]["dim_out"] == 768
    assert plan[15]["input_size"] == (8, 7, 7)


def test_mvit_encoder_grad_finite():
    cfg = MViTConfig(
        spatial_size=32, temporal_size=4, embed_dim=8, num_heads=1, depth=3,
        dim_mul=((1, 2.0),), head_mul=((1, 2.0),),
        pool_q_stride=((1, 1, 2, 2),), pool_kv_stride_adaptive=(1, 4, 4),
        pool_kvq_kernel=(3, 3, 3),
        patch_kernel=(3, 7, 7), patch_stride=(2, 4, 4), patch_padding=(1, 3, 3),
    )
    enc = MViTEncoder(cfg=cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 32, 32, 3), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(enc.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
