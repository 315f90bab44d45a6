"""Self-contained PyTorch oracles reproducing the reference model math.

Used only by the parity tests: each oracle re-states the semantics of the
corresponding reference module (file:line cited per class) so the JAX
implementation can be checked numerically without golden files.  CPU-only,
float64-free, test-only code.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleAttention(nn.Module):
    """reference lib/models/vit.py:62-92"""

    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.h = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class OracleDividedBlock(nn.Module):
    """reference lib/models/vit.py:94-158 (divided_space_time, eval mode)"""

    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, num_heads)
        self.temporal_norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.temporal_attn = OracleAttention(dim, num_heads)
        self.temporal_fc = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, B, T, W):
        n_spatial = (x.size(1) - 1) // T
        H = n_spatial // W
        D = x.size(-1)

        xt = x[:, 1:, :].reshape(B * H * W, T, D)
        res_t = self.temporal_attn(self.temporal_norm1(xt))
        res_t = self.temporal_fc(res_t.reshape(B, H * W * T, D))
        xt = x[:, 1:, :] + res_t

        init_cls = x[:, :1, :]
        cls = init_cls.expand(B, T, D).reshape(B * T, 1, D)
        xs = xt.reshape(B, H * W, T, D).permute(0, 2, 1, 3).reshape(B * T, H * W, D)
        xs = torch.cat([cls, xs], dim=1)
        res_s = self.attn(self.norm1(xs))

        cls_out = res_s[:, 0, :].reshape(B, T, D).mean(dim=1, keepdim=True)
        res_s = (
            res_s[:, 1:, :].reshape(B, T, H * W, D).permute(0, 2, 1, 3).reshape(B, H * W * T, D)
        )
        x = torch.cat([init_cls, xt], dim=1) + torch.cat([cls_out, res_s], dim=1)
        h = self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x + h


class OracleTimeSformer(nn.Module):
    """reference lib/models/vit.py:183-423 (eval mode, matching resolution)"""

    def __init__(self, img_size, patch, dim, depth, heads, num_frames):
        super().__init__()
        self.patch = patch
        n = (img_size // patch) ** 2
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
        self.time_embed = nn.Parameter(torch.zeros(1, num_frames, dim))
        self.blocks = nn.ModuleList(
            [OracleDividedBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        # x: [B, C, T, H, W]
        B, C, T, H, W = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        x = self.proj(x)
        Wp = x.size(-1)
        x = x.flatten(2).transpose(1, 2)  # [B*T, N, D]
        D = x.size(-1)
        n = x.size(1)
        cls = self.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        cls = x[:B, :1, :]
        x = x[:, 1:].reshape(B, T, n, D) + self.time_embed.unsqueeze(2)
        x = x.permute(0, 2, 1, 3).reshape(B, n * T, D)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x, B, T, Wp)
        return self.norm(x)[:, 0]
