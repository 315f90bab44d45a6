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


class OracleQuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class OracleCLIPBlock(nn.Module):
    """reference lib/models/tfm_model.py:32-53"""

    def __init__(self, d, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads, dropout=0.0)
        self.ln_1 = nn.LayerNorm(d)
        self.c_fc = nn.Linear(d, d * 4)
        self.c_proj = nn.Linear(d * 4, d)
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, pad_mask=None):
        # x: [T, B, C]
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, key_padding_mask=pad_mask)[0]
        h = self.c_proj(OracleQuickGELU()(self.c_fc(self.ln_2(x))))
        return x + h


class OracleOrderTransformer(nn.Module):
    """reference lib/models/tfm_model.py:70-329"""

    def __init__(self, num_seg=8, layers=4, heads=8, hidden=512, max_len=9):
        super().__init__()
        self.num_seg, self.layers, self.hidden, self.max_len = num_seg, layers, hidden, max_len
        self.pad_embedding = nn.Embedding(1, hidden)
        self.type_embedding = nn.Embedding(2, hidden)
        self.temporalEmbedding = nn.Embedding(max_len, hidden)
        self.resblocks = nn.ModuleList([OracleCLIPBlock(hidden, heads) for _ in range(layers)])
        self.time_fc1 = nn.Linear(hidden // 4, hidden)
        self.time_fc2 = nn.Linear(hidden, hidden)
        betas = torch.linspace(1e-4, 0.02, layers)
        alphas = 1.0 - betas
        ac = torch.cumprod(alphas, dim=0)
        self.sqrt_ac = torch.sqrt(ac)
        self.sqrt_1mac = torch.sqrt(1.0 - ac)

    def time_emb(self, t):
        half = (self.hidden // 4) // 2
        freqs = torch.exp(torch.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([args.sin(), args.cos()], dim=-1)
        return self.time_fc2(F.gelu(self.time_fc1(emb)))

    def ennoise(self, x0, noise, t):
        return self.sqrt_ac[t][:, None] * x0 + self.sqrt_1mac[t][:, None] * noise

    def run_blocks(self, x, pad_mask):
        for blk in self.resblocks:
            x = blk(x, pad_mask)
        return x

    def level(self, feats, mask_inds, bs_inds, temp_emb, pad_mask, t):
        # feats: [L, B, C]
        L, B, C = feats.shape
        type_emb = self.type_embedding(torch.zeros(L, B, dtype=torch.long))
        type_emb[mask_inds, bs_inds] = self.type_embedding(torch.ones(B, dtype=torch.long))
        x = feats + type_emb + temp_emb
        x = x + self.time_emb(t).unsqueeze(0)
        x = self.run_blocks(x, pad_mask)
        return x[mask_inds, bs_inds]

    def pretrain(self, x, mask_inds, pad_start, level_noise):
        # x: [B*L, C] sample-major
        L, C = self.max_len, self.hidden
        B = x.shape[0] // L
        feats = x.reshape(B, L, C).permute(1, 0, 2).contiguous()  # [L, B, C]
        bs_inds = torch.arange(B)
        temp_emb = self.temporalEmbedding(torch.arange(L)).unsqueeze(1).expand(L, B, C)

        x0 = feats[mask_inds, bs_inds]
        pad_mask = torch.zeros(B, L, dtype=torch.bool)
        for i in range(B):
            if pad_start[i] < L:
                feats[pad_start[i]:, i] = self.pad_embedding.weight
            pad_mask[i, pad_start[i]:] = True

        denoised_list = []
        denoised = None
        for time_i in range(self.layers):
            t_index = self.layers - 1 - time_i
            t = torch.full((B,), t_index, dtype=torch.long)
            noise = level_noise[time_i]
            src = x0 if time_i == 0 else denoised
            noisy = self.ennoise(src.detach(), noise, t)
            lf = feats.clone()
            lf[mask_inds, bs_inds] = noisy
            denoised = self.level(lf, mask_inds, bs_inds, temp_emb, pad_mask, t)
            denoised_list.append(denoised)
        x0_exp = x0.unsqueeze(0).expand(self.layers, -1, -1).reshape(-1, C)
        return denoised, x0_exp, torch.cat(denoised_list)

    def forecast(self, x):
        C = self.hidden
        B = x.shape[0] // self.num_seg
        feats = x.reshape(B, self.num_seg, C).permute(1, 0, 2).contiguous()
        feats = torch.cat([feats, torch.zeros(1, B, C)], dim=0)
        L = self.num_seg + 1
        bs_inds = torch.arange(B)
        mask_inds = torch.full((B,), self.max_len - 1, dtype=torch.long)
        temp_emb = self.temporalEmbedding(torch.arange(self.max_len)).unsqueeze(1).expand(self.max_len, B, C)
        denoised = None
        cf = feats.clone()
        for time_i in range(self.layers):
            t_index = self.layers - 1 - time_i
            t = torch.full((B,), t_index, dtype=torch.long)
            if time_i != 0:
                noisy = self.ennoise(denoised.detach(), torch.zeros(B, C), t)
                cf = feats.clone()
                cf[mask_inds, bs_inds] = noisy
            denoised = self.level(cf, mask_inds, bs_inds, temp_emb, None, t)
        return denoised


class OracleTimeSformer(nn.Module):
    """reference lib/models/vit.py:183-423 (eval mode), including the
    nearest-resize branches for a mismatched input resolution
    (vit.py:375-388) and frame count (vit.py:399-404)."""

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
        x = torch.cat([cls, x], dim=1)
        if x.size(1) != self.pos_embed.size(1):
            # resolution mismatch: nearest-resize the patch pos embeddings
            cls_pe = self.pos_embed[:, :1, :]
            other = self.pos_embed[:, 1:, :].transpose(1, 2)
            P = int(other.size(2) ** 0.5)
            Hp = n // Wp
            other = other.reshape(1, D, P, P)
            new_pe = F.interpolate(other, size=(Hp, Wp), mode="nearest")
            new_pe = new_pe.flatten(2).transpose(1, 2)
            x = x + torch.cat([cls_pe, new_pe], dim=1)
        else:
            x = x + self.pos_embed
        cls = x[:B, :1, :]
        x = x[:, 1:].reshape(B, T, n, D)
        if T != self.time_embed.size(1):
            te = F.interpolate(
                self.time_embed.transpose(1, 2), size=T, mode="nearest"
            ).transpose(1, 2)
        else:
            te = self.time_embed
        x = x + te.unsqueeze(2)
        x = x.permute(0, 2, 1, 3).reshape(B, n * T, D)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x, B, T, Wp)
        return self.norm(x)[:, 0]
