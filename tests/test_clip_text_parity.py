"""CLIP text tower parity vs a torch oracle of ``clip_model.encode_text``
(causal attention, QuickGELU, EOT readout, projection)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.clip_text import CLIPTextEncoder
from procedurevrl_tpu.utils.converter import convert_clip_text


class OracleCLIPText(nn.Module):
    """OpenAI CLIP encode_text semantics (reference uses clip.load;
    math restated here)."""

    def __init__(self, vocab, ctx, width, heads, layers, embed_dim):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.empty(ctx, width))
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            blk = nn.ModuleDict({
                "ln_1": nn.LayerNorm(width),
                "attn": nn.MultiheadAttention(width, heads, batch_first=False),
                "ln_2": nn.LayerNorm(width),
                "c_fc": nn.Linear(width, width * 4),
                "c_proj": nn.Linear(width * 4, width),
            })
            self.blocks.append(blk)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.empty(width, embed_dim))
        self.ctx = ctx

    def forward(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding
        x = x.permute(1, 0, 2)  # seq-major like CLIP
        mask = torch.full((self.ctx, self.ctx), float("-inf"))
        mask.triu_(1)
        for blk in self.blocks:
            h = blk["ln_1"](x)
            a, _ = blk["attn"](h, h, h, need_weights=False, attn_mask=mask)
            x = x + a
            h = blk["ln_2"](x)
            h = blk["c_fc"](h)
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + blk["c_proj"](h)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        eot = ids.argmax(dim=-1)
        feats = x[torch.arange(x.size(0)), eot]
        return feats @ self.text_projection


def test_clip_text_parity():
    torch.manual_seed(0)
    vocab, ctx, width, heads, layers, embed = 128, 16, 32, 4, 2, 24
    oracle = OracleCLIPText(vocab, ctx, width, heads, layers, embed).eval()
    for p in oracle.parameters():
        nn.init.normal_(p, std=0.05)

    # reference-format state dict for the converter
    sd = {
        "token_embedding.weight": oracle.token_embedding.weight,
        "positional_embedding": oracle.positional_embedding,
        "ln_final.weight": oracle.ln_final.weight,
        "ln_final.bias": oracle.ln_final.bias,
        "text_projection": oracle.text_projection,
    }
    for i, blk in enumerate(oracle.blocks):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = blk["ln_1"].weight
        sd[p + "ln_1.bias"] = blk["ln_1"].bias
        sd[p + "ln_2.weight"] = blk["ln_2"].weight
        sd[p + "ln_2.bias"] = blk["ln_2"].bias
        sd[p + "attn.in_proj_weight"] = blk["attn"].in_proj_weight
        sd[p + "attn.in_proj_bias"] = blk["attn"].in_proj_bias
        sd[p + "attn.out_proj.weight"] = blk["attn"].out_proj.weight
        sd[p + "attn.out_proj.bias"] = blk["attn"].out_proj.bias
        sd[p + "mlp.c_fc.weight"] = blk["c_fc"].weight
        sd[p + "mlp.c_fc.bias"] = blk["c_fc"].bias
        sd[p + "mlp.c_proj.weight"] = blk["c_proj"].weight
        sd[p + "mlp.c_proj.bias"] = blk["c_proj"].bias

    params = convert_clip_text(sd, layers=layers)
    model = CLIPTextEncoder(vocab_size=vocab, context_length=ctx, width=width,
                            heads=heads, layers=layers, embed_dim=embed)

    rng = np.random.RandomState(1)
    ids = np.zeros((3, ctx), np.int64)
    for b in range(3):
        n = rng.randint(3, ctx - 1)
        ids[b, 0] = vocab - 2
        ids[b, 1:n] = rng.randint(1, vocab - 2, n - 1)
        ids[b, n] = vocab - 1  # EOT = max id
    with torch.no_grad():
        ref = oracle(torch.tensor(ids)).numpy()
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=3e-5)
