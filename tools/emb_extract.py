"""Offline CLIP text-embedding extraction for step vocabularies
(reference ``tools/emb_extract.py:9-60``).

Fills each step description into the 28 photo/video/example/demonstration
prompt templates, encodes with the JAX CLIP text tower (weights converted
from an OpenAI CLIP checkpoint), mean-pools over prompts, and saves the
``[num_steps, width]`` bank as ``.npy`` (and ``.pth`` when torch is
available, for drop-in reference compatibility).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PROMPTS = [
    t.format(stem=stem)
    for stem in ("a photo of", "a video of", "a example of", "a demonstration of")
    for t in (
        "{stem} {{}}.",
        "{stem} a person {{}}.",
        "{stem} a person using {{}}.",
        "{stem} a person doing {{}}.",
        "{stem} a person during {{}}.",
        "{stem} a person performing {{}}.",
        "{stem} a person practicing {{}}.",
    )
]
assert len(PROMPTS) == 28


def load_clip_text_tower(clip_ckpt: str):
    """Build the flax CLIP text encoder from an OpenAI CLIP checkpoint
    (state_dict .pt/.pth)."""
    import torch

    from procedurevrl_tpu.models.clip_text import CLIPTextEncoder
    from procedurevrl_tpu.utils.converter import convert_clip_text

    blob = torch.load(clip_ckpt, map_location="cpu", weights_only=False)
    sd = blob.state_dict() if hasattr(blob, "state_dict") else blob
    sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    )
    width = sd["ln_final.weight"].shape[0]
    heads = width // 64
    embed_dim = sd["text_projection"].shape[1]
    model = CLIPTextEncoder(
        vocab_size=sd["token_embedding.weight"].shape[0],
        width=width, heads=heads, layers=layers, embed_dim=embed_dim,
    )
    params = convert_clip_text(sd, layers=layers)
    return model, {"params": params}


def get_step_emb(input_step_list, output_emb_file, clip_ckpt, bpe_path=""):
    """reference ``tools/emb_extract.py:9-60``."""
    from procedurevrl_tpu.datasets.tokenizer import build_tokenizer, tokenize

    model, variables = load_clip_text_tower(clip_ckpt)
    tokenizer = build_tokenizer(bpe_path)
    encode = jax.jit(lambda ids: model.apply(variables, ids))

    feats = []
    for x in input_step_list:
        sents = [p.format(x) for p in PROMPTS]
        ids = jnp.asarray(tokenize(tokenizer, sents, truncate=True))
        embs = np.asarray(encode(ids), np.float32)
        feats.append(embs.mean(0, keepdims=True))
    bank = np.concatenate(feats, axis=0)

    np.save(os.path.splitext(output_emb_file)[0] + ".npy", bank)
    try:
        import torch

        torch.save(torch.from_numpy(bank), output_emb_file)
    except Exception:
        pass
    return bank


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default="data/step_coin_text.txt",
                   help="newline-separated step descriptions")
    p.add_argument("--out", default="data/clip_step_emb_coin.pth")
    p.add_argument("--clip_ckpt", required=True,
                   help="OpenAI CLIP checkpoint (ViT-B/16 text tower)")
    p.add_argument("--bpe", default="", help="bpe_simple_vocab_16e6.txt.gz")
    args = p.parse_args()
    with open(args.steps) as f:
        steps = [l.strip() for l in f if l.strip()]
    bank = get_step_emb(steps, args.out, args.clip_ckpt, args.bpe)
    print(f"saved {bank.shape} to {args.out}")


if __name__ == "__main__":
    main()
