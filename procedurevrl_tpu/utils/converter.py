"""PyTorch checkpoint -> JAX pytree conversion.

Converts reference ``.pyth`` checkpoints (``{"model_state", "optimizer_state",
"epoch", "cfg"}``, reference ``lib/utils/checkpoint.py:126-131``), ImageNet
ViT-B/16 weights, and OpenAI CLIP text weights into the flax parameter trees
used here.  Conversion rules:

- ``nn.Linear`` weight ``[out, in]`` -> Dense kernel ``[in, out]`` (transpose);
- patch-embed ``Conv2d [D, C, p, p]`` -> patchify-matmul kernel
  ``[p*p*C, D]`` via ``permute(2, 3, 1, 0).reshape`` (channel-minor patch
  vector layout, see ``models/timesformer.py``);
- ``nn.LayerNorm`` weight/bias -> ``scale``/``bias``;
- ``nn.MultiheadAttention`` in_proj/out_proj -> fused qkv/proj kernels.

Prefix handling strips the reference's ``model.`` wrapper and DDP
``module.`` prefix (reference ``lib/utils/checkpoint.py:224-227``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()


def strip_prefixes(state: Dict, prefixes=("module.", "model.")) -> Dict:
    out = dict(state)
    for prefix in prefixes:
        if all(k.startswith(prefix) for k in out):
            out = {k[len(prefix):]: v for k, v in out.items()}
    return out


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_timesformer(state: Dict, depth: int = 12, patch: int = 16) -> dict:
    """Convert a reference TimeSformer encoder state_dict (keys like
    ``patch_embed.proj.weight``, ``blocks.0.attn.qkv.weight``) into the
    ``TimeSformer`` flax param tree."""
    params: dict = {}
    w = _np(state["patch_embed.proj.weight"])  # [D, C, p, p]
    d, c = w.shape[0], w.shape[1]
    _set(params, "patch_embed/kernel", w.transpose(2, 3, 1, 0).reshape(patch * patch * c, d))
    _set(params, "patch_embed/bias", _np(state["patch_embed.proj.bias"]))
    _set(params, "cls_token", _np(state["cls_token"]))
    _set(params, "pos_embed", _np(state["pos_embed"]))
    if "time_embed" in state:
        _set(params, "time_embed", _np(state["time_embed"]))
    for i in range(depth):
        src = f"blocks.{i}."
        dst = f"blocks_{i}/"
        for ln in ("norm1", "norm2", "temporal_norm1"):
            if src + ln + ".weight" in state:
                _set(params, dst + ln + "/scale", _np(state[src + ln + ".weight"]))
                _set(params, dst + ln + "/bias", _np(state[src + ln + ".bias"]))
        for attn in ("attn", "temporal_attn"):
            if src + attn + ".qkv.weight" not in state:
                continue
            _set(params, dst + attn + "/qkv_kernel", _np(state[src + attn + ".qkv.weight"]).T)
            if src + attn + ".qkv.bias" in state:
                _set(params, dst + attn + "/qkv_bias", _np(state[src + attn + ".qkv.bias"]))
            _set(params, dst + attn + "/proj_kernel", _np(state[src + attn + ".proj.weight"]).T)
            _set(params, dst + attn + "/proj_bias", _np(state[src + attn + ".proj.bias"]))
        if src + "temporal_fc.weight" in state:
            _set(params, dst + "temporal_fc/kernel", _np(state[src + "temporal_fc.weight"]).T)
            _set(params, dst + "temporal_fc/bias", _np(state[src + "temporal_fc.bias"]))
        _set(params, dst + "mlp/fc1/kernel", _np(state[src + "mlp.fc1.weight"]).T)
        _set(params, dst + "mlp/fc1/bias", _np(state[src + "mlp.fc1.bias"]))
        _set(params, dst + "mlp/fc2/kernel", _np(state[src + "mlp.fc2.weight"]).T)
        _set(params, dst + "mlp/fc2/bias", _np(state[src + "mlp.fc2.bias"]))
    _set(params, "norm/scale", _np(state["norm.weight"]))
    _set(params, "norm/bias", _np(state["norm.bias"]))
    return params


def convert_order_transformer(state: Dict, layers: int = 4) -> dict:
    """Convert reference DiffusionTransformer weights (reference
    ``lib/models/tfm_model.py:70-104``) into the ``OrderTransformer`` tree."""
    params: dict = {}
    _set(params, "pad_embedding", _np(state["pad_embedding.weight"]))
    _set(params, "type_embedding", _np(state["type_embedding.weight"]))
    _set(params, "temporal_embedding", _np(state["temporalEmbedding.weight"]))
    _set(params, "time_mlp_fc1/kernel", _np(state["time_mlp.1.weight"]).T)
    _set(params, "time_mlp_fc1/bias", _np(state["time_mlp.1.bias"]))
    _set(params, "time_mlp_fc2/kernel", _np(state["time_mlp.3.weight"]).T)
    _set(params, "time_mlp_fc2/bias", _np(state["time_mlp.3.bias"]))
    for i in range(layers):
        src = f"temporalModelling.resblocks.{i}."
        dst = f"resblocks_{i}/"
        _set(params, dst + "ln_1/scale", _np(state[src + "ln_1.weight"]))
        _set(params, dst + "ln_1/bias", _np(state[src + "ln_1.bias"]))
        _set(params, dst + "ln_2/scale", _np(state[src + "ln_2.weight"]))
        _set(params, dst + "ln_2/bias", _np(state[src + "ln_2.bias"]))
        _set(params, dst + "attn/qkv_kernel", _np(state[src + "attn.in_proj_weight"]).T)
        _set(params, dst + "attn/qkv_bias", _np(state[src + "attn.in_proj_bias"]))
        _set(params, dst + "attn/proj_kernel", _np(state[src + "attn.out_proj.weight"]).T)
        _set(params, dst + "attn/proj_bias", _np(state[src + "attn.out_proj.bias"]))
        _set(params, dst + "mlp/fc1/kernel", _np(state[src + "mlp.c_fc.weight"]).T)
        _set(params, dst + "mlp/fc1/bias", _np(state[src + "mlp.c_fc.bias"]))
        _set(params, dst + "mlp/fc2/kernel", _np(state[src + "mlp.c_proj.weight"]).T)
        _set(params, dst + "mlp/fc2/bias", _np(state[src + "mlp.c_proj.bias"]))
    return params


def convert_clip_text(state: Dict, layers: int = 12) -> dict:
    """Convert OpenAI CLIP text-tower weights (token_embedding,
    positional_embedding, transformer.resblocks.*, ln_final, text_projection)
    into the ``CLIPTextEncoder`` tree."""
    params: dict = {}
    _set(params, "token_embedding", _np(state["token_embedding.weight"]))
    _set(params, "positional_embedding", _np(state["positional_embedding"]))
    _set(params, "text_projection", _np(state["text_projection"]))
    _set(params, "ln_final/scale", _np(state["ln_final.weight"]))
    _set(params, "ln_final/bias", _np(state["ln_final.bias"]))
    for i in range(layers):
        src = f"transformer.resblocks.{i}."
        dst = f"resblocks_{i}/"
        _set(params, dst + "ln_1/scale", _np(state[src + "ln_1.weight"]))
        _set(params, dst + "ln_1/bias", _np(state[src + "ln_1.bias"]))
        _set(params, dst + "ln_2/scale", _np(state[src + "ln_2.weight"]))
        _set(params, dst + "ln_2/bias", _np(state[src + "ln_2.bias"]))
        _set(params, dst + "attn/qkv_kernel", _np(state[src + "attn.in_proj_weight"]).T)
        _set(params, dst + "attn/qkv_bias", _np(state[src + "attn.in_proj_bias"]))
        _set(params, dst + "attn/proj_kernel", _np(state[src + "attn.out_proj.weight"]).T)
        _set(params, dst + "attn/proj_bias", _np(state[src + "attn.out_proj.bias"]))
        _set(params, dst + "mlp/fc1/kernel", _np(state[src + "mlp.c_fc.weight"]).T)
        _set(params, dst + "mlp/fc1/bias", _np(state[src + "mlp.c_fc.bias"]))
        _set(params, dst + "mlp/fc2/kernel", _np(state[src + "mlp.c_proj.weight"]).T)
        _set(params, dst + "mlp/fc2/bias", _np(state[src + "mlp.c_proj.bias"]))
    return params


def convert_linear(state: Dict, key: str) -> dict:
    return {
        "kernel": _np(state[key + ".weight"]).T,
        "bias": _np(state[key + ".bias"]),
    }


def _sub_state(state: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def convert_procedurevrl(state: Dict) -> dict:
    """Convert a full reference ProcedureVRL ``model_state`` into the
    ``ProcedureVRL`` flax tree.

    Reference checkpoint layout (``lib/models/vit.py:183-281,473-506``):
    encoder params at the root (``patch_embed.*, blocks.*, norm.*,
    cls_token, pos_embed, time_embed``) under a ``model.`` wrapper, plus
    ``head``, ``order_tfm.*``, ``text_model.*``, and optional
    ``head_cls/head_v/head_n``.
    """
    state = strip_prefixes(state)

    params: dict = {}
    mvit_keys = _sub_state(state, "video_encoder.")
    if mvit_keys:
        # MViT variant nests the encoder as ``video_encoder``
        # (reference lib/models/mvit.py:67)
        params["encoder"] = convert_mvit(mvit_keys)
    enc_keys = {
        k: v for k, v in state.items()
        if k.split(".")[0]
        in ("patch_embed", "blocks", "norm", "cls_token", "pos_embed", "time_embed")
    }
    depth = 1 + max(
        (int(k.split(".")[1]) for k in enc_keys if k.startswith("blocks.")),
        default=-1,
    )
    if enc_keys and not mvit_keys:
        params["encoder"] = convert_timesformer(enc_keys, depth=depth)
    if "head.weight" in state:
        params["head"] = convert_linear(state, "head")
    order = _sub_state(state, "order_tfm.")
    if order:
        layers = 1 + max(
            int(k.split(".")[2]) for k in order if k.startswith("temporalModelling.resblocks.")
        )
        params["order_tfm"] = convert_order_transformer(order, layers=layers)
    text = _sub_state(state, "text_model.")
    if text:
        layers = 1 + max(
            int(k.split(".")[2]) for k in text if k.startswith("transformer.resblocks.")
        )
        params["text_model"] = convert_clip_text(text, layers=layers)
    for head in ("head_cls", "head_v", "head_n"):
        if head + ".weight" in state:
            params[head] = convert_linear(state, head)
    return params


def convert_mvit(state: Dict) -> dict:
    """Convert a reference MViT encoder state dict (keys like
    ``patch_embed.proj.weight``, ``blocks.0.attn.pool_q.weight``,
    ``blocks.0.attn.rel_pos_h``; reference
    ``lib/models/slowfast_mvit/mvit.py``) into the ``MViTEncoder`` tree."""
    params: dict = {}
    w = _np(state["patch_embed.proj.weight"])  # [D, C, kt, kh, kw]
    _set(params, "patch_embed_kernel", w.transpose(2, 3, 4, 1, 0))
    _set(params, "patch_embed_bias", _np(state["patch_embed.proj.bias"]))
    if "cls_token" in state:
        _set(params, "cls_token", _np(state["cls_token"]))
    for key in ("pos_embed", "pos_embed_spatial", "pos_embed_temporal",
                "pos_embed_class"):
        if key in state:
            _set(params, key, _np(state[key]))
    depth = 1 + max(
        (int(k.split(".")[1]) for k in state if k.startswith("blocks.")),
        default=-1,
    )
    for i in range(depth):
        src = f"blocks.{i}."
        dst = f"blocks_{i}/"
        for ln in ("norm1", "norm2"):
            _set(params, dst + ln + "/scale", _np(state[src + ln + ".weight"]))
            _set(params, dst + ln + "/bias", _np(state[src + ln + ".bias"]))
        _set(params, dst + "attn/qkv/kernel", _np(state[src + "attn.qkv.weight"]).T)
        if src + "attn.qkv.bias" in state:
            _set(params, dst + "attn/qkv/bias", _np(state[src + "attn.qkv.bias"]))
        _set(params, dst + "attn/proj/kernel", _np(state[src + "attn.proj.weight"]).T)
        _set(params, dst + "attn/proj/bias", _np(state[src + "attn.proj.bias"]))
        for p in ("q", "k", "v"):
            wk = src + f"attn.pool_{p}.weight"
            if wk in state:
                pw = _np(state[wk])  # [hd, 1, kt, kh, kw] depthwise
                _set(params, dst + f"attn/pool_{p}/kernel",
                     pw.transpose(2, 3, 4, 1, 0))
                _set(params, dst + f"attn/norm_{p}/scale",
                     _np(state[src + f"attn.norm_{p}.weight"]))
                _set(params, dst + f"attn/norm_{p}/bias",
                     _np(state[src + f"attn.norm_{p}.bias"]))
        for rp in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
            if src + "attn." + rp in state:
                _set(params, dst + "attn/" + rp, _np(state[src + "attn." + rp]))
        if src + "proj.weight" in state:
            _set(params, dst + "proj/kernel", _np(state[src + "proj.weight"]).T)
            _set(params, dst + "proj/bias", _np(state[src + "proj.bias"]))
        _set(params, dst + "mlp/fc1/kernel", _np(state[src + "mlp.fc1.weight"]).T)
        _set(params, dst + "mlp/fc1/bias", _np(state[src + "mlp.fc1.bias"]))
        _set(params, dst + "mlp/fc2/kernel", _np(state[src + "mlp.fc2.weight"]).T)
        _set(params, dst + "mlp/fc2/bias", _np(state[src + "mlp.fc2.bias"]))
    if "norm.weight" in state:
        _set(params, "norm/scale", _np(state["norm.weight"]))
        _set(params, "norm/bias", _np(state["norm.bias"]))
    return params


def inflate_mvit_in1k(state: Dict, time_kernel: int = 3,
                      rel_pos_lens: Dict[str, int] = None) -> Dict:
    """Image MViT-v2 -> video: repeat conv weights over the new time axis
    and linearly resize rel-pos tables (reference
    ``lib/models/helpers.py:126-145``). Returns a torch-layout state dict
    to feed ``convert_mvit``."""
    out = {}
    for key, v in state.items():
        v = _np(v)
        if "pool_" in key or "patch_embed.proj.weight" in key:
            # [D, C, kh, kw] -> [D, C, t, kh, kw]
            out[key] = np.repeat(v[:, :, None, :, :], time_kernel, axis=2)
        elif "rel_pos_" in key and rel_pos_lens and key in rel_pos_lens:
            d = rel_pos_lens[key]
            ori = v.shape[0]
            if ori != d:
                pos = (np.arange(d) + 0.5) * ori / d - 0.5
                lo = np.clip(np.floor(pos), 0, ori - 1).astype(int)
                hi = np.clip(lo + 1, 0, ori - 1)
                frac = np.clip(pos - lo, 0, 1)[:, None]
                v = v[lo] * (1 - frac) + v[hi] * frac
            out[key] = v
        else:
            out[key] = v
    return out


def convert_imagenet_vit(state: Dict, num_frames: int = 8) -> dict:
    """Convert timm ImageNet ViT-B/16 weights into the TimeSformer tree
    (the reference's ``load_pretrained`` + ``_conv_filter`` path,
    ``lib/models/vit.py:462-471``, ``lib/models/helpers.py:100+``):
    spatial blocks initialize both spatial and (shape-permitting) temporal
    attention; ``temporal_fc`` and ``time_embed`` stay at their zero/trunc
    init (the flax init already zeros ``temporal_fc`` for blocks > 0 only
    via the reference's scheme — here they are absent from the mapping and
    keep their template values)."""
    state = strip_prefixes(state)
    depth = 1 + max(
        (int(k.split(".")[1]) for k in state if k.startswith("blocks.")),
        default=-1,
    )
    params = convert_timesformer(
        {k: v for k, v in state.items() if not k.startswith("head")}, depth=depth
    )
    # replicate spatial attention weights into the temporal attention slots
    # (reference inflation: temporal attn initialized from spatial attn)
    for i in range(depth):
        src = f"blocks.{i}.attn."
        blk = params[f"blocks_{i}"]
        if "temporal_attn" not in blk and src + "qkv.weight" in state:
            blk["temporal_attn"] = {
                "qkv_kernel": _np(state[src + "qkv.weight"]).T,
                "qkv_bias": _np(state[src + "qkv.bias"]),
                "proj_kernel": _np(state[src + "proj.weight"]).T,
                "proj_bias": _np(state[src + "proj.bias"]),
            }
        if "temporal_norm1" not in blk:
            blk["temporal_norm1"] = {
                "scale": _np(state[f"blocks.{i}.norm1.weight"]),
                "bias": _np(state[f"blocks.{i}.norm1.bias"]),
            }
        if "temporal_fc" not in blk:
            d = blk["mlp"]["fc2"]["bias"].shape[0]
            blk["temporal_fc"] = {
                "kernel": np.zeros((d, d), np.float32),
                "bias": np.zeros((d,), np.float32),
            }
    return params


def convert_resnet_video(state: Dict) -> Tuple[dict, dict]:
    """Torch state dict of the ResNet/SlowFast/X3D family -> (params,
    batch_stats) flax trees (reference ``lib/models/video_model_builder.py``;
    our module paths mirror the reference attribute names, so only the leaf
    tensor layout converts):

    - Conv3d ``weight`` [out, in/g, kt, kh, kw] -> ``kernel``
      [kt, kh, kw, in/g, out];
    - 1x1x1 convs written as Dense here (SE fc1/fc2, nonlocal conv_*, head
      ``projection``) squeeze to [in, out];
    - Linear ``weight`` [out, in] -> ``kernel`` [in, out];
    - BN ``weight``/``bias`` -> ``scale``/``bias`` (params),
      ``running_mean``/``running_var`` -> ``mean``/``var`` (batch_stats);
      ``SubBatchNorm3d.split_bn`` running stats stay flat [S*C] here and
      are reshaped to the per-split rows [S, C] against the template by
      ``merge_into_template`` (its aggregate ``bn`` stats are derived on
      the fly at eval and are dropped).

    Caffe2 checkpoints convert first through
    ``utils/c2_model_loading.convert_c2_state_dict``.
    """
    dense_markers = ("conv_theta", "conv_phi", "conv_g", "conv_out",
                     "se.fc1", "se.fc2", "projection")
    params: dict = {}
    stats: dict = {}
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        v = _np(v)
        parts = k.split(".")
        leaf = parts[-1]
        if "split_bn" in parts:
            # SubBatchNorm3d inner split stats: drop the '.split_bn' segment
            if leaf in ("running_mean", "running_var"):
                base = "/".join(p for p in parts[:-1] if p != "split_bn")
                _set(stats, base + ("/mean" if leaf == "running_mean" else "/var"), v)
            continue
        if len(parts) >= 3 and parts[-2] == "bn" and parts[-3].endswith("bn"):
            # SubBatchNorm3d aggregate ('xx_bn.bn.*') stats: redundant
            continue
        mod_path = "/".join(parts[:-1])
        if leaf == "running_mean":
            _set(stats, mod_path + "/mean", v)
            continue
        if leaf == "running_var":
            _set(stats, mod_path + "/var", v)
            continue
        if leaf == "weight":
            if v.ndim == 1:
                # BN affine (incl. SubBatchNorm3d wrapper affine)
                _set(params, mod_path + "/scale", v)
            elif v.ndim == 5:
                if any(m in k for m in dense_markers):
                    _set(params, mod_path + "/kernel",
                         v.reshape(v.shape[0], v.shape[1]).T)
                else:
                    _set(params, mod_path + "/kernel", v.transpose(2, 3, 4, 1, 0))
            elif v.ndim == 2:
                _set(params, mod_path + "/kernel", v.T)
            else:
                _set(params, mod_path + "/kernel", v)
        elif leaf == "bias":
            _set(params, mod_path + "/bias", v)
        else:
            _set(params, "/".join(parts), v)
    return params, stats


def merge_into_template(template, converted, reshape_ok=True):
    """Shape-filtered merge of a converted tree into a template tree
    (reference partial-load semantics, ``lib/utils/checkpoint.py:369-390``).
    Same-size leaves reshape (SubBN flat [S*C] split stats -> [S, C]).
    Returns (merged, missing, skipped)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_t = flatten_dict(template, sep="/")
    flat_c = flatten_dict(converted, sep="/")
    merged, missing, skipped = {}, [], []
    for k, tv in flat_t.items():
        cv = flat_c.get(k)
        tshape = tuple(np.shape(tv))
        if cv is None:
            missing.append(k)
            merged[k] = tv
        elif tuple(np.shape(cv)) == tshape:
            merged[k] = np.asarray(cv, np.asarray(tv).dtype)
        elif reshape_ok and np.size(cv) == np.size(tv):
            merged[k] = np.asarray(cv, np.asarray(tv).dtype).reshape(tshape)
        else:
            skipped.append((k, np.shape(cv), tshape))
            merged[k] = tv
    return unflatten_dict(merged, sep="/"), missing, skipped
