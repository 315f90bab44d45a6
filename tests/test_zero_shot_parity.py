"""End-to-end checkpoint-numerics proof for the zero-shot eval paths.

Builds a reference-format ``.pyth`` checkpoint from torch modules (the same
oracles the per-module parity tests pin against), round-trips it through
``load_reference_params`` + the converters, and asserts the flax zero-shot
probabilities match the torch composite forward to 2e-5 — the strongest
offline proxy for the released-weights target (zero-shot COIN step
classification 16.6%, reference ``README.md:73-78``) until real weights are
available.  ``tools/zero_shot_parity.py`` is the one-command version for
real checkpoints.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.procedurevrl import ProcedureVRL
from procedurevrl_tpu.utils import checkpoint as cu
from tests.torch_oracles import OracleOrderTransformer, OracleTimeSformer

TINY = dict(
    img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
    num_frames=2, drop_path_rate=0.0, label_dim=32,
)
TEMP = 0.02


def _encoder_state(oracle):
    state = {}
    for k, v in oracle.state_dict().items():
        if k.startswith("proj."):
            k = k.replace("proj.", "patch_embed.proj.")
        k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        state[k] = v
    return state


def _order_state(oracle, prefix="order_tfm."):
    state = {}
    for k, v in oracle.state_dict().items():
        k = k.replace("resblocks.", "temporalModelling.resblocks.")
        k = k.replace(".c_fc.", ".mlp.c_fc.").replace(".c_proj.", ".mlp.c_proj.")
        k = k.replace("time_fc1.", "time_mlp.1.").replace(
            "time_fc2.", "time_mlp.3.")
        state[prefix + k] = v
    return state


def _bank(k, d=32):
    b = np.random.RandomState(1).randn(k, d).astype(np.float32)
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def test_zero_shot_classification_checkpoint_parity(tmp_path):
    torch.manual_seed(0)
    enc = OracleTimeSformer(32, 16, 48, 2, 4, 2).eval()
    head = nn.Linear(48, 32)
    for p in list(enc.parameters()) + list(head.parameters()):
        nn.init.normal_(p, std=0.04)

    bank = _bank(7)
    B = 3
    x = torch.randn(B, 3, 2, 32, 32)
    with torch.no_grad():
        emb = F.normalize(head(enc(x)), dim=-1)
        ref = torch.softmax(emb @ torch.from_numpy(bank).t() / TEMP, -1).numpy()

    state = _encoder_state(enc)
    state["head.weight"] = head.weight
    state["head.bias"] = head.bias
    ckpt = tmp_path / "released_step_cls.pyth"
    torch.save({"model_state": {f"module.{k}": v for k, v in state.items()},
                "epoch": 7}, ckpt)

    model = ProcedureVRL(num_classes=7, match_lang_emb=True,
                         with_text_model=False, **TINY)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    bank_j = jnp.asarray(bank)
    template = model.init(jax.random.PRNGKey(0), xj, label_emb=bank_j)["params"]
    params, epoch = cu.load_reference_params(str(ckpt), jax.device_get(template))
    assert epoch == 7
    probs = model.apply({"params": params}, xj, label_emb=bank_j)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=2e-5, rtol=2e-5)


def test_zero_shot_forecasting_checkpoint_parity(tmp_path):
    torch.manual_seed(1)
    num_seg, max_len, layers = 2, 3, 2
    enc = OracleTimeSformer(32, 16, 48, 2, 4, 2).eval()
    head = nn.Linear(48, 32)
    order = OracleOrderTransformer(
        num_seg=num_seg, layers=layers, heads=4, hidden=32, max_len=max_len
    ).eval()
    for p in (list(enc.parameters()) + list(head.parameters())
              + list(order.parameters())):
        nn.init.normal_(p, std=0.04)

    bank = _bank(5)
    B = 2
    x = torch.randn(B, 3, num_seg * 2, 32, 32)
    with torch.no_grad():
        # reference zero-shot forecasting: per-segment CLS -> 512-d emb ->
        # iterative diffusion forecast -> bank matching
        xs = x.reshape(B, 3, num_seg, 2, 32, 32).permute(0, 2, 1, 3, 4, 5)
        feat = enc(xs.reshape(B * num_seg, 3, 2, 32, 32))
        emb = F.normalize(head(feat), dim=-1)
        pred = F.normalize(order.forecast(emb), dim=-1)
        ref = torch.softmax(
            pred @ torch.from_numpy(bank).t() / TEMP, -1).numpy()

    state = _encoder_state(enc)
    state["head.weight"] = head.weight
    state["head.bias"] = head.bias
    state.update(_order_state(order))
    ckpt = tmp_path / "released_step_forecast.pyth"
    torch.save({"model_state": state, "epoch": 0}, ckpt)

    model = ProcedureVRL(
        num_classes=5, match_lang_emb=True, with_text_model=False,
        num_seg=num_seg, order_max_len=max_len, order_tfm_layers=layers,
        **TINY,
    )
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    bank_j = jnp.asarray(bank)
    template = model.init(jax.random.PRNGKey(0), xj, label_emb=bank_j)["params"]
    params, _ = cu.load_reference_params(str(ckpt), jax.device_get(template))
    probs = model.apply({"params": params}, xj, label_emb=bank_j)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=2e-5, rtol=2e-5)
