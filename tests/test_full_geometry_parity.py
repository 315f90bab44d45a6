"""Full-geometry checkpoint-numerics proof (the strongest offline proxy
for the released-weights north star: zero-shot COIN 16.6 %, reference
``README.md:73-78``).

Same ``.pyth`` round-trip as ``tests/test_zero_shot_parity.py`` but at
REAL TimeSformer-B dimensions (embed 768, depth 12, heads 12, 8 frames,
224x224, patch 16 -> 197-token pos_embed, 8-slot time_embed) — the
geometry a released checkpoint actually ships — and through every
interpolation branch such a checkpoint can hit:

- matching geometry (the straight converter path);
- mismatched input resolution -> nearest pos-embed resize at forward
  time (reference ``lib/models/vit.py:375-388``);
- mismatched input frame count -> nearest time-embed resize at forward
  time (reference ``lib/models/vit.py:399-404``);
- model frame count != checkpoint frame count -> nearest time-embed
  resize at LOAD time (reference ``lib/utils/checkpoint.py:360-365``).

Marked slow: four full-size CPU forwards + their XLA compiles.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.procedurevrl import ProcedureVRL
from procedurevrl_tpu.utils import checkpoint as cu
from tests.torch_oracles import OracleTimeSformer

pytestmark = pytest.mark.slow

FULL = dict(img_size=224, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=8, drop_path_rate=0.0, label_dim=512)
TEMP = 0.02
NUM_STEPS = 778  # COIN step-label bank size


@pytest.fixture(scope="module")
def released_ckpt(tmp_path_factory):
    """A reference-format full-size checkpoint + its torch composite."""
    torch.manual_seed(0)
    enc = OracleTimeSformer(224, 16, 768, 12, 12, 8).eval()
    head = nn.Linear(768, 512)
    for p in list(enc.parameters()) + list(head.parameters()):
        nn.init.normal_(p, std=0.04)

    state = {}
    for k, v in enc.state_dict().items():
        if k.startswith("proj."):
            k = k.replace("proj.", "patch_embed.proj.")
        k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        state[k] = v
    state["head.weight"] = head.weight
    state["head.bias"] = head.bias
    path = tmp_path_factory.mktemp("ckpt") / "released_full.pyth"
    torch.save(
        {"model_state": {f"module.{k}": v for k, v in state.items()},
         "epoch": 15},
        path,
    )
    bank = np.random.RandomState(1).randn(NUM_STEPS, 512).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    return str(path), enc, head, bank


def _torch_probs(enc, head, bank, x):
    with torch.no_grad():
        emb = F.normalize(head(enc(x)), dim=-1)
        return torch.softmax(
            emb @ torch.from_numpy(bank).t() / TEMP, -1).numpy()


def _load_flax(ckpt_path, bank, num_frames, sample_x):
    """Template via eval_shape (no init compile), loaded + leaf-checked."""
    model = ProcedureVRL(num_classes=NUM_STEPS, match_lang_emb=True,
                         with_text_model=False, **{**FULL,
                                                   "num_frames": num_frames})
    bank_j = jnp.asarray(bank)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), sample_x, label_emb=bank_j
    )["params"]
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    params, epoch = cu.load_reference_params(ckpt_path, template)
    # every leaf must have come from the checkpoint (a zeros leaf would
    # mean a converter key gap that shape-filtering silently absorbed)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        assert np.abs(np.asarray(leaf)).sum() > 0, (
            f"param {jax.tree_util.keystr(path)} not populated from ckpt"
        )
    return model, params, bank_j, epoch


def test_full_geometry_matching(released_ckpt):
    """197-token pos-embed, 8-slot time-embed, 12-block prefix mapping —
    the exact tensor layout a released TimeSformer-B checkpoint ships."""
    path, enc, head, bank = released_ckpt
    x = torch.randn(2, 3, 8, 224, 224, generator=torch.Generator().manual_seed(2))
    ref = _torch_probs(enc, head, bank, x)

    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    model, params, bank_j, epoch = _load_flax(path, bank, 8, xj)
    assert epoch == 15
    probs = np.asarray(model.apply({"params": params}, xj, label_emb=bank_j))
    np.testing.assert_allclose(probs, ref, atol=2e-5, rtol=2e-5)


def test_full_geometry_resolution_resize(released_ckpt):
    """256x256 input vs the 224-trained pos-embed: the forward-time
    nearest 2-D resize branch (reference vit.py:375-388)."""
    path, enc, head, bank = released_ckpt
    x = torch.randn(1, 3, 8, 256, 256, generator=torch.Generator().manual_seed(3))
    ref = _torch_probs(enc, head, bank, x)

    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    model, params, bank_j, _ = _load_flax(path, bank, 8, xj)
    probs = np.asarray(model.apply({"params": params}, xj, label_emb=bank_j))
    np.testing.assert_allclose(probs, ref, atol=2e-5, rtol=2e-5)


def test_full_geometry_forward_time_resize(released_ckpt):
    """4-frame input vs the 8-slot time-embed: the forward-time nearest
    1-D resize branch (reference vit.py:399-404)."""
    path, enc, head, bank = released_ckpt
    x = torch.randn(1, 3, 4, 224, 224, generator=torch.Generator().manual_seed(4))
    ref = _torch_probs(enc, head, bank, x)

    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    model, params, bank_j, _ = _load_flax(path, bank, 8, xj)
    probs = np.asarray(model.apply({"params": params}, xj, label_emb=bank_j))
    np.testing.assert_allclose(probs, ref, atol=2e-5, rtol=2e-5)


def test_full_geometry_load_time_resize(released_ckpt):
    """16-frame MODEL loading the 8-slot checkpoint: the LOAD-time nearest
    time-embed resize (reference checkpoint.py:360-365) — e.g. a COIN
    finetune initialized from the 8-frame pretraining checkpoint.  The
    torch composite feeds the 8-slot oracle a 16-frame input, whose
    forward-time resize computes the identical interpolation."""
    path, enc, head, bank = released_ckpt
    x = torch.randn(1, 3, 16, 224, 224, generator=torch.Generator().manual_seed(5))
    ref = _torch_probs(enc, head, bank, x)

    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    model, params, bank_j, _ = _load_flax(path, bank, 16, xj)
    # the load-time resize must have populated time_embed at (1, 16, 768)
    assert params["encoder"]["time_embed"].shape == (1, 16, 768)
    probs = np.asarray(model.apply({"params": params}, xj, label_emb=bank_j))
    np.testing.assert_allclose(probs, ref, atol=2e-5, rtol=2e-5)
