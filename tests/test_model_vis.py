"""Weights/activations capture + Grad-CAM on a tiny TimeSformer
(reference lib/visualization/utils.py:157-252, gradcam_utils.GradCAM)."""

import numpy as np

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.procedurevrl import ProcedureVRL
from procedurevrl_tpu.visualization.model_vis import (
    GradCAM, get_activations, get_layer_weights,
)

TINY = dict(
    img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
    num_frames=2, drop_path_rate=0.0, label_dim=32,
)


def _setup():
    model = ProcedureVRL(num_classes=5, match_lang_emb=True,
                         with_text_model=False, **TINY)
    rng = np.random.RandomState(0)
    bank = rng.randn(5, 32).astype(np.float32)
    bank = jnp.asarray(bank / np.linalg.norm(bank, axis=1, keepdims=True))
    x = jnp.asarray(rng.randn(2, 2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, label_emb=bank)
    return model, variables, x, bank


def test_layer_weights_by_path():
    model, variables, x, bank = _setup()
    w = get_layer_weights(variables["params"], ["blocks_1/attn"])
    assert any("qkv_kernel" in k for k in w)
    assert all(isinstance(v, np.ndarray) for v in w.values())


def test_activation_capture():
    model, variables, x, bank = _setup()
    acts, preds = get_activations(
        model, variables, x, ["encoder/blocks_1/mlp"], label_emb=bank,
        train=False,
    )
    assert preds.shape == (2, 5)
    assert acts, "no activations captured"
    key = next(iter(acts))
    assert "blocks_1" in key and acts[key].ndim >= 2


def test_gradcam_token_stream():
    model, variables, x, bank = _setup()
    cam, preds = GradCAM(model, "encoder/blocks_1/norm2",
                         token_grid=(2, 2, 2))(
        variables, x, label_emb=bank, train=False)
    assert cam.shape == (2, 2, 2, 2)
    assert np.isfinite(cam).all()
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    # true-label variant
    cam2, _ = GradCAM(model, "encoder/blocks_1/norm2", token_grid=(2, 2, 2))(
        variables, x, labels=np.array([1, 3]), label_emb=bank, train=False)
    assert cam2.shape == cam.shape and np.isfinite(cam2).all()
