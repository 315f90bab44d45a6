"""Forward-path contract tests of the full ProcedureVRL model (tiny dims)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.procedurevrl import ProcedureVRL


TINY = dict(
    img_size=32, patch_size=16, embed_dim=48, depth=1, num_heads=4,
    num_frames=2, drop_path_rate=0.0, label_dim=32,
    text_vocab=64, text_width=32, text_heads=4, text_layers=1,
)


def _bank(k, d=32):
    rng = np.random.RandomState(1)
    b = rng.randn(k, d).astype(np.float32)
    return jnp.asarray(b / np.linalg.norm(b, axis=1, keepdims=True))


def test_order_pretrain_path():
    model = ProcedureVRL(
        num_classes=11, match_lang_emb=True, order_pretrain=True,
        order_max_len=9, order_recog_batch=9, with_text_model=True, **TINY,
    )
    B, M = 2, 9
    x = jnp.asarray(np.random.RandomState(0).rand(B, M, 2, 32, 32, 3), jnp.float32)
    text = {
        "clip_text_ids": jnp.ones((B * M, 77), jnp.int32).at[:, -1].set(63),
        "clip_vis_feat": jnp.zeros((B * M, 32), jnp.float32),
    }
    bank = _bank(11)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "subset": jax.random.PRNGKey(2), "droppath": jax.random.PRNGKey(3)}
    variables = model.init(rngs, x, text=text, label_emb=bank, train=True)
    student, teacher, (mse_a, mse_b) = model.apply(
        variables, x, text=text, label_emb=bank, train=True,
        rngs={k: v for k, v in rngs.items() if k != "params"},
    )
    n_levels = 4
    assert student.shape == (B * M + n_levels * B, 11)
    assert teacher.shape == student.shape
    assert mse_a.shape == (n_levels * B, 32) and mse_b.shape == (n_levels * B, 32)
    assert np.isfinite(np.asarray(student)).all()


def test_zeroshot_classification_path():
    model = ProcedureVRL(num_classes=7, match_lang_emb=True, **TINY)
    x = jnp.ones((3, 2, 32, 32, 3), jnp.float32)
    bank = _bank(7)
    variables = model.init(jax.random.PRNGKey(0), x, label_emb=bank)
    probs = model.apply(variables, x, label_emb=bank)
    assert probs.shape == (3, 7)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_zeroshot_forecasting_path():
    model = ProcedureVRL(
        num_classes=7, match_lang_emb=True, num_seg=8, order_max_len=9, **TINY,
    )
    # 8 segments x 2 frames
    x = jnp.ones((2, 16, 32, 32, 3), jnp.float32)
    bank = _bank(7)
    variables = model.init(jax.random.PRNGKey(0), x, label_emb=bank)
    probs = model.apply(variables, x, label_emb=bank)
    assert probs.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_finetune_classification_path():
    model = ProcedureVRL(num_classes=5, match_lang_emb=False, **TINY)
    x = jnp.ones((2, 2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, train=True,
                         rngs={"droppath": jax.random.PRNGKey(1)})
    assert logits.shape == (2, 5)
    probs = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_finetune_forecasting_path():
    model = ProcedureVRL(
        num_classes=5, match_lang_emb=False, num_seg=8, order_max_len=9, **TINY,
    )
    x = jnp.ones((2, 16, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, train=True,
                         rngs={"droppath": jax.random.PRNGKey(1)})
    assert logits.shape == (2, 5)


def test_epic_dual_head_path():
    model = ProcedureVRL(num_classes=97, match_lang_emb=False, epic_heads=True, **TINY)
    x = jnp.ones((2, 2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    v, n = model.apply(variables, x)
    assert v.shape == (2, 97) and n.shape == (2, 300)
