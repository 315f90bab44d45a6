"""Numerical parity of the JAX TimeSformer against the PyTorch reference math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.timesformer import DividedSTBlock, TimeSformer
from procedurevrl_tpu.utils.converter import convert_timesformer

from tests.torch_oracles import OracleDividedBlock, OracleTimeSformer


def _oracle_block_state_to_ref_names(block: OracleDividedBlock) -> dict:
    state = {}
    for k, v in block.state_dict().items():
        k = k.replace("fc1.", "mlp.fc1.").replace("fc2.", "mlp.fc2.")
        state[f"blocks.0.{k}"] = v
    return state


def test_divided_block_parity():
    torch.manual_seed(0)
    dim, heads, B, T, HW = 64, 4, 2, 4, 9  # 3x3 spatial grid
    W = 3
    block = OracleDividedBlock(dim, heads).eval()
    for p in block.parameters():
        torch.nn.init.normal_(p, std=0.05)

    x = torch.randn(B, 1 + HW * T, dim)
    with torch.no_grad():
        ref = block(x, B, T, W).numpy()

    state = _oracle_block_state_to_ref_names(block)
    params = convert_timesformer(
        {
            **state,
            "patch_embed.proj.weight": torch.zeros(dim, 3, 16, 16),
            "patch_embed.proj.bias": torch.zeros(dim),
            "cls_token": torch.zeros(1, 1, dim),
            "pos_embed": torch.zeros(1, 197, dim),
            "norm.weight": torch.ones(dim),
            "norm.bias": torch.zeros(dim),
        },
        depth=1,
    )["blocks_0"]

    def to_time_major(a):  # oracle is patch-major [CLS, (n t)]
        body = a[:, 1:].reshape(B, HW, T, dim).transpose(0, 2, 1, 3)
        return np.concatenate([a[:, :1], body.reshape(B, HW * T, dim)], 1)

    def to_patch_major(a):
        body = a[:, 1:].reshape(B, T, HW, dim).transpose(0, 2, 1, 3)
        return np.concatenate([a[:, :1], body.reshape(B, HW * T, dim)], 1)

    jblock = DividedSTBlock(dim=dim, num_heads=heads, drop_path_rate=0.0)
    out = jblock.apply(
        {"params": params}, jnp.asarray(to_time_major(x.numpy())), T, W, True
    )
    np.testing.assert_allclose(
        to_patch_major(np.asarray(out)), ref, atol=2e-5, rtol=2e-5
    )


def test_timesformer_encoder_parity():
    torch.manual_seed(1)
    img, patch, dim, depth, heads, T = 32, 16, 48, 3, 4, 4
    oracle = OracleTimeSformer(img, patch, dim, depth, heads, T).eval()
    for p in oracle.parameters():
        torch.nn.init.normal_(p, std=0.04)

    B = 2
    x = torch.randn(B, 3, T, img, img)
    with torch.no_grad():
        ref = oracle(x).numpy()

    state = {}
    for k, v in oracle.state_dict().items():
        k = k.replace("proj.weight", "patch_embed.proj.weight").replace(
            "proj.bias", "patch_embed.proj.bias"
        ) if k.startswith("proj.") else k
        k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        state[k] = v
    params = convert_timesformer(state, depth=depth, patch=patch)

    model = TimeSformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, num_frames=T, drop_path_rate=0.0,
    )
    # channels-last input
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    out = model.apply({"params": params}, xj, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=5e-5)


def test_timesformer_param_shapes_initialize():
    model = TimeSformer(img_size=32, patch_size=16, embed_dim=48, depth=2,
                        num_heads=4, num_frames=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert n_params > 0


def test_pos_embed_interpolation_resolution_change():
    """Model trained at 32px must run at 48px via nearest pos-embed resize
    (reference lib/models/vit.py:375-388)."""
    model = TimeSformer(img_size=32, patch_size=16, embed_dim=48, depth=1,
                        num_heads=4, num_frames=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    out = model.apply(variables, jnp.ones((1, 4, 48, 48, 3)), deterministic=True)
    assert out.shape == (1, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_time_embed_interpolation_frame_change():
    model = TimeSformer(img_size=32, patch_size=16, embed_dim=48, depth=1,
                        num_heads=4, num_frames=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)))
    out = model.apply(variables, jnp.ones((2, 4, 32, 32, 3)), deterministic=True)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_timesformer_pallas_matches_xla_full_model():
    """Full encoder, use_pallas=True vs False at the real spatial geometry
    (N=196 engages the fused-qkv spatial kernel and the temporal kernel;
    the torch-oracle tests above run the XLA path, so this pins the whole
    pallas dispatch — projections, window permutation, CLS split — at
    model level)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from procedurevrl_tpu.models.timesformer import TimeSformer

    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(1, 2, 224, 224, 3), jnp.float32)
    kw = dict(depth=1, num_frames=2, dtype=jnp.float32)
    m_x = TimeSformer(use_pallas=False, **kw)
    variables = jax.jit(m_x.init)(jax.random.PRNGKey(0), x)
    m_p = TimeSformer(use_pallas=True, **kw)
    out_x = jax.jit(
        lambda v, t: m_x.apply(v, t, deterministic=True))(variables, x)
    out_p = jax.jit(
        lambda v, t: m_p.apply(v, t, deterministic=True))(variables, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=3e-5, rtol=3e-5)
