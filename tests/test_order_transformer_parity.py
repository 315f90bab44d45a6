"""Parity of the JAX diffusion order transformer against the torch oracle."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from procedurevrl_tpu.models.order_transformer import (
    DiffusionSchedule,
    OrderTransformer,
)
from procedurevrl_tpu.utils.converter import convert_order_transformer

from tests.torch_oracles import OracleOrderTransformer


def _oracle_to_params(oracle: OracleOrderTransformer) -> dict:
    state = {}
    for k, v in oracle.state_dict().items():
        k = k.replace("resblocks.", "temporalModelling.resblocks.")
        k = k.replace(".c_fc.", ".mlp.c_fc.").replace(".c_proj.", ".mlp.c_proj.")
        k = k.replace("time_fc1.", "time_mlp.1.").replace("time_fc2.", "time_mlp.3.")
        state[k] = v
    return convert_order_transformer(state, layers=oracle.layers)


def _make(seed=0, hidden=32, heads=4, layers=4, max_len=9):
    torch.manual_seed(seed)
    oracle = OracleOrderTransformer(
        num_seg=max_len - 1, layers=layers, heads=heads, hidden=hidden, max_len=max_len
    ).eval()
    for p in oracle.parameters():
        torch.nn.init.normal_(p, std=0.08)
    model = OrderTransformer(
        num_seg=max_len - 1, tfm_layers=layers, tfm_heads=heads,
        hidden_size=hidden, max_len=max_len,
    )
    return oracle, model, _oracle_to_params(oracle)


def test_schedule_matches_reference():
    sched = DiffusionSchedule(4, "linear")
    betas = torch.linspace(1e-4, 0.02, 4)
    ac = torch.cumprod(1 - betas, dim=0)
    np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod),
                               torch.sqrt(ac).numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.sqrt_one_minus_alphas_cumprod),
                               torch.sqrt(1 - ac).numpy(), rtol=1e-5)


def test_forecast_parity():
    oracle, model, params = _make(seed=3)
    B, T, C = 3, 8, 32
    x = torch.randn(B * T, C)
    with torch.no_grad():
        ref = oracle.forecast(x).numpy()
    out = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        method=OrderTransformer.forecast,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=3e-5)


def test_pretrain_parity_controlled_randomness():
    oracle, model, params = _make(seed=4)
    B, L, C = 4, 9, 32
    x = torch.randn(B * L, C)
    mask_inds = torch.tensor([0, 4, 8, 2])
    pad_start = torch.tensor([3, 6, 9, 5])  # 9 == max_len means "no padding"
    level_noise = torch.randn(4, B, C)
    with torch.no_grad():
        ref_final, ref_x0, ref_all = oracle.pretrain(x, mask_inds, pad_start, level_noise)

    final, m, (x0_exp, all_d), inter = model.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        mask_inds=jnp.asarray(mask_inds.numpy()),
        pad_start=jnp.asarray(pad_start.numpy()),
        level_noise=jnp.asarray(level_noise.numpy()),
        method=OrderTransformer.pretrain,
    )
    np.testing.assert_allclose(np.asarray(final), ref_final.numpy(), atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(x0_exp), ref_x0.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(all_d), ref_all.numpy(), atol=3e-5, rtol=3e-5)


def test_pretrain_random_path_runs():
    _, model, params = _make(seed=5)
    B, L, C = 2, 9, 32
    x = jnp.asarray(np.random.RandomState(0).randn(B * L, C).astype(np.float32))
    final, mask_inds, (a, b), inter = model.apply(
        {"params": params}, x, is_pretrain=True,
        rngs={"diffusion": jax.random.PRNGKey(7)},
    )
    assert final.shape == (B, C)
    assert mask_inds.shape == (B,)
    assert a.shape == (4 * B, C) and b.shape == (4 * B, C)
    assert np.isfinite(np.asarray(final)).all()
