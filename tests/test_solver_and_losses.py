"""Solver (LR policies, optimizer semantics) and loss parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from procedurevrl_tpu.config import get_cfg
from procedurevrl_tpu.engine import losses as L
from procedurevrl_tpu.solver.lr_policy import get_lr_at_epoch, lr_schedule
from procedurevrl_tpu.solver.optimizer import construct_optimizer
from procedurevrl_tpu.utils import metrics as M


# ---------------------------------------------------------------------------
# LR policies
# ---------------------------------------------------------------------------


def _ref_lr(cfg, cur_epoch):
    """Reference lib/utils/lr_policy.py math, restated."""
    import math

    def cosine(e):
        return cfg.SOLVER.COSINE_END_LR + (
            cfg.SOLVER.BASE_LR - cfg.SOLVER.COSINE_END_LR
        ) * (math.cos(math.pi * e / cfg.SOLVER.MAX_EPOCH) + 1.0) * 0.5

    def steps(e):
        bounds = list(cfg.SOLVER.STEPS) + [cfg.SOLVER.MAX_EPOCH]
        ind = 0
        for ind, s in enumerate(bounds):
            if e < s:
                break
        return cfg.SOLVER.LRS[ind - 1] * cfg.SOLVER.BASE_LR

    fn = cosine if cfg.SOLVER.LR_POLICY == "cosine" else steps
    lr = fn(cur_epoch)
    if cur_epoch < cfg.SOLVER.WARMUP_EPOCHS:
        start = cfg.SOLVER.WARMUP_START_LR
        end = fn(cfg.SOLVER.WARMUP_EPOCHS)
        lr = cur_epoch * (end - start) / cfg.SOLVER.WARMUP_EPOCHS + start
    return lr


@pytest.mark.parametrize("policy", ["cosine", "steps_with_relative_lrs"])
def test_lr_policy_matches_reference_math(policy):
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = policy
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.MAX_EPOCH = 20
    cfg.SOLVER.WARMUP_EPOCHS = 2.0
    cfg.SOLVER.WARMUP_START_LR = 1e-5
    cfg.SOLVER.STEPS = [0, 10, 15]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    steps_per_epoch = 7
    sched = lr_schedule(cfg, steps_per_epoch)
    for step in [0, 3, 7, 20, 70, 100, 139]:
        epoch = step / steps_per_epoch
        expect = _ref_lr(cfg, epoch)
        assert get_lr_at_epoch(cfg, epoch) == pytest.approx(expect, rel=1e-6)
        got = float(sched(jnp.asarray(step)))
        # traced version runs in fp32
        assert got == pytest.approx(expect, rel=1e-4, abs=1e-9), (step, got, expect)


# ---------------------------------------------------------------------------
# optimizer group semantics vs torch
# ---------------------------------------------------------------------------


def test_sgd_matches_torch_coupled_wd():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 1e-2
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 100
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.TRAIN.LABEL_EMB = "x"  # pretraining mode: 'main' group

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    params = {"encoder": {"w": jnp.asarray(w0)}}
    sched = lr_schedule(cfg, steps_per_epoch=1)
    tx = construct_optimizer(params, cfg, sched)
    opt_state = tx.init(params)

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, nesterov=True,
                           weight_decay=1e-2)

    p = params
    for step in range(3):
        g = np.random.RandomState(step + 1).randn(4, 3).astype(np.float32)
        grads = {"encoder": {"w": jnp.asarray(g)}}
        lr = get_lr_at_epoch(cfg, step)  # steps_per_epoch=1
        for pg in topt.param_groups:
            pg["lr"] = lr
        tw.grad = torch.tensor(g)
        topt.step()
        updates, opt_state = tx.update(grads, opt_state, p)
        import optax

        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(
        np.asarray(p["encoder"]["w"]), tw.detach().numpy(), atol=1e-6
    )


def test_adamw_matches_torch():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WEIGHT_DECAY = 0.05
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 100
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.TRAIN.LABEL_EMB = "x"

    w0 = np.random.RandomState(0).randn(6).astype(np.float32)
    params = {"blocks": {"w": jnp.asarray(w0)}}
    sched = lr_schedule(cfg, steps_per_epoch=1)
    tx = construct_optimizer(params, cfg, sched)
    opt_state = tx.init(params)
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.AdamW([tw], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.05)
    p = params
    import optax

    for step in range(4):
        g = np.random.RandomState(step + 10).randn(6).astype(np.float32)
        lr = get_lr_at_epoch(cfg, step)
        for pg in topt.param_groups:
            pg["lr"] = lr
        tw.grad = torch.tensor(g)
        topt.step()
        updates, opt_state = tx.update(
            {"blocks": {"w": jnp.asarray(g)}}, opt_state, p
        )
        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(
        np.asarray(p["blocks"]["w"]), tw.detach().numpy(), atol=1e-6
    )


def test_finetune_freezing_groups():
    cfg = get_cfg()
    cfg.TRAIN.LINEAR = True
    cfg.TRAIN.MULT = 0.0
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 10
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.BASE_LR = 1.0

    params = {
        "encoder": {"w": jnp.ones(3)},
        "head": {"kernel": jnp.ones(3)},
        "head_cls": {"kernel": jnp.ones(3)},
        "order_tfm": {"w": jnp.ones(3)},
        "text_model": {"w": jnp.ones(3)},
    }
    sched = lr_schedule(cfg, 1)
    tx = construct_optimizer(params, cfg, sched)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    assert float(jnp.sum(jnp.abs(updates["encoder"]["w"]))) == 0  # frozen (LINEAR)
    assert float(jnp.sum(jnp.abs(updates["head"]["kernel"]))) == 0  # frozen proj
    assert float(jnp.sum(jnp.abs(updates["text_model"]["w"]))) == 0  # frozen text
    assert float(jnp.sum(jnp.abs(updates["head_cls"]["kernel"]))) > 0
    assert float(jnp.sum(jnp.abs(updates["order_tfm"]["w"]))) > 0


# ---------------------------------------------------------------------------
# losses vs torch
# ---------------------------------------------------------------------------


def test_pretrain_loss_matches_torch():
    rng = np.random.RandomState(0)
    B, K = 16, 50
    student = rng.randn(B, K).astype(np.float32) * 3
    teacher = rng.randn(B, K).astype(np.float32) * 3
    m0 = rng.randn(8, 32).astype(np.float32)
    m1 = rng.randn(8, 32).astype(np.float32)
    topk = 5

    ts = torch.tensor(teacher)
    tp = F.softmax(ts, 1)
    tp = (tp.unsqueeze(1) * (
        tp.unsqueeze(1) == tp.topk(k=topk, dim=1)[0].unsqueeze(2)
    ).float()).sum(1)
    tp = tp / tp.sum(1, keepdim=True)
    loss1 = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(torch.tensor(student), dim=1), tp
    )
    loss2 = torch.nn.MSELoss()(torch.tensor(m0), torch.tensor(m1))
    expect = float(loss1 + loss2)

    total, kl, mse = L.pretrain_loss(
        jnp.asarray(student), jnp.asarray(teacher),
        (jnp.asarray(m0), jnp.asarray(m1)), topk,
    )
    assert float(total) == pytest.approx(expect, rel=1e-5)


def test_ce_losses_match_torch():
    rng = np.random.RandomState(1)
    B, C = 12, 7
    logits = rng.randn(B, C).astype(np.float32) * 2
    labels = rng.randint(0, C, B)
    tl = torch.tensor(logits)
    tt = torch.tensor(labels)
    assert float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))) == (
        pytest.approx(float(F.cross_entropy(tl, tt)), rel=1e-5)
    )
    # label smoothing (timm formula)
    sm = 0.2
    logp = F.log_softmax(tl, dim=-1)
    nll = -logp.gather(1, tt.unsqueeze(1)).squeeze(1)
    smooth_ref = float(((1 - sm) * nll + sm * (-logp.mean(dim=-1))).mean())
    assert float(
        L.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), sm)
    ) == pytest.approx(smooth_ref, rel=1e-5)
    # soft target
    soft = np.abs(rng.randn(B, C).astype(np.float32))
    soft /= soft.sum(1, keepdims=True)
    st_ref = float(torch.sum(-torch.tensor(soft) * logp, dim=-1).mean())
    assert float(
        L.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(soft))
    ) == pytest.approx(st_ref, rel=1e-5)


def test_topk_metrics_match_torch():
    rng = np.random.RandomState(2)
    B, C = 32, 11
    preds = rng.randn(B, C).astype(np.float32)
    labels = rng.randint(0, C, B)
    tp = torch.tensor(preds)
    tl = torch.tensor(labels)
    _top_max_k_vals, top_max_k_inds = torch.topk(tp, 5, dim=1, largest=True, sorted=True)
    rep = tl.view(1, -1).expand_as(top_max_k_inds.t())
    correct = top_max_k_inds.t().eq(rep)
    expect = [float(correct[:k, :].reshape(-1).float().sum()) for k in (1, 5)]
    got = M.topks_correct(jnp.asarray(preds), jnp.asarray(labels), (1, 5))
    assert [float(g) for g in got] == pytest.approx(expect)


def test_multitask_topk():
    rng = np.random.RandomState(3)
    B = 16
    v = rng.randn(B, 9).astype(np.float32)
    n = rng.randn(B, 13).astype(np.float32)
    vl = rng.randint(0, 9, B)
    nl = rng.randint(0, 13, B)
    a1, a5 = M.multitask_topk_accuracies(
        (jnp.asarray(v), jnp.asarray(n)), (jnp.asarray(vl), jnp.asarray(nl)), (1, 5)
    )
    # brute force
    def topk_hit(p, l, k):
        return l in np.argsort(-p)[:k]

    expect1 = np.mean([
        topk_hit(v[i], vl[i], 1) and topk_hit(n[i], nl[i], 1) for i in range(B)
    ]) * 100
    expect5 = np.mean([
        topk_hit(v[i], vl[i], 5) and topk_hit(n[i], nl[i], 5) for i in range(B)
    ]) * 100
    assert float(a1) == pytest.approx(expect1)
    assert float(a5) == pytest.approx(expect5)


def test_mixup_soft_targets_sane():
    from procedurevrl_tpu.engine.mixup import Mixup

    mx = Mixup(num_classes=10)
    key = jax.random.PRNGKey(0)
    frames = jnp.ones((4, 2, 8, 8, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, soft = mx(key, frames, labels)
    assert mixed.shape == frames.shape
    assert soft.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(jnp.sum(soft, 1)), 1.0, atol=1e-5)


def test_stochastic_round_bf16_unbiased():
    """SR(x) averages back to x (within std-error) and never moves x by
    more than one bf16 ulp."""
    import jax
    import jax.numpy as jnp

    from procedurevrl_tpu.solver.low_precision import stochastic_round_bf16

    x = jnp.asarray(
        np.linspace(-3.0, 3.0, 64).astype(np.float32) * 1e-3 + 1.0
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    samples = jax.vmap(lambda k: stochastic_round_bf16(x, k))(keys)
    mean = np.asarray(jnp.mean(samples.astype(jnp.float32), axis=0))
    # exact bf16 neighbours: truncation (round-toward-zero) and one ulp up
    bits = np.asarray(x).view(np.uint32)
    lo = (bits & np.uint32(0xFFFF0000)).view(np.float32)
    hi = ((bits & np.uint32(0xFFFF0000)) + np.uint32(0x10000)).view(np.float32)
    ulp = np.abs(hi - lo)
    np.testing.assert_allclose(mean, np.asarray(x), atol=float(ulp.max()) / 4)
    # every sample is one of the two bf16 neighbours
    s32 = np.asarray(samples.astype(jnp.float32))
    assert np.all((s32 == lo[None, :]) | (s32 == hi[None, :]))


def test_adam_lp_tracks_fp32_adam():
    """bf16-moment Adam follows fp32 Adam on a least-squares problem, and
    the second moment does NOT freeze (the failure mode of round-to-nearest
    bf16 storage, whose per-step v increment is below the bf16 ulp)."""
    import jax
    import jax.numpy as jnp
    import optax

    from procedurevrl_tpu.solver.low_precision import scale_by_adam_lp

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    loss = lambda w: jnp.mean((A @ w - b) ** 2)
    grad = jax.jit(jax.grad(loss))

    def run(tx, steps=300):
        w = jnp.zeros((8,), jnp.float32)
        s = tx.init(w)
        upd = jax.jit(tx.update)
        for _ in range(steps):
            u, s = upd(grad(w), s)
            w = w + (-1e-2) * u
        return w, s

    w32, _ = run(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    wlp, slp = run(scale_by_adam_lp(b1=0.9, b2=0.999, eps=1e-8, seed=0))
    assert slp.mu.dtype == jnp.bfloat16 and slp.nu.dtype == jnp.bfloat16
    assert float(loss(wlp)) < 1.2 * float(loss(w32)) + 1e-4
    np.testing.assert_allclose(np.asarray(wlp), np.asarray(w32), atol=0.05)

    # v-freeze check: tiny constant gradient whose v-increment is far below
    # the bf16 ulp of the steady-state v must still accumulate toward the
    # fp32 EMA value in expectation.
    tx = scale_by_adam_lp(b1=0.9, b2=0.999, eps=1e-8, seed=1)
    w = jnp.ones((128,), jnp.float32)
    s = tx.init(w)
    g = jnp.full((128,), 1e-3, jnp.float32)
    upd = jax.jit(tx.update)
    for _ in range(2000):
        _, s = upd(g, s)
    v_expect = (1.0 - 0.999 ** 2000) * 1e-6  # fp32 EMA of g^2
    v_mean = float(jnp.mean(s.nu.astype(jnp.float32)))
    assert abs(v_mean - v_expect) < 0.05 * v_expect, (v_mean, v_expect)


@pytest.mark.parametrize("variant", ["flat", "fused"])
@pytest.mark.parametrize("method", ["adamw", "adam"])
def test_flat_optimizer_matches_per_leaf(method, variant):
    """TPU.FLAT_OPT=True (solver/flat_optimizer single-fusion update) must
    reproduce the per-leaf optax chain's parameter trajectory exactly,
    including group rules: bn decay, frozen text tower, default decay."""
    import optax

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = method
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WEIGHT_DECAY = 0.05
    cfg.BN.WEIGHT_DECAY = 0.0
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 100
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.TRAIN.LABEL_EMB = "x"

    rng = np.random.RandomState(0)
    params = {
        "blocks": {"w": jnp.asarray(rng.randn(4, 6).astype(np.float32)),
                   "bn_scale": jnp.asarray(rng.randn(5).astype(np.float32))},
        "text_model": {"w": jnp.asarray(rng.randn(3).astype(np.float32))},
        "order": {"w": jnp.asarray(rng.randn(7).astype(np.float32))},
    }
    sched = lr_schedule(cfg, steps_per_epoch=1)

    tx_leaf = construct_optimizer(params, cfg, sched)
    if variant == "flat":
        cfg.TPU.FLAT_OPT = True
    else:
        cfg.TPU.FUSED_OPT = True
    tx_flat = construct_optimizer(params, cfg, sched)
    from procedurevrl_tpu.solver.flat_optimizer import (
        FlatAdamState, FusedAdamState,
    )

    st_flat = tx_flat.init(params)
    want = FlatAdamState if variant == "flat" else FusedAdamState
    assert isinstance(st_flat, want), "requested path not engaged"
    st_leaf = tx_leaf.init(params)

    p_leaf = p_flat = params
    for step in range(4):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.RandomState(step).randn(*x.shape).astype(
                    np.float32)), params)
        u1, st_leaf = tx_leaf.update(g, st_leaf, p_leaf)
        p_leaf = optax.apply_updates(p_leaf, u1)
        u2, st_flat = tx_flat.update(g, st_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u2)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_flat),
            jax.tree_util.tree_leaves_with_path(p_leaf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-7,
            err_msg=jax.tree_util.keystr(path))
