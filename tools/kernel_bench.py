"""Kernel-level microbenchmarks for the Pallas attention families.

Measures fwd and fwd+bwd wall time of each kernel at its real in-model
geometry, with the two axon-tunnel pitfalls designed out:

1. The tunnel CACHES identical executions — chain each iteration's input
   on the previous iteration's gradient inside one jitted ``lax.scan`` so
   every step does real work.
2. ``jax.block_until_ready`` does NOT reliably block through the tunnel —
   a dispatched executable can "complete" in microseconds of wall time.
   Timing must force a host read (``float(out)``) of a value that depends
   on the whole scan.

Also note: the tunnel rejects >~100 MB host uploads (HTTP 413); operand
tensors here stay below that.

Usage::

    python tools/kernel_bench.py [family ...]

Families: ``spatial``, ``spatial_cls``, ``spatial_clsq``, ``temporal``,
``mvit_ph``, ``mvit_hl``, ``mvit_kt`` (default: all).  Prints one line per family:
``<family> fwd <ms>  fwd+bwd <ms>`` (per scan iteration, best of 3).

Reference baselines (v5e, bench shapes, round 3) in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax

    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()
    return jax


N_ITERS = 20


def _bench(loss, args, grad_arg=0, n=N_ITERS):
    """Per-iteration ms of ``loss(*args)`` (and its grad) under the
    chained-scan + forced-host-read protocol."""
    import jax
    import jax.numpy as jnp

    rest = list(args)
    a0 = rest.pop(grad_arg)

    def timed(make_body):
        body = make_body()

        @jax.jit
        def run(a):
            a, ls = jax.lax.scan(body, a, None, length=n)
            return ls.sum()

        float(run(a0))  # compile + warm
        ts = []
        for i in range(3):
            ai = a0 * (1.0 + 1e-6 * (i + 1))
            float(ai.sum())  # materialize off the timed path
            t0 = time.perf_counter()
            float(run(ai))
            ts.append((time.perf_counter() - t0) / n * 1e3)
        return min(ts)

    def fwd_body():
        def body(a, _):
            l = loss(a, *rest)
            return a + (l * 1e-7).astype(a.dtype), l
        return body

    def bwd_body():
        gf = jax.value_and_grad(loss, argnums=0)

        def body(a, _):
            l, g = gf(a, *rest)
            return a + g.astype(a.dtype) * 1e-6, l
        return body

    return timed(fwd_body), timed(bwd_body)


def bench_spatial(cls: bool):
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.pallas_attention import (
        flash_attention_cls, flash_attention_headfused,
    )

    B, n, H, d = 144, 196, 12, 64  # bench-scale TimeSformer spatial pass
    c = H * d
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.4, jnp.bfloat16)
    scale = d ** -0.5
    if cls:
        q, k, v = mk(B, n, c), mk(B, n, c), mk(B, n, c)
        qc, kc, vc = mk(B, 1, c), mk(B, 1, c), mk(B, 1, c)

        def loss(q, k, v, qc, kc, vc):
            o, oc = flash_attention_cls(q, k, v, qc, kc, vc, H, scale)
            return (jnp.sum(jnp.sin(o.astype(jnp.float32)))
                    + jnp.sum(oc.astype(jnp.float32)))

        return _bench(loss, (q, k, v, qc, kc, vc))
    q, k, v = mk(B, n + 1, c), mk(B, n + 1, c), mk(B, n + 1, c)

    def loss(q, k, v):
        o = flash_attention_headfused(q, k, v, H, scale)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    return _bench(loss, (q, k, v))


def bench_spatial_clsq():
    """Fused-qkv window-layout CLS kernel (flash_attention_cls_qkv) at the
    same geometry as ``spatial_cls``; the delta isolates the kernel-side
    effect of one 3w-wide operand vs three w-wide ones (the model-side win
    — no split copies / no grad concat — only shows end-to-end)."""
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.attention import qkv_window_perm
    from procedurevrl_tpu.ops.pallas_attention import (
        _heads_per_block, flash_attention_cls_qkv,
    )

    B, n, H, d = 144, 196, 12, 64
    c = H * d
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.4, jnp.bfloat16)
    scale = d ** -0.5
    perm = np.asarray(qkv_window_perm(c, H, _heads_per_block(d, H)))
    qkv = mk(B, n, 3 * c)[..., perm]
    qkv_c = mk(B, 1, 3 * c)[..., perm]

    def loss(qkv, qkv_c):
        o, oc = flash_attention_cls_qkv(qkv, qkv_c, H, scale)
        return (jnp.sum(jnp.sin(o.astype(jnp.float32)))
                + jnp.sum(oc.astype(jnp.float32)))

    return _bench(loss, (qkv, qkv_c))


def bench_temporal():
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.pallas_attention import flash_attention_temporal

    B, T, n, H, d = 18, 8, 196, 12, 64
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, n, 3 * H * d) * 0.3, jnp.bfloat16)
    scale = d ** -0.5

    def loss(x):
        o = flash_attention_temporal(x, H, scale)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    return _bench(loss, (qkv,))


def _mvit_operands(B, H, d, q_shape, k_shape, layout):
    import jax.numpy as jnp

    qn, kn = int(np.prod(q_shape)), int(np.prod(k_shape))
    rng = np.random.RandomState(0)
    mk = lambda *s: (rng.randn(*s) * 0.3).astype(np.float32)
    tensors = [mk(B, H, qn, d), mk(B, H, kn, d), mk(B, H, kn, d),
               mk(B, H, 1, d), mk(B, H, 1, d),
               mk(B, H, qn, sum(k_shape))]  # concatenated [rt|rh|rw] table
    if layout == "fold":
        conv = lambda x: jnp.asarray(
            x.reshape(B * H, x.shape[2], x.shape[3]))
    else:  # head-last
        conv = lambda x: jnp.asarray(np.transpose(x, (0, 2, 1, 3)).reshape(
            B, x.shape[2], H * x.shape[3]))
    # all operands in the compute dtype, matching the model contract
    # (models/mvit.py passes rel_cat in q.dtype since the fused-bias change)
    return [conv(t).astype(jnp.bfloat16) for t in tensors]


def bench_mvit(kind: str):
    """Wide-key stage-transition block (kN=1568), the heaviest MViT case."""
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.pallas_mvit_attention import (
        flash_attention_mvit, flash_attention_mvit_hl,
        flash_attention_mvit_hl_kt, hl_supported,
    )

    B, H, d = 18, 2, 96
    q_shape, k_shape = (8, 28, 28), (8, 14, 14)
    scale = d ** -0.5
    if kind == "ph":
        args = _mvit_operands(B, H, d, q_shape, k_shape, "fold")

        def loss(*a):
            o = flash_attention_mvit(*a, k_shape, scale)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)))

        return _bench(loss, args)
    if kind == "hl":
        # whole-key head-last geometry needs a narrow key set: use the
        # stage-3 in-stage block shape (q unpooled, kv pooled 2x2)
        q_shape, k_shape = (8, 14, 14), (8, 7, 7)
        H = 4
        assert hl_supported(int(np.prod(k_shape)), H * d, H)
        args = _mvit_operands(B, H, d, q_shape, k_shape, "hl")

        def loss(*a):
            o = flash_attention_mvit_hl(*a, k_shape, H, scale)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)))

        return _bench(loss, args)
    args = _mvit_operands(B, H, d, q_shape, k_shape, "hl")

    def loss(*a):
        o = flash_attention_mvit_hl_kt(*a, k_shape, H, scale)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    return _bench(loss, args)


def bench_pool(impl: str):
    """MViT depthwise pooling (ops/pallas_pool) vs the lax.conv baseline.

    Geometry defaults to the stage-1 q-pool (the largest input); override
    with POOL_HW / POOL_C / POOL_S / POOL_T env vars.  Note the conv
    baseline in isolation understates the in-model cost: its relayout
    copies depend on neighbouring-op layouts only the full step has."""
    import jax
    import jax.numpy as jnp

    from procedurevrl_tpu.ops.pallas_pool import (
        depthwise_pool3d, depthwise_pool3d_taps,
    )

    B, T = 18, int(os.environ.get("POOL_T", "8"))
    HW = int(os.environ.get("POOL_HW", "56"))
    C = int(os.environ.get("POOL_C", "96"))
    s = int(os.environ.get("POOL_S", "1"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, HW, HW, C) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, C) * 0.2, jnp.bfloat16)

    if impl == "conv":
        def op(x, w):
            return jax.lax.conv_general_dilated(
                x, w.reshape(3, 3, 3, 1, C), window_strides=(1, s, s),
                padding=((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=C)
    elif impl == "taps":
        op = lambda x, w: depthwise_pool3d_taps(x, w, (1, s, s))
    else:
        op = lambda x, w: depthwise_pool3d(x, w, s, True)

    def loss(x, w):
        return jnp.sum(op(x, w).astype(jnp.float32))

    return _bench(loss, (x, w))


FAMILIES = {
    "spatial": lambda: bench_spatial(cls=False),
    "spatial_cls": lambda: bench_spatial(cls=True),
    "spatial_clsq": bench_spatial_clsq,
    "temporal": bench_temporal,
    "mvit_ph": lambda: bench_mvit("ph"),
    "mvit_hl": lambda: bench_mvit("hl"),
    "mvit_kt": lambda: bench_mvit("kt"),
    "pool": lambda: bench_pool("kernel"),
    "pool_taps": lambda: bench_pool("taps"),
    "pool_conv": lambda: bench_pool("conv"),
}


def main(argv):
    _setup()
    names = argv or list(FAMILIES)
    for name in names:
        fwd, fb = FAMILIES[name]()
        print(f"{name:12s} fwd {fwd:7.3f} ms   fwd+bwd {fb:7.3f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
