"""TPU-native 3D-ResNet video backbone family: SlowFast / ResNet (C2D, I3D,
Slow) / X3D.

Re-implements the reference's dormant PySlowFast backbones
(``lib/models/video_model_builder.py:153,425,624``) and their helper stack
(``lib/models/resnet_helper.py``, ``stem_helper.py``, ``head_helper.py``,
``nonlocal_helper.py``, ``operators.py``, ``batchnorm_helper.py``) as flax
modules designed for TPU:

- **Channels-last everywhere** ([B, T, H, W, C], NDHWC): XLA's TPU conv
  layouts are channels-last, and it removes every permute the reference
  needs (the head's ``(N,C,T,H,W)->(N,T,H,W,C)`` permute, the non-local
  group folding permutes, the SE reshape) — those become plain reshapes or
  disappear entirely.
- **BatchNorm over the global batch**: under pjit with the batch sharded
  over the ``data`` mesh axis, reducing over the batch axis makes XLA
  insert the cross-chip ``all-reduce`` automatically — plain BN here *is*
  the reference's ``NaiveSyncBatchNorm3d`` (``batchnorm_helper.py:173-217``)
  with no hand-written ``GroupGather`` autograd function.  Grouped /
  per-device statistics are expressed as batch splits (see
  :class:`VideoBatchNorm`), which also subsumes ``SubBatchNorm3d``
  (``batchnorm_helper.py:36-108``).
- 1x1x1 convolutions are written as ``nn.Dense`` on the channel axis
  (identical math, and XLA maps them straight onto the MXU as GEMMs).
- Submodule names mirror the reference attribute names (``s1``,
  ``pathway0_res3``, ``a_bn`` ...) so released PySlowFast / Caffe2
  checkpoints convert by name (see ``utils/c2_converter.py``).

Parity oracles: ``tests/test_resnet_video_parity.py``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Number of blocks per stage for a given depth
# (reference video_model_builder.py:26).
_MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# Temporal kernel basis per arch (reference video_model_builder.py:29-79).
_TEMPORAL_KERNEL_BASIS = {
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d_nopool": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "i3d_nopool": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
    "x3d": [[[5]], [[3]], [[3]], [[3]], [[3]]],
}

# Post-res2 max-pool per arch (reference video_model_builder.py:81-89).
_POOL1 = {
    "c2d": [[2, 1, 1]],
    "c2d_nopool": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "i3d_nopool": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "x3d": [[1, 1, 1]],
}

# c2_msra_fill: kaiming-normal, fan_out, relu gain
# (reference weight_init_helper.py:17-26).
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def fc_init(std: float):
    """Head projection init (reference weight_init_helper.py:40-43)."""
    return nn.initializers.normal(stddev=std)


def round_width(width, multiplier, min_width=8, divisor=8):
    """Filter-width rounding (reference video_model_builder.py:671-683,
    operators.py:38-57)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if out < 0.9 * width:
        out += divisor
    return int(out)


def pack_pathways(
    frames: jax.Array, arch: str, alpha: int, reverse_channels: bool = False
) -> list:
    """Split a single [B, T, H, W, C] clip into pathway inputs.

    TPU-native move of the reference's dataset-side ``pack_pathway_output``
    (``lib/datasets/utils.py:74-107``) into the model: the host ships ONE
    tensor and the slow pathway becomes a static gather under jit (free at
    trace time), instead of transferring two overlapping tensors.
    ``torch.linspace(0, T-1, T//alpha).long()`` truncation is reproduced.
    """
    if reverse_channels:
        frames = frames[..., ::-1]
    if arch in _POOL1 and arch != "slowfast":
        return [frames]
    t = frames.shape[1]
    idx = np.floor(np.linspace(0, t - 1, t // alpha)).astype(np.int32)
    return [frames[:, idx], frames]


# ---------------------------------------------------------------------------
# Norms (reference batchnorm_helper.py)
# ---------------------------------------------------------------------------


class VideoBatchNorm(nn.Module):
    """BatchNorm over [B, T, H, W] per channel, with optional batch splits.

    ``splits=1`` is standard BN computed on the *global* (sharded) batch —
    which under pjit equals the reference's NaiveSyncBatchNorm3d over all
    devices (``batchnorm_helper.py:173-217``); the cross-chip reduction is
    an XLA all-reduce over ICI.  ``splits>1`` computes statistics on each
    of ``splits`` equal batch sub-groups independently, which expresses
    both ``SubBatchNorm3d`` (``batchnorm_helper.py:36-108``; multigrid
    training) and grouped sync-BN (``NUM_SYNC_DEVICES`` sub-groups of the
    data axis).  Eval aggregates split statistics exactly like
    ``SubBatchNorm3d._get_aggregated_mean_std`` (``:68-81``):
    mean-of-means and mean-of-vars plus the between-split variance.

    Running statistics live in the ``batch_stats`` collection; the torch
    momentum convention is used (``new = (1-m)*old + m*batch``, m=0.1), and
    the running variance update uses the unbiased batch variance exactly as
    torch BN does.
    """

    momentum: float = 0.1  # torch convention (bn_mmt in the reference)
    eps: float = 1e-5
    splits: int = 1
    zero_init: bool = False
    # frozen: normalize with running stats even in train mode and never
    # update them — the reference's ``frozen_bn_stats``
    # (``lib/utils/misc.py:243-251``) as a declarative knob (``BN.FROZEN``)
    frozen: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        train = train and not self.frozen
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init else nn.initializers.ones,
            (c,), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        stat_shape = (self.splits, c) if self.splits > 1 else (c,)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(stat_shape, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(stat_shape, jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if train:
            if self.splits > 1:
                b = x.shape[0]
                assert b % self.splits == 0, (
                    f"batch {b} not divisible by {self.splits} BN splits"
                )
                xs = xf.reshape((self.splits, b // self.splits) + x.shape[1:])
                mean = jnp.mean(xs, axis=(1, 2, 3, 4))          # [S, C]
                var = jnp.var(xs, axis=(1, 2, 3, 4))            # [S, C]
                n = np.prod([b // self.splits, *x.shape[1:-1]])
                x_hat = (xs - mean[:, None, None, None, None, :]) * jax.lax.rsqrt(
                    var[:, None, None, None, None, :] + self.eps
                )
                x_hat = x_hat.reshape(x.shape)
            else:
                mean = jnp.mean(xf, axis=(0, 1, 2, 3))
                var = jnp.var(xf, axis=(0, 1, 2, 3))
                n = np.prod([x.shape[0], *x.shape[1:-1]])
                x_hat = (xf - mean) * jax.lax.rsqrt(var + self.eps)
            if not self.is_initializing():
                var_unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var_unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
            if self.splits > 1:
                agg_mean = jnp.mean(mean, axis=0)
                agg_var = jnp.mean(var, axis=0) + jnp.mean(
                    (mean - agg_mean) ** 2, axis=0
                )
                mean, var = agg_mean, agg_var
            x_hat = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (x_hat * scale + bias).astype(x.dtype)


def get_norm_builder(norm_type: str, num_splits: int, num_groups: int,
                     frozen: bool = False):
    """Norm factory (reference ``batchnorm_helper.py:14-33``).

    ``batchnorm`` -> global-batch BN (= sync over all chips under pjit);
    ``sub_batchnorm`` -> ``NUM_SPLITS`` batch splits;
    ``sync_batchnorm`` -> ``world // NUM_SYNC_DEVICES`` contiguous groups of
    the (rank-ordered) global batch, the pjit expression of per-group stat
    synchronization.
    """
    if norm_type == "batchnorm":
        return partial(VideoBatchNorm, splits=1, frozen=frozen)
    if norm_type == "sub_batchnorm":
        return partial(VideoBatchNorm, splits=num_splits, frozen=frozen)
    if norm_type == "sync_batchnorm":
        return partial(VideoBatchNorm, splits=max(1, num_groups), frozen=frozen)
    raise NotImplementedError(f"Norm type {norm_type} is not supported")


# ---------------------------------------------------------------------------
# Operators (reference operators.py)
# ---------------------------------------------------------------------------


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (reference operators.py:9-32; the custom autograd
    Function exists only to save memory — jax derives the same VJP)."""
    return jax.nn.silu(x)


class SE(nn.Module):
    """Squeeze-and-Excitation (reference operators.py:35-81).

    The two 1x1x1 convs are channel Dense layers; the global pool is a
    mean over (T, H, W) — no adaptive-pool op needed.
    """

    dim_in: int
    ratio: float
    relu_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim_fc = round_width(self.dim_in, self.ratio)
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.Dense(dim_fc, dtype=self.dtype, kernel_init=msra_init,
                     name="fc1")(s)
        s = nn.relu(s) if self.relu_act else swish(s)
        s = nn.Dense(self.dim_in, dtype=self.dtype, kernel_init=msra_init,
                     name="fc2")(s)
        return x * jax.nn.sigmoid(s)


def conv3d(
    dim_out: int,
    kernel: Sequence[int],
    stride: Sequence[int] = (1, 1, 1),
    padding: Optional[Sequence[int]] = None,
    groups: int = 1,
    dilation: Sequence[int] = (1, 1, 1),
    bias: bool = False,
    dtype=jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """Conv3d in NDHWC with explicit symmetric padding (torch semantics)."""
    if padding is None:
        padding = [k // 2 for k in kernel]
    return nn.Conv(
        dim_out,
        kernel_size=tuple(kernel),
        strides=tuple(stride),
        padding=[(p, p) for p in padding],
        feature_group_count=groups,
        kernel_dilation=tuple(dilation),
        use_bias=bias,
        kernel_init=msra_init,
        dtype=dtype,
        name=name,
    )


def max_pool3d(x, window, stride=None, padding=(0, 0, 0)):
    """MaxPool3d over (T, H, W) with torch-style symmetric padding."""
    stride = stride or window
    if all(w == 1 for w in window):
        return x
    return nn.max_pool(
        x,
        window_shape=tuple(window),
        strides=tuple(stride),
        padding=[(p, p) for p in padding],
    )


# ---------------------------------------------------------------------------
# Transformation functions (reference resnet_helper.py:20-396)
# ---------------------------------------------------------------------------


class BasicTransform(nn.Module):
    """Tx3x3 + 1x3x3 (reference resnet_helper.py:37-120)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: Optional[int] = None
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    block_idx: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        tk = self.temp_kernel_size
        x = conv3d(self.dim_out, [tk, 3, 3], [1, self.stride, self.stride],
                   [tk // 2, 1, 1], dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, [1, 3, 3], [1, 1, 1], [0, 1, 1],
                   dtype=self.dtype, name="b")(x)
        x = self.norm(zero_init=self.zero_init_final_bn, name="b_bn")(x, train)
        return x


class BottleneckTransform(nn.Module):
    """Tx1x1 + 1x3x3 + 1x1x1 (reference resnet_helper.py:263-396)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    block_idx: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        str1, str3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        tk, d = self.temp_kernel_size, self.dilation
        x = conv3d(self.dim_inner, [tk, 1, 1], [1, str1, str1], [tk // 2, 0, 0],
                   dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, [1, 3, 3], [1, str3, str3], [0, d, d],
                   groups=self.num_groups, dilation=[1, d, d],
                   dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn")(x, train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, [1, 1, 1], dtype=self.dtype, name="c")(x)
        x = self.norm(zero_init=self.zero_init_final_bn, name="c_bn")(x, train)
        return x


class X3DTransform(nn.Module):
    """1x1x1 + Tx3x3 channelwise (+SE/Swish) + 1x1x1
    (reference resnet_helper.py:123-261)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        str1, str3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        tk, d = self.temp_kernel_size, self.dilation
        x = conv3d(self.dim_inner, [1, 1, 1], [1, str1, str1],
                   dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, [tk, 3, 3], [1, str3, str3],
                   [tk // 2, d, d], groups=self.num_groups,
                   dilation=[1, d, d], dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn")(x, train)
        # SE on every other block (reference resnet_helper.py:235-237)
        if self.se_ratio > 0.0 and (self.block_idx + 1) % 2:
            x = SE(self.dim_inner, self.se_ratio, dtype=self.dtype,
                   name="se")(x)
        x = swish(x) if self.swish_inner else nn.relu(x)
        x = conv3d(self.dim_out, [1, 1, 1], dtype=self.dtype, name="c")(x)
        x = self.norm(zero_init=self.zero_init_final_bn, name="c_bn")(x, train)
        return x


_TRANS_FUNCS = {
    "bottleneck_transform": BottleneckTransform,
    "basic_transform": BasicTransform,
    "x3d_transform": X3DTransform,
}


def get_trans_func(name: str):
    """reference resnet_helper.py:20-32"""
    assert name in _TRANS_FUNCS, f"Transformation function '{name}' not supported"
    return _TRANS_FUNCS[name]


# ---------------------------------------------------------------------------
# Non-local block (reference nonlocal_helper.py)
# ---------------------------------------------------------------------------


class Nonlocal(nn.Module):
    """Non-local block (reference nonlocal_helper.py:9-147).

    theta over the full token set; phi/g over the (optionally max-pooled)
    set; softmax or dot-product normalization; output conv + BN with a
    residual.  1x1x1 convs are channel Dense layers; the token flattening
    is a plain reshape in NDHWC.
    """

    dim: int
    dim_inner: int
    pool_size: Optional[Tuple[int, int, int]] = None
    instantiation: str = "softmax"
    zero_init_final_norm: bool = True
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, t, h, w, _ = x.shape
        dense = partial(nn.Dense, self.dim_inner, use_bias=True,
                        kernel_init=msra_init, dtype=self.dtype)
        theta = dense(name="conv_theta")(x).reshape(b, t * h * w, self.dim_inner)
        xp = x
        if self.pool_size is not None and any(s > 1 for s in self.pool_size):
            xp = max_pool3d(x, self.pool_size)
        p = xp.shape[1] * xp.shape[2] * xp.shape[3]
        phi = dense(name="conv_phi")(xp).reshape(b, p, self.dim_inner)
        g = dense(name="conv_g")(xp).reshape(b, p, self.dim_inner)

        attn = jnp.einsum("btc,bpc->btp", theta.astype(jnp.float32),
                          phi.astype(jnp.float32))
        if self.instantiation == "softmax":
            attn = jax.nn.softmax(attn * self.dim_inner ** -0.5, axis=2)
        elif self.instantiation == "dot_product":
            attn = attn / p
        else:
            raise NotImplementedError(
                f"Unknown norm type {self.instantiation}"
            )
        out = jnp.einsum("btp,bpc->btc", attn, g.astype(jnp.float32))
        out = out.reshape(b, t, h, w, self.dim_inner).astype(x.dtype)
        out = nn.Dense(self.dim, use_bias=True, kernel_init=msra_init,
                       dtype=self.dtype, name="conv_out")(out)
        out = self.norm(
            zero_init=self.zero_init_final_norm and self.zero_init_final_bn,
            name="bn",
        )(out, train)
        return x + out


# ---------------------------------------------------------------------------
# Residual blocks and stages (reference resnet_helper.py:399-745)
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """Residual block with optional projection shortcut
    (reference resnet_helper.py:399-536)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func: Any = BottleneckTransform
    dim_inner: int = 64
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        f_x = self.trans_func(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            dim_inner=self.dim_inner,
            num_groups=self.num_groups,
            stride_1x1=self.stride_1x1,
            dilation=self.dilation,
            norm=self.norm,
            zero_init_final_bn=self.zero_init_final_bn,
            block_idx=self.block_idx,
            dtype=self.dtype,
            name="branch2",
        )(x, train)
        if train and self.drop_connect_rate > 0.0:
            # per-sample drop-connect (reference resnet_helper.py:516-525)
            keep = 1.0 - self.drop_connect_rate
            mask = jax.random.bernoulli(
                self.make_rng("droppath"), keep, (x.shape[0], 1, 1, 1, 1)
            )
            f_x = jnp.where(mask, f_x / keep, jnp.zeros_like(f_x))
        if self.dim_in != self.dim_out or self.stride != 1:
            sc = conv3d(self.dim_out, [1, 1, 1], [1, self.stride, self.stride],
                        [0, 0, 0], dtype=self.dtype, name="branch1")(x)
            sc = self.norm(name="branch1_bn")(sc, train)
            x = sc + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class ResStage(nn.Module):
    """One multi-pathway residual stage (reference resnet_helper.py:539-745).

    ``temp_kernel_sizes`` is extended to ``num_block_temp_kernel`` blocks
    and padded with 1s exactly as the reference does (``:626-630``).  The
    non-local group folding is a single reshape in NDHWC (the reference
    needs four permutes, ``:726-742``).
    """

    dim_in: Tuple[int, ...]
    dim_out: Tuple[int, ...]
    stride: Tuple[int, ...]
    temp_kernel_sizes: Tuple[Tuple[int, ...], ...]
    num_blocks: Tuple[int, ...]
    dim_inner: Tuple[int, ...]
    num_groups: Tuple[int, ...]
    num_block_temp_kernel: Tuple[int, ...]
    nonlocal_inds: Tuple[Tuple[int, ...], ...]
    nonlocal_group: Tuple[int, ...]
    nonlocal_pool: Tuple[Tuple[int, int, int], ...]
    dilation: Tuple[int, ...]
    instantiation: str = "softmax"
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    norm: Callable = VideoBatchNorm
    zero_init_final_bn: bool = False
    drop_connect_rate: float = 0.0
    dtype: Any = jnp.float32

    def _block_temp_kernels(self, pathway: int):
        tks = (
            list(self.temp_kernel_sizes[pathway]) * self.num_blocks[pathway]
        )[: self.num_block_temp_kernel[pathway]]
        tks += [1] * (self.num_blocks[pathway] - self.num_block_temp_kernel[pathway])
        return tks

    @nn.compact
    def __call__(self, inputs: list, train: bool) -> list:
        assert all(
            self.num_block_temp_kernel[i] <= self.num_blocks[i]
            for i in range(len(self.temp_kernel_sizes))
        )
        output = []
        for pathway in range(len(self.num_blocks)):
            x = inputs[pathway]
            tks = self._block_temp_kernels(pathway)
            for i in range(self.num_blocks[pathway]):
                x = ResBlock(
                    dim_in=self.dim_in[pathway] if i == 0 else self.dim_out[pathway],
                    dim_out=self.dim_out[pathway],
                    temp_kernel_size=tks[i],
                    stride=self.stride[pathway] if i == 0 else 1,
                    trans_func=get_trans_func(self.trans_func_name),
                    dim_inner=self.dim_inner[pathway],
                    num_groups=self.num_groups[pathway],
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[pathway],
                    norm=self.norm,
                    zero_init_final_bn=self.zero_init_final_bn,
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    dtype=self.dtype,
                    name=f"pathway{pathway}_res{i}",
                )(x, train)
                if i in self.nonlocal_inds[pathway]:
                    nln = Nonlocal(
                        dim=self.dim_out[pathway],
                        dim_inner=self.dim_out[pathway] // 2,
                        pool_size=tuple(self.nonlocal_pool[pathway]),
                        instantiation=self.instantiation,
                        norm=self.norm,
                        zero_init_final_bn=self.zero_init_final_bn,
                        dtype=self.dtype,
                        name=f"pathway{pathway}_nonlocal{i}",
                    )
                    group = self.nonlocal_group[pathway]
                    if group > 1:
                        b, t = x.shape[0], x.shape[1]
                        x = x.reshape((b * group, t // group) + x.shape[2:])
                        x = nln(x, train)
                        x = x.reshape((b, t) + x.shape[2:])
                    else:
                        x = nln(x, train)
            output.append(x)
        return output


# ---------------------------------------------------------------------------
# Stems (reference stem_helper.py)
# ---------------------------------------------------------------------------


class ResNetBasicStem(nn.Module):
    """Conv + BN + ReLU + 1x3x3/1x2x2 max-pool
    (reference stem_helper.py:117-193)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: Callable = VideoBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = conv3d(self.dim_out, self.kernel, self.stride, self.padding,
                   dtype=self.dtype, name="conv")(x)
        x = self.norm(name="bn")(x, train)
        x = nn.relu(x)
        return max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))


class X3DStem(nn.Module):
    """Spatial conv then depthwise temporal conv + BN + ReLU
    (reference stem_helper.py:196-279)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: Callable = VideoBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        x = conv3d(self.dim_out, [1, kh, kw], [1, sh, sw], [0, ph, pw],
                   dtype=self.dtype, name="conv_xy")(x)
        x = conv3d(self.dim_out, [kt, 1, 1], [st, 1, 1], [pt, 0, 0],
                   groups=self.dim_out, dtype=self.dtype, name="conv")(x)
        x = self.norm(name="bn")(x, train)
        return nn.relu(x)


_STEM_FUNCS = {"x3d_stem": X3DStem, "basic_stem": ResNetBasicStem}


class VideoModelStem(nn.Module):
    """Per-pathway stem dispatch (reference stem_helper.py:19-114)."""

    dim_out: Tuple[int, ...]
    kernel: Tuple[Tuple[int, int, int], ...]
    stride: Tuple[Tuple[int, int, int], ...]
    padding: Tuple[Tuple[int, int, int], ...]
    norm: Callable = VideoBatchNorm
    stem_func_name: str = "basic_stem"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: list, train: bool) -> list:
        assert len(x) == len(self.dim_out), (
            f"Input tensor does not contain {len(self.dim_out)} pathway"
        )
        stem_cls = _STEM_FUNCS[self.stem_func_name]
        return [
            stem_cls(
                dim_out=self.dim_out[p],
                kernel=tuple(self.kernel[p]),
                stride=tuple(self.stride[p]),
                padding=tuple(self.padding[p]),
                norm=self.norm,
                dtype=self.dtype,
                name=f"pathway{p}_stem",
            )(x[p], train)
            for p in range(len(x))
        ]


# ---------------------------------------------------------------------------
# Fuse (reference video_model_builder.py:92-149)
# ---------------------------------------------------------------------------


class FuseFastToSlow(nn.Module):
    """Fast->Slow lateral fusion: strided temporal conv on the fast pathway
    concatenated onto slow channels (reference video_model_builder.py:92-149).
    """

    dim_in: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Callable = VideoBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: list, train: bool) -> list:
        x_s, x_f = x
        fuse = conv3d(
            self.dim_in * self.fusion_conv_channel_ratio,
            [self.fusion_kernel, 1, 1],
            [self.alpha, 1, 1],
            [self.fusion_kernel // 2, 0, 0],
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        fuse = self.norm(name="bn")(fuse, train)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


# ---------------------------------------------------------------------------
# Heads (reference head_helper.py)
# ---------------------------------------------------------------------------


class ResNetBasicHead(nn.Module):
    """Pool -> concat pathways -> dropout -> FC; eval applies the act and
    averages any remaining positions (reference head_helper.py:8-95).
    NDHWC needs no permute before the projection."""

    num_classes: int
    pool_size: Tuple[Optional[Tuple[int, int, int]], ...]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    fc_init_std: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: list, train: bool) -> jax.Array:
        assert len(inputs) == len(self.pool_size), (
            f"Input tensor does not contain {len(self.pool_size)} pathway"
        )
        pooled = []
        for p, x in enumerate(inputs):
            if self.pool_size[p] is None:
                pooled.append(jnp.mean(x, axis=(1, 2, 3), keepdims=True))
            else:
                pooled.append(
                    nn.avg_pool(x, tuple(self.pool_size[p]),
                                strides=(1, 1, 1), padding="VALID")
                )
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(
                x, rng=self.make_rng("dropout")
            )
        x = nn.Dense(self.num_classes, kernel_init=fc_init(self.fc_init_std),
                     dtype=jnp.float32, name="projection")(x)
        if not train:
            if self.act_func == "softmax":
                x = jax.nn.softmax(x, axis=4)
            elif self.act_func == "sigmoid":
                x = jax.nn.sigmoid(x)
            else:
                raise NotImplementedError(
                    f"{self.act_func} is not supported as an activation function."
                )
            x = jnp.mean(x, axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


class X3DHead(nn.Module):
    """conv5 -> pool -> lin5 -> dropout -> FC (reference head_helper.py:98-235)."""

    dim_inner: int
    dim_out: int
    num_classes: int
    pool_size: Optional[Tuple[int, int, int]]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    fc_init_std: float = 0.01
    norm: Callable = VideoBatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: list, train: bool) -> jax.Array:
        assert len(inputs) == 1, "Input tensor does not contain 1 pathway"
        x = conv3d(self.dim_inner, [1, 1, 1], dtype=self.dtype,
                   name="conv_5")(inputs[0])
        x = self.norm(name="conv_5_bn")(x, train)
        x = nn.relu(x)
        if self.pool_size is None:
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        else:
            x = nn.avg_pool(x, tuple(self.pool_size), strides=(1, 1, 1),
                            padding="VALID")
        x = conv3d(self.dim_out, [1, 1, 1], dtype=self.dtype, name="lin_5")(x)
        if self.bn_lin5_on:
            x = self.norm(name="lin_5_bn")(x, train)
        x = nn.relu(x)
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(
                x, rng=self.make_rng("dropout")
            )
        x = nn.Dense(self.num_classes, kernel_init=fc_init(self.fc_init_std),
                     dtype=jnp.float32, name="projection")(x)
        if not train:
            if self.act_func == "softmax":
                x = jax.nn.softmax(x, axis=4)
            elif self.act_func == "sigmoid":
                x = jax.nn.sigmoid(x)
            else:
                raise NotImplementedError(
                    f"{self.act_func} is not supported as an activation function."
                )
            x = jnp.mean(x, axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


class ResNetRoIHead(nn.Module):
    """RoI-pooled detection head (AVA-style person-action detection).

    The reference's detection branch calls ``head_helper.ResNetRoIHead``
    (``video_model_builder.py:350,576``) but the fork never carries the
    class — its DETECTION.ENABLE path crashes.  This implements the
    upstream-PySlowFast capability the call intends: per pathway, average
    over time, ROIAlign each box to ``resolution`` at the feature stride
    (``1/scale_factor``, ``aligned`` half-pixel option), spatial max-pool,
    concat pathways, dropout, FC, activation (sigmoid for AVA multi-label —
    applied in train too, matching upstream's BCE-on-probabilities).
    """

    num_classes: int
    pool_size: Tuple[Tuple[int, int, int], ...]
    resolution: Tuple[Tuple[int, int], ...]
    scale_factor: Tuple[int, ...]
    dropout_rate: float = 0.0
    act_func: str = "sigmoid"
    aligned: bool = True
    fc_init_std: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: list, bboxes: jax.Array, train: bool) -> jax.Array:
        from procedurevrl_tpu.ops.roi_align import roi_align

        assert bboxes is not None, (
            "detection forward requires bboxes [N, 5] "
            "(batch_idx, x1, y1, x2, y2) in input-image coordinates"
        )
        assert len(inputs) == len(self.pool_size), (
            f"Input tensor does not contain {len(self.pool_size)} pathway"
        )
        pooled = []
        for p, x in enumerate(inputs):
            # temporal average over the pathway's full extent
            # (upstream uses AvgPool3d([T,1,1]))
            x = jnp.mean(x, axis=1)  # [B, H, W, C]
            r = roi_align(
                x, bboxes, self.resolution[p][0],
                spatial_scale=1.0 / self.scale_factor[p],
                aligned=self.aligned,
            )  # [N, res, res, C]
            pooled.append(jnp.max(r, axis=(1, 2)))  # [N, C]
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(
                x, rng=self.make_rng("dropout")
            )
        x = nn.Dense(self.num_classes, kernel_init=fc_init(self.fc_init_std),
                     dtype=jnp.float32, name="projection")(x)
        if self.act_func == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif self.act_func == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        else:
            raise NotImplementedError(
                f"{self.act_func} is not supported as an activation function."
            )
        return x


# ---------------------------------------------------------------------------
# Config plumbing
# ---------------------------------------------------------------------------


def _t(x):
    """Recursively convert lists to tuples (flax attrs must be hashable)."""
    if isinstance(x, (list, tuple)):
        return tuple(_t(e) for e in x)
    return x


@dataclasses.dataclass(frozen=True, eq=True)
class ResNetFamilyConfig:
    """Static architecture knobs extracted from the CfgNode (hashable so a
    module instance can carry it)."""

    arch: str = "slow"
    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    trans_func: str = "bottleneck_transform"
    stride_1x1: bool = False
    zero_init_final_bn: bool = False
    num_block_temp_kernel: Any = ((3,), (4,), (6,), (3,))
    spatial_strides: Any = ((1,), (2,), (2,), (2,))
    spatial_dilations: Any = ((1,), (1,), (1,), (1,))
    nonlocal_location: Any = (((),), ((),), ((),), ((),))
    nonlocal_group: Any = ((1,), (1,), (1,), (1,))
    nonlocal_pool: Any = (((1, 2, 2), (1, 2, 2)),) * 4
    nonlocal_instantiation: str = "dot_product"
    num_classes: int = 400
    dropout_rate: float = 0.5
    head_act: str = "softmax"
    fc_init_std: float = 0.01
    dropconnect_rate: float = 0.0
    num_frames: int = 8
    crop_size: int = 224
    short_cycle: bool = False
    # SlowFast
    alpha: int = 8
    beta_inv: int = 8
    fusion_conv_channel_ratio: int = 2
    fusion_kernel_sz: int = 5
    # X3D
    x3d_width_factor: float = 1.0
    x3d_depth_factor: float = 1.0
    x3d_bottleneck_factor: float = 1.0
    x3d_dim_c1: int = 12
    x3d_dim_c5: int = 2048
    x3d_scale_res2: bool = False
    x3d_bn_lin5: bool = False
    x3d_channelwise: bool = True
    # BN
    norm_type: str = "batchnorm"
    bn_num_splits: int = 1
    bn_num_groups: int = 1
    bn_frozen: bool = False
    task: str = "Classification"
    reverse_input_channel: bool = False
    # detection (reference DETECTION.* group)
    detection_enable: bool = False
    detection_aligned: bool = True
    roi_xform_resolution: int = 7
    spatial_scale_factor: int = 16

    @classmethod
    def from_cfg(cls, cfg) -> "ResNetFamilyConfig":
        world = max(1, cfg.NUM_GPUS * cfg.NUM_SHARDS)
        return cls(
            arch=cfg.MODEL.ARCH,
            depth=cfg.RESNET.DEPTH,
            num_groups=cfg.RESNET.NUM_GROUPS,
            width_per_group=cfg.RESNET.WIDTH_PER_GROUP,
            trans_func=cfg.RESNET.TRANS_FUNC,
            stride_1x1=cfg.RESNET.STRIDE_1X1,
            zero_init_final_bn=cfg.RESNET.ZERO_INIT_FINAL_BN,
            num_block_temp_kernel=_t(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL),
            spatial_strides=_t(cfg.RESNET.SPATIAL_STRIDES),
            spatial_dilations=_t(cfg.RESNET.SPATIAL_DILATIONS),
            nonlocal_location=_t(cfg.NONLOCAL.LOCATION),
            nonlocal_group=_t(cfg.NONLOCAL.GROUP),
            nonlocal_pool=_t(cfg.NONLOCAL.POOL),
            nonlocal_instantiation=cfg.NONLOCAL.INSTANTIATION,
            num_classes=cfg.MODEL.NUM_CLASSES,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            head_act=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dropconnect_rate=cfg.MODEL.DROPCONNECT_RATE,
            num_frames=cfg.DATA.NUM_FRAMES,
            crop_size=cfg.DATA.TRAIN_CROP_SIZE,
            short_cycle=cfg.MULTIGRID.SHORT_CYCLE,
            alpha=cfg.SLOWFAST.ALPHA,
            beta_inv=cfg.SLOWFAST.BETA_INV,
            fusion_conv_channel_ratio=cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
            fusion_kernel_sz=cfg.SLOWFAST.FUSION_KERNEL_SZ,
            x3d_width_factor=cfg.X3D.WIDTH_FACTOR,
            x3d_depth_factor=cfg.X3D.DEPTH_FACTOR,
            x3d_bottleneck_factor=cfg.X3D.BOTTLENECK_FACTOR,
            x3d_dim_c1=cfg.X3D.DIM_C1,
            x3d_dim_c5=cfg.X3D.DIM_C5,
            x3d_scale_res2=cfg.X3D.SCALE_RES2,
            x3d_bn_lin5=cfg.X3D.BN_LIN5,
            x3d_channelwise=cfg.X3D.CHANNELWISE_3x3x3,
            norm_type=cfg.BN.NORM_TYPE,
            bn_num_splits=cfg.BN.NUM_SPLITS,
            bn_num_groups=max(1, world // max(1, cfg.BN.NUM_SYNC_DEVICES)),
            bn_frozen=cfg.BN.FROZEN,
            task=cfg.TASK,
            reverse_input_channel=cfg.DATA.REVERSE_INPUT_CHANNEL,
            detection_enable=cfg.DETECTION.ENABLE,
            detection_aligned=cfg.DETECTION.ALIGNED,
            roi_xform_resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
            spatial_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
        )

    def norm_builder(self):
        return get_norm_builder(
            self.norm_type, self.bn_num_splits, self.bn_num_groups,
            self.bn_frozen,
        )


def _stage_args(rc: ResNetFamilyConfig, stage: int, norm, dtype, **over):
    """Shared ResStage kwargs for stage index 0..3 (res2..res5)."""
    base = dict(
        stride=_t(rc.spatial_strides[stage]),
        num_block_temp_kernel=_t(rc.num_block_temp_kernel[stage]),
        nonlocal_inds=_t(rc.nonlocal_location[stage]),
        nonlocal_group=_t(rc.nonlocal_group[stage]),
        nonlocal_pool=_t(rc.nonlocal_pool[stage]),
        instantiation=rc.nonlocal_instantiation,
        trans_func_name=rc.trans_func,
        stride_1x1=rc.stride_1x1,
        dilation=_t(rc.spatial_dilations[stage]),
        norm=norm,
        zero_init_final_bn=rc.zero_init_final_bn,
        dtype=dtype,
    )
    base.update(over)
    return base


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------


class SlowFastModel(nn.Module):
    """SlowFast network (reference video_model_builder.py:152-421).

    Takes a single [B, T, H, W, C] clip; the slow pathway is derived
    in-model (see :func:`pack_pathways`).  Exposes ``has_batch_stats`` so
    the engine threads the BN ``batch_stats`` collection.
    """

    rc: ResNetFamilyConfig
    dtype: Any = jnp.float32
    has_batch_stats: bool = True
    match_lang_emb: bool = False

    @nn.compact
    def __call__(self, x, label_emb=None, train: bool = False, text=None,
                 bboxes=None):
        rc = self.rc
        assert rc.arch == "slowfast" and rc.depth in _MODEL_STAGE_DEPTH
        norm = rc.norm_builder()
        pool_size = _POOL1[rc.arch]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[rc.depth]
        wpg = rc.width_per_group
        dim_inner = rc.num_groups * wpg
        out_dim_ratio = rc.beta_inv // rc.fusion_conv_channel_ratio
        tk = _TEMPORAL_KERNEL_BASIS[rc.arch]
        if not isinstance(x, (list, tuple)):
            x = pack_pathways(x, rc.arch, rc.alpha, rc.reverse_input_channel)

        fuse = partial(
            FuseFastToSlow,
            fusion_conv_channel_ratio=rc.fusion_conv_channel_ratio,
            fusion_kernel=rc.fusion_kernel_sz,
            alpha=rc.alpha,
            norm=norm,
            dtype=self.dtype,
        )
        x = VideoModelStem(
            dim_out=(wpg, wpg // rc.beta_inv),
            kernel=(tuple(tk[0][0]) + (7, 7), tuple(tk[0][1]) + (7, 7)),
            stride=((1, 2, 2),) * 2,
            padding=((tk[0][0][0] // 2, 3, 3), (tk[0][1][0] // 2, 3, 3)),
            norm=norm, dtype=self.dtype, name="s1",
        )(x, train)
        x = fuse(dim_in=wpg // rc.beta_inv, name="s1_fuse")(x, train)
        x = ResStage(
            dim_in=(wpg + wpg // out_dim_ratio, wpg // rc.beta_inv),
            dim_out=(wpg * 4, wpg * 4 // rc.beta_inv),
            dim_inner=(dim_inner, dim_inner // rc.beta_inv),
            temp_kernel_sizes=_t(tk[1]),
            num_blocks=(d2, d2),
            num_groups=(rc.num_groups,) * 2,
            name="s2",
            **_stage_args(rc, 0, norm, self.dtype),
        )(x, train)
        x = fuse(dim_in=wpg * 4 // rc.beta_inv, name="s2_fuse")(x, train)
        x = [max_pool3d(p, tuple(pool_size[i])) for i, p in enumerate(x)]
        x = ResStage(
            dim_in=(wpg * 4 + wpg * 4 // out_dim_ratio, wpg * 4 // rc.beta_inv),
            dim_out=(wpg * 8, wpg * 8 // rc.beta_inv),
            dim_inner=(dim_inner * 2, dim_inner * 2 // rc.beta_inv),
            temp_kernel_sizes=_t(tk[2]),
            num_blocks=(d3, d3),
            num_groups=(rc.num_groups,) * 2,
            name="s3",
            **_stage_args(rc, 1, norm, self.dtype),
        )(x, train)
        x = fuse(dim_in=wpg * 8 // rc.beta_inv, name="s3_fuse")(x, train)
        x = ResStage(
            dim_in=(wpg * 8 + wpg * 8 // out_dim_ratio, wpg * 8 // rc.beta_inv),
            dim_out=(wpg * 16, wpg * 16 // rc.beta_inv),
            dim_inner=(dim_inner * 4, dim_inner * 4 // rc.beta_inv),
            temp_kernel_sizes=_t(tk[3]),
            num_blocks=(d4, d4),
            num_groups=(rc.num_groups,) * 2,
            name="s4",
            **_stage_args(rc, 2, norm, self.dtype),
        )(x, train)
        x = fuse(dim_in=wpg * 16 // rc.beta_inv, name="s4_fuse")(x, train)
        x = ResStage(
            dim_in=(wpg * 16 + wpg * 16 // out_dim_ratio, wpg * 16 // rc.beta_inv),
            dim_out=(wpg * 32, wpg * 32 // rc.beta_inv),
            dim_inner=(dim_inner * 8, dim_inner * 8 // rc.beta_inv),
            temp_kernel_sizes=_t(tk[4]),
            num_blocks=(d5, d5),
            num_groups=(rc.num_groups,) * 2,
            name="s5",
            **_stage_args(rc, 3, norm, self.dtype),
        )(x, train)

        if rc.detection_enable:
            # RoI head (reference video_model_builder.py:349-371)
            return ResNetRoIHead(
                num_classes=rc.num_classes,
                pool_size=(
                    (rc.num_frames // rc.alpha // pool_size[0][0], 1, 1),
                    (rc.num_frames // pool_size[1][0], 1, 1),
                ),
                resolution=((rc.roi_xform_resolution,) * 2,) * 2,
                scale_factor=(rc.spatial_scale_factor,) * 2,
                dropout_rate=rc.dropout_rate,
                act_func=rc.head_act,
                aligned=rc.detection_aligned,
                fc_init_std=rc.fc_init_std,
                dtype=self.dtype,
                name="head",
            )(x, bboxes, train)
        if rc.short_cycle:
            head_pool = (None, None)
        else:
            head_pool = (
                (rc.num_frames // rc.alpha // pool_size[0][0],
                 rc.crop_size // 32 // pool_size[0][1],
                 rc.crop_size // 32 // pool_size[0][2]),
                (rc.num_frames // pool_size[1][0],
                 rc.crop_size // 32 // pool_size[1][1],
                 rc.crop_size // 32 // pool_size[1][2]),
            )
        return ResNetBasicHead(
            num_classes=rc.num_classes,
            pool_size=head_pool,
            dropout_rate=rc.dropout_rate,
            act_func=rc.head_act,
            fc_init_std=rc.fc_init_std,
            dtype=self.dtype,
            name=f"head{rc.task}",
        )(x, train)


class ResNetModel(nn.Module):
    """Single-pathway 3D ResNet: C2D / I3D / Slow
    (reference video_model_builder.py:424-620)."""

    rc: ResNetFamilyConfig
    dtype: Any = jnp.float32
    has_batch_stats: bool = True
    match_lang_emb: bool = False

    @nn.compact
    def __call__(self, x, label_emb=None, train: bool = False, text=None,
                 bboxes=None):
        rc = self.rc
        assert rc.arch in _POOL1 and rc.depth in _MODEL_STAGE_DEPTH
        norm = rc.norm_builder()
        pool_size = _POOL1[rc.arch]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[rc.depth]
        wpg = rc.width_per_group
        dim_inner = rc.num_groups * wpg
        tk = _TEMPORAL_KERNEL_BASIS[rc.arch]
        if not isinstance(x, (list, tuple)):
            x = pack_pathways(x, rc.arch, rc.alpha, rc.reverse_input_channel)

        x = VideoModelStem(
            dim_out=(wpg,),
            kernel=(tuple(tk[0][0]) + (7, 7),),
            stride=((1, 2, 2),),
            padding=((tk[0][0][0] // 2, 3, 3),),
            norm=norm, dtype=self.dtype, name="s1",
        )(x, train)
        dims = [(wpg, wpg * 4, dim_inner, d2, tk[1]),
                (wpg * 4, wpg * 8, dim_inner * 2, d3, tk[2]),
                (wpg * 8, wpg * 16, dim_inner * 4, d4, tk[3]),
                (wpg * 16, wpg * 32, dim_inner * 8, d5, tk[4])]
        for s, (din, dout, dinner, nblk, tks) in enumerate(dims):
            x = ResStage(
                dim_in=(din,), dim_out=(dout,), dim_inner=(dinner,),
                temp_kernel_sizes=_t(tks), num_blocks=(nblk,),
                num_groups=(rc.num_groups,),
                name=f"s{s + 2}",
                **_stage_args(rc, s, norm, self.dtype),
            )(x, train)
            if s == 0:
                x = [max_pool3d(p, tuple(pool_size[i])) for i, p in enumerate(x)]

        if rc.detection_enable:
            # RoI head (reference video_model_builder.py:575-585)
            return ResNetRoIHead(
                num_classes=rc.num_classes,
                pool_size=((rc.num_frames // pool_size[0][0], 1, 1),),
                resolution=((rc.roi_xform_resolution,) * 2,),
                scale_factor=(rc.spatial_scale_factor,),
                dropout_rate=rc.dropout_rate,
                act_func=rc.head_act,
                aligned=rc.detection_aligned,
                fc_init_std=rc.fc_init_std,
                dtype=self.dtype,
                name="head",
            )(x, bboxes, train)
        head_pool = (
            (None,)
            if rc.short_cycle
            else ((rc.num_frames // pool_size[0][0],
                   rc.crop_size // 32 // pool_size[0][1],
                   rc.crop_size // 32 // pool_size[0][2]),)
        )
        return ResNetBasicHead(
            num_classes=rc.num_classes,
            pool_size=head_pool,
            dropout_rate=rc.dropout_rate,
            act_func=rc.head_act,
            fc_init_std=rc.fc_init_std,
            dtype=self.dtype,
            name=f"head{rc.task}",
        )(x, train)


class X3DModel(nn.Module):
    """X3D network (reference video_model_builder.py:623-780)."""

    rc: ResNetFamilyConfig
    dtype: Any = jnp.float32
    has_batch_stats: bool = True
    match_lang_emb: bool = False

    def _dims(self):
        rc = self.rc
        exp_stage = 2.0
        dim_res2 = (
            round_width(rc.x3d_dim_c1, exp_stage, divisor=8)
            if rc.x3d_scale_res2 else rc.x3d_dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        return [
            (1, dim_res2, 2), (2, dim_res3, 2), (5, dim_res4, 2),
            (3, dim_res5, 2),
        ]

    @nn.compact
    def __call__(self, x, label_emb=None, train: bool = False, text=None):
        rc = self.rc
        assert rc.arch in _POOL1 and rc.depth in _MODEL_STAGE_DEPTH
        norm = rc.norm_builder()
        tk = _TEMPORAL_KERNEL_BASIS[rc.arch]
        w_mul, d_mul = rc.x3d_width_factor, rc.x3d_depth_factor
        dim_res1 = round_width(rc.x3d_dim_c1, w_mul)
        if not isinstance(x, (list, tuple)):
            x = pack_pathways(x, rc.arch, rc.alpha, rc.reverse_input_channel)

        x = VideoModelStem(
            dim_out=(dim_res1,),
            kernel=(tuple(tk[0][0]) + (3, 3),),
            stride=((1, 2, 2),),
            padding=((tk[0][0][0] // 2, 1, 1),),
            norm=norm, stem_func_name="x3d_stem", dtype=self.dtype, name="s1",
        )(x, train)

        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = rc.num_groups * rc.width_per_group
        for stage, block in enumerate(self._dims()):
            dim_out = round_width(block[1], w_mul)
            dim_inner = int(rc.x3d_bottleneck_factor * dim_out)
            n_rep = int(math.ceil(d_mul * block[0]))
            x = ResStage(
                dim_in=(dim_in,), dim_out=(dim_out,), dim_inner=(dim_inner,),
                temp_kernel_sizes=_t(tk[1]),
                num_blocks=(n_rep,),
                num_groups=(dim_inner,) if rc.x3d_channelwise else (rc.num_groups,),
                name=f"s{stage + 2}",
                **_stage_args(
                    rc, stage, norm, self.dtype,
                    stride=(block[2],),
                    num_block_temp_kernel=(n_rep,),
                    nonlocal_inds=_t(rc.nonlocal_location[0]),
                    nonlocal_group=_t(rc.nonlocal_group[0]),
                    nonlocal_pool=_t(rc.nonlocal_pool[0]),
                    drop_connect_rate=rc.dropconnect_rate
                    * (stage + 2) / (len(self._dims()) + 1),
                ),
            )(x, train)
            dim_in = dim_out

        spat_sz = int(math.ceil(rc.crop_size / 32.0))
        return X3DHead(
            dim_inner=dim_inner,
            dim_out=rc.x3d_dim_c5,
            num_classes=rc.num_classes,
            pool_size=(rc.num_frames, spat_sz, spat_sz),
            dropout_rate=rc.dropout_rate,
            act_func=rc.head_act,
            bn_lin5_on=rc.x3d_bn_lin5,
            fc_init_std=rc.fc_init_std,
            norm=norm,
            dtype=self.dtype,
            name="head",
        )(x, train)
