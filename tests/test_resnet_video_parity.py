"""ResNet/SlowFast/X3D family parity vs self-contained torch oracles
restating the reference math (reference
``lib/models/video_model_builder.py``, ``resnet_helper.py``,
``stem_helper.py``, ``head_helper.py``, ``nonlocal_helper.py``,
``operators.py``, ``batchnorm_helper.py``).

Direction of test: build the torch oracle with random weights AND random BN
running statistics, convert its ``state_dict`` through
``utils/converter.convert_resnet_video``, merge into the flax template, and
compare eval-mode forwards — this exercises the models, the converter, and
the BN eval path in one shot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from procedurevrl_tpu.models.resnet_video import (
    ResNetFamilyConfig, ResNetModel, SlowFastModel, VideoBatchNorm, X3DModel,
    pack_pathways, round_width,
)
from procedurevrl_tpu.utils.converter import (
    convert_resnet_video, merge_into_template,
)


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _to_torch(x_ndhwc: np.ndarray) -> torch.Tensor:
    return torch.tensor(x_ndhwc).permute(0, 4, 1, 2, 3).contiguous()


# ---------------------------------------------------------------------------
# torch oracles (channels-first), mirroring reference module wiring
# ---------------------------------------------------------------------------


class TSE(nn.Module):
    """reference operators.py:35-81"""

    def __init__(self, dim, ratio):
        super().__init__()
        dim_fc = round_width(dim, ratio)
        self.fc1 = nn.Conv3d(dim, dim_fc, 1, bias=True)
        self.fc2 = nn.Conv3d(dim_fc, dim, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3, 4), keepdim=True)
        s = torch.relu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class TBottleneck(nn.Module):
    """reference resnet_helper.py:263-396"""

    def __init__(self, din, dout, tk, stride, dinner, groups=1,
                 stride_1x1=False, dilation=1):
        super().__init__()
        s1, s3 = (stride, 1) if stride_1x1 else (1, stride)
        self.a = nn.Conv3d(din, dinner, [tk, 1, 1], [1, s1, s1],
                           [tk // 2, 0, 0], bias=False)
        self.a_bn = nn.BatchNorm3d(dinner)
        self.b = nn.Conv3d(dinner, dinner, [1, 3, 3], [1, s3, s3],
                           [0, dilation, dilation], groups=groups, bias=False,
                           dilation=[1, dilation, dilation])
        self.b_bn = nn.BatchNorm3d(dinner)
        self.c = nn.Conv3d(dinner, dout, 1, bias=False)
        self.c_bn = nn.BatchNorm3d(dout)

    def forward(self, x):
        x = torch.relu(self.a_bn(self.a(x)))
        x = torch.relu(self.b_bn(self.b(x)))
        return self.c_bn(self.c(x))


class TBasic(nn.Module):
    """reference resnet_helper.py:37-120"""

    def __init__(self, din, dout, tk, stride, dinner=None, groups=1,
                 stride_1x1=False, dilation=1):
        super().__init__()
        self.a = nn.Conv3d(din, dout, [tk, 3, 3], [1, stride, stride],
                           [tk // 2, 1, 1], bias=False)
        self.a_bn = nn.BatchNorm3d(dout)
        self.b = nn.Conv3d(dout, dout, [1, 3, 3], 1, [0, 1, 1], bias=False)
        self.b_bn = nn.BatchNorm3d(dout)

    def forward(self, x):
        x = torch.relu(self.a_bn(self.a(x)))
        return self.b_bn(self.b(x))


class TX3DTrans(nn.Module):
    """reference resnet_helper.py:123-261"""

    def __init__(self, din, dout, tk, stride, dinner, groups,
                 stride_1x1=False, dilation=1, se_ratio=0.0625, block_idx=0):
        super().__init__()
        s1, s3 = (stride, 1) if stride_1x1 else (1, stride)
        self.a = nn.Conv3d(din, dinner, 1, [1, s1, s1], 0, bias=False)
        self.a_bn = nn.BatchNorm3d(dinner)
        self.b = nn.Conv3d(dinner, dinner, [tk, 3, 3], [1, s3, s3],
                           [tk // 2, dilation, dilation], groups=groups,
                           bias=False, dilation=[1, dilation, dilation])
        self.b_bn = nn.BatchNorm3d(dinner)
        self.use_se = se_ratio > 0 and (block_idx + 1) % 2
        if self.use_se:
            self.se = TSE(dinner, se_ratio)
        self.c = nn.Conv3d(dinner, dout, 1, bias=False)
        self.c_bn = nn.BatchNorm3d(dout)

    def forward(self, x):
        x = torch.relu(self.a_bn(self.a(x)))
        x = self.b_bn(self.b(x))
        if self.use_se:
            x = self.se(x)
        x = x * torch.sigmoid(x)  # swish
        return self.c_bn(self.c(x))


class TResBlock(nn.Module):
    """reference resnet_helper.py:399-536"""

    def __init__(self, din, dout, tk, stride, trans_cls, dinner, groups=1,
                 stride_1x1=False, dilation=1, block_idx=0):
        super().__init__()
        if din != dout or stride != 1:
            self.branch1 = nn.Conv3d(din, dout, 1, [1, stride, stride], 0,
                                     bias=False)
            self.branch1_bn = nn.BatchNorm3d(dout)
        self.branch2 = trans_cls(din, dout, tk, stride, dinner, groups,
                                 stride_1x1=stride_1x1, dilation=dilation,
                                 **({"block_idx": block_idx}
                                    if trans_cls is TX3DTrans else {}))

    def forward(self, x):
        f = self.branch2(x)
        if hasattr(self, "branch1"):
            return torch.relu(self.branch1_bn(self.branch1(x)) + f)
        return torch.relu(x + f)


class TNonlocal(nn.Module):
    """reference nonlocal_helper.py:9-147"""

    def __init__(self, dim, dim_inner, pool_size=None, instantiation="softmax"):
        super().__init__()
        self.dim_inner = dim_inner
        self.instantiation = instantiation
        self.conv_theta = nn.Conv3d(dim, dim_inner, 1)
        self.conv_phi = nn.Conv3d(dim, dim_inner, 1)
        self.conv_g = nn.Conv3d(dim, dim_inner, 1)
        self.conv_out = nn.Conv3d(dim_inner, dim, 1)
        self.bn = nn.BatchNorm3d(dim)
        self.use_pool = pool_size is not None and any(s > 1 for s in pool_size)
        if self.use_pool:
            self.pool = nn.MaxPool3d(pool_size, stride=pool_size, padding=0)

    def forward(self, x):
        ident = x
        n, c, t, h, w = x.shape
        theta = self.conv_theta(x).view(n, self.dim_inner, -1)
        xp = self.pool(x) if self.use_pool else x
        phi = self.conv_phi(xp).view(n, self.dim_inner, -1)
        g = self.conv_g(xp).view(n, self.dim_inner, -1)
        attn = torch.einsum("nct,ncp->ntp", theta, phi)
        if self.instantiation == "softmax":
            attn = torch.softmax(attn * self.dim_inner ** -0.5, dim=2)
        else:
            attn = attn / attn.shape[2]
        out = torch.einsum("ntg,ncg->nct", attn, g).view(
            n, self.dim_inner, t, h, w)
        return ident + self.bn(self.conv_out(out))


class TStage(nn.Module):
    """reference resnet_helper.py:539-745"""

    def __init__(self, din, dout, stride, tks, nblocks, dinner, groups,
                 nbtk, nl_inds=None, nl_group=None, nl_pool=None,
                 instantiation="softmax", trans_cls=TBottleneck,
                 stride_1x1=False, dilation=None):
        super().__init__()
        self.np_ = len(nblocks)
        self.nblocks = nblocks
        self.nl_group = nl_group or [1] * self.np_
        nl_inds = nl_inds or [[] for _ in range(self.np_)]
        dilation = dilation or [1] * self.np_
        self.tks = [
            (list(tks[i]) * nblocks[i])[: nbtk[i]] + [1] * (nblocks[i] - nbtk[i])
            for i in range(len(tks))
        ]
        for p in range(self.np_):
            for i in range(nblocks[p]):
                blk = TResBlock(
                    din[p] if i == 0 else dout[p], dout[p], self.tks[p][i],
                    stride[p] if i == 0 else 1, trans_cls, dinner[p],
                    groups[p], stride_1x1=stride_1x1, dilation=dilation[p],
                    block_idx=i,
                )
                self.add_module(f"pathway{p}_res{i}", blk)
                if i in nl_inds[p]:
                    self.add_module(
                        f"pathway{p}_nonlocal{i}",
                        TNonlocal(dout[p], dout[p] // 2, nl_pool[p],
                                  instantiation),
                    )

    def forward(self, inputs):
        out = []
        for p in range(self.np_):
            x = inputs[p]
            for i in range(self.nblocks[p]):
                x = getattr(self, f"pathway{p}_res{i}")(x)
                if hasattr(self, f"pathway{p}_nonlocal{i}"):
                    nln = getattr(self, f"pathway{p}_nonlocal{i}")
                    g = self.nl_group[p]
                    if g > 1:
                        b, c, t, h, w = x.shape
                        x = x.permute(0, 2, 1, 3, 4).reshape(
                            b * g, t // g, c, h, w).permute(0, 2, 1, 3, 4)
                        x = nln(x)
                        x = x.permute(0, 2, 1, 3, 4).reshape(
                            b, t, c, h, w).permute(0, 2, 1, 3, 4)
                    else:
                        x = nln(x)
            out.append(x)
        return out


class TBasicStem(nn.Module):
    """reference stem_helper.py:117-193"""

    def __init__(self, din, dout, kernel, stride, padding):
        super().__init__()
        self.conv = nn.Conv3d(din, dout, kernel, stride, padding, bias=False)
        self.bn = nn.BatchNorm3d(dout)
        self.pool_layer = nn.MaxPool3d([1, 3, 3], [1, 2, 2], [0, 1, 1])

    def forward(self, x):
        return self.pool_layer(torch.relu(self.bn(self.conv(x))))


class TX3DStem(nn.Module):
    """reference stem_helper.py:196-279"""

    def __init__(self, din, dout, kernel, stride, padding):
        super().__init__()
        self.conv_xy = nn.Conv3d(din, dout, (1, kernel[1], kernel[2]),
                                 (1, stride[1], stride[2]),
                                 (0, padding[1], padding[2]), bias=False)
        self.conv = nn.Conv3d(dout, dout, (kernel[0], 1, 1), (stride[0], 1, 1),
                              (padding[0], 0, 0), bias=False, groups=dout)
        self.bn = nn.BatchNorm3d(dout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(self.conv_xy(x))))


class TVideoStem(nn.Module):
    """reference stem_helper.py:19-114"""

    def __init__(self, din, dout, kernel, stride, padding, stem_cls=TBasicStem):
        super().__init__()
        self.np_ = len(din)
        for p in range(self.np_):
            self.add_module(f"pathway{p}_stem",
                            stem_cls(din[p], dout[p], kernel[p], stride[p],
                                     padding[p]))

    def forward(self, x):
        return [getattr(self, f"pathway{p}_stem")(x[p])
                for p in range(self.np_)]


class TFuse(nn.Module):
    """reference video_model_builder.py:92-149"""

    def __init__(self, dim_in, ratio, kernel, alpha):
        super().__init__()
        self.conv_f2s = nn.Conv3d(dim_in, dim_in * ratio, [kernel, 1, 1],
                                  [alpha, 1, 1], [kernel // 2, 0, 0],
                                  bias=False)
        self.bn = nn.BatchNorm3d(dim_in * ratio)

    def forward(self, x):
        x_s, x_f = x
        fuse = torch.relu(self.bn(self.conv_f2s(x_f)))
        return [torch.cat([x_s, fuse], 1), x_f]


class TBasicHead(nn.Module):
    """reference head_helper.py:8-95"""

    def __init__(self, dim_in, num_classes, pool_size, act="softmax"):
        super().__init__()
        self.np_ = len(pool_size)
        for p in range(self.np_):
            pool = (nn.AdaptiveAvgPool3d(1) if pool_size[p] is None
                    else nn.AvgPool3d(pool_size[p], stride=1))
            self.add_module(f"pathway{p}_avgpool", pool)
        self.projection = nn.Linear(sum(dim_in), num_classes, bias=True)
        self.act = nn.Softmax(dim=4) if act == "softmax" else nn.Sigmoid()

    def forward(self, inputs):
        pooled = [getattr(self, f"pathway{p}_avgpool")(inputs[p])
                  for p in range(self.np_)]
        x = torch.cat(pooled, 1).permute(0, 2, 3, 4, 1)
        x = self.projection(x)
        if not self.training:
            x = self.act(x)
            x = x.mean([1, 2, 3])
        return x.view(x.shape[0], -1)


class TX3DHead(nn.Module):
    """reference head_helper.py:98-235"""

    def __init__(self, dim_in, dim_inner, dim_out, num_classes, pool_size,
                 bn_lin5=False):
        super().__init__()
        self.conv_5 = nn.Conv3d(dim_in, dim_inner, 1, bias=False)
        self.conv_5_bn = nn.BatchNorm3d(dim_inner)
        self.avg_pool = nn.AvgPool3d(pool_size, stride=1)
        self.lin_5 = nn.Conv3d(dim_inner, dim_out, 1, bias=False)
        self.bn_lin5 = bn_lin5
        if bn_lin5:
            self.lin_5_bn = nn.BatchNorm3d(dim_out)
        self.projection = nn.Linear(dim_out, num_classes, bias=True)
        self.act = nn.Softmax(dim=4)

    def forward(self, inputs):
        x = torch.relu(self.conv_5_bn(self.conv_5(inputs[0])))
        x = self.avg_pool(x)
        x = self.lin_5(x)
        if self.bn_lin5:
            x = self.lin_5_bn(x)
        x = torch.relu(x).permute(0, 2, 3, 4, 1)
        x = self.projection(x)
        if not self.training:
            x = self.act(x)
            x = x.mean([1, 2, 3])
        return x.view(x.shape[0], -1)


# ---------------------------------------------------------------------------
# full-net oracles (tiny dims)
# ---------------------------------------------------------------------------


class TResNetFull(nn.Module):
    """reference video_model_builder.py:424-620, arch='slow', depth=50."""

    def __init__(self, wpg, num_classes, num_frames, crop, nl_s3=False):
        super().__init__()
        d = (3, 4, 6, 3)
        tk = [[[1]], [[1]], [[1]], [[3]], [[3]]]
        self.s1 = TVideoStem([3], [wpg], [tk[0][0] + [7, 7]], [[1, 2, 2]],
                             [[tk[0][0][0] // 2, 3, 3]])
        dims = [(wpg, wpg * 4, wpg, d[0], tk[1]),
                (wpg * 4, wpg * 8, wpg * 2, d[1], tk[2]),
                (wpg * 8, wpg * 16, wpg * 4, d[2], tk[3]),
                (wpg * 16, wpg * 32, wpg * 8, d[3], tk[4])]
        strides = [1, 2, 2, 2]
        for s, (din, dout, dinner, nblk, tks) in enumerate(dims):
            nl = [[0]] if (nl_s3 and s == 1) else [[]]
            self.add_module(f"s{s + 2}", TStage(
                [din], [dout], [strides[s]], tks, [nblk], [dinner], [1],
                [nblk], nl_inds=nl, nl_pool=[[1, 2, 2]],
                instantiation="softmax",
            ))
        self.headClassification = TBasicHead(
            [wpg * 32], num_classes,
            [[num_frames // 1, crop // 32, crop // 32]])

    def forward(self, x):
        x = self.s1(x)
        x = self.s2(x)
        x = [torch.nn.functional.max_pool3d(p, [1, 1, 1]) for p in x]
        x = self.s3(x)
        x = self.s4(x)
        x = self.s5(x)
        return self.headClassification(x)


class TSlowFastFull(nn.Module):
    """reference video_model_builder.py:152-421, depth=50."""

    def __init__(self, wpg, num_classes, num_frames, crop, alpha, beta_inv,
                 fusion_ratio=2, fusion_k=5):
        super().__init__()
        d = (3, 4, 6, 3)
        tk = [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]]
        out_ratio = beta_inv // fusion_ratio
        bi = beta_inv
        self.s1 = TVideoStem(
            [3, 3], [wpg, wpg // bi],
            [tk[0][0] + [7, 7], tk[0][1] + [7, 7]], [[1, 2, 2]] * 2,
            [[tk[0][0][0] // 2, 3, 3], [tk[0][1][0] // 2, 3, 3]])
        self.s1_fuse = TFuse(wpg // bi, fusion_ratio, fusion_k, alpha)
        strides = [1, 2, 2, 2]
        mults = [(1, 4), (4, 8), (8, 16), (16, 32)]
        inner_mults = [1, 2, 4, 8]  # dim_inner * 2^s (reference :233,272,303,334)
        for s, (m_in, m_out) in enumerate(mults):
            din = [wpg * m_in + wpg * m_in // out_ratio, wpg * m_in // bi]
            inner = wpg * inner_mults[s]
            self.add_module(f"s{s + 2}", TStage(
                din, [wpg * m_out, wpg * m_out // bi], [strides[s]] * 2,
                tk[s + 1], [d[s]] * 2, [inner, inner // bi],
                [1, 1], [d[s]] * 2, nl_inds=[[], []],
                nl_pool=[[1, 2, 2]] * 2,
            ))
            if s < 3:
                self.add_module(f"s{s + 2}_fuse",
                                TFuse(wpg * m_out // bi, fusion_ratio,
                                      fusion_k, alpha))
        self.headClassification = TBasicHead(
            [wpg * 32, wpg * 32 // bi], num_classes,
            [[num_frames // alpha, crop // 32, crop // 32],
             [num_frames, crop // 32, crop // 32]])

    def forward(self, x):
        x = self.s1_fuse(self.s1(x))
        x = self.s2_fuse(self.s2(x))
        x = self.s3_fuse(self.s3(x))
        x = self.s4_fuse(self.s4(x))
        x = self.s5(x)
        return self.headClassification(x)


class TX3DFull(nn.Module):
    """reference video_model_builder.py:623-780."""

    def __init__(self, num_classes, num_frames, crop, dim_c1=12,
                 bottleneck=2.25, dim_c5=64):
        super().__init__()
        tkern = [[[5]], [[3]], [[3]], [[3]], [[3]]]
        # block_basis with SCALE_RES2 off, w_mul=d_mul=1
        # (reference video_model_builder.py:648-665)
        dims = [dim_c1]  # dim_res2 = c1; res3..res5 double (rounded)
        for _ in range(3):
            dims.append(round_width(dims[-1], 2.0, divisor=8))
        # stage outputs re-round with w_mul (1.0 still rounds: 12 -> 16;
        # reference video_model_builder.py:727-729)
        basis = [(1, round_width(dims[0], 1.0), 2),
                 (2, round_width(dims[1], 1.0), 2),
                 (5, round_width(dims[2], 1.0), 2),
                 (3, round_width(dims[3], 1.0), 2)]
        dim_res1 = round_width(dim_c1, 1.0)
        self.s1 = TVideoStem([3], [dim_res1], [tkern[0][0] + [3, 3]],
                             [[1, 2, 2]], [[tkern[0][0][0] // 2, 1, 1]],
                             stem_cls=TX3DStem)
        dim_in = dim_res1
        for stage, (nrep, dim_out, stride) in enumerate(basis):
            dinner = int(bottleneck * dim_out)
            self.add_module(f"s{stage + 2}", TStage(
                [dim_in], [dim_out], [stride], tkern[1], [nrep], [dinner],
                [dinner], [nrep], trans_cls=TX3DTrans,
            ))
            dim_in = dim_out
        spat = int(math.ceil(crop / 32.0))
        self.head = TX3DHead(dim_in, dinner, dim_c5, num_classes,
                             [num_frames, spat, spat])

    def forward(self, x):
        x = self.s1(x)
        for s in range(2, 6):
            x = getattr(self, f"s{s}")(x)
        return self.head(x)


# ---------------------------------------------------------------------------
# merge helpers
# ---------------------------------------------------------------------------


def _flax_from_oracle(model, oracle, x, train_kwargs=None):
    """init the flax model, merge converted oracle weights, return variables."""
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    cp, cs = convert_resnet_video(sd)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, miss_p, skip_p = merge_into_template(
        jax.device_get(variables["params"]), cp)
    stats, miss_s, skip_s = merge_into_template(
        jax.device_get(variables["batch_stats"]), cs)
    assert not miss_p, f"params missing from checkpoint: {miss_p[:8]}"
    assert not skip_p, f"params shape-skipped: {skip_p[:8]}"
    assert not miss_s, f"stats missing: {miss_s[:8]}"
    assert not skip_s, f"stats shape-skipped: {skip_s[:8]}"
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_video_batchnorm_matches_torch_train_and_eval():
    """VideoBatchNorm (splits=1) == torch BatchNorm3d: train-mode output,
    running-stat update (unbiased var), and eval-mode output."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2, 3, 3, 5).astype(np.float32)  # NDHWC
    tbn = nn.BatchNorm3d(5)
    _randomize_bn(tbn)
    bn = VideoBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    params = {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
    }
    stats = {
        "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
        "var": jnp.asarray(tbn.running_var.numpy().copy()),
    }
    out, mut = bn.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), True, mutable=["batch_stats"])
    tbn.train()
    out_t = tbn(_to_torch(x))
    np.testing.assert_allclose(
        np.asarray(out), out_t.detach().permute(0, 2, 3, 4, 1).numpy(),
        atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               tbn.running_var.numpy(), atol=2e-5, rtol=2e-5)
    tbn.eval()
    out_e = bn.apply({"params": params, "batch_stats": mut["batch_stats"]},
                     jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(out_e),
        tbn(_to_torch(x)).detach().permute(0, 2, 3, 4, 1).numpy(),
        atol=2e-5, rtol=2e-5)


def test_sub_batchnorm_split_stats_and_eval_aggregation():
    """splits=2: train stats computed per half-batch; eval uses the
    mean-of-means + between-split-variance aggregate
    (reference batchnorm_helper.py:68-108)."""
    rng = np.random.RandomState(1)
    x = rng.randn(4, 2, 2, 2, 3).astype(np.float32)
    bn = VideoBatchNorm(splits=2)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    out, mut = bn.apply(variables, jnp.asarray(x), True,
                        mutable=["batch_stats"])
    # oracle: normalize each half independently (affine is identity at init)
    halves = x.reshape(2, 2, 2, 2, 2, 3)
    expected = np.empty_like(halves)
    for s in range(2):
        m = halves[s].mean((0, 1, 2, 3))
        v = halves[s].var((0, 1, 2, 3))
        expected[s] = (halves[s] - m) / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(np.asarray(out), expected.reshape(x.shape),
                               atol=2e-5, rtol=2e-5)
    # eval aggregation equals SubBatchNorm3d._get_aggregated_mean_std
    stats = mut["batch_stats"]
    means, varies = np.asarray(stats["mean"]), np.asarray(stats["var"])
    agg_mean = means.mean(0)
    agg_var = varies.mean(0) + ((means - agg_mean) ** 2).mean(0)
    out_e = bn.apply({"params": variables["params"], "batch_stats": stats},
                     jnp.asarray(x), False)
    exp_e = (x - agg_mean) / np.sqrt(agg_var + 1e-5)
    np.testing.assert_allclose(np.asarray(out_e), exp_e, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("arch,nl", [("slow", False), ("slow", True)])
def test_resnet_full_eval_parity(arch, nl):
    torch.manual_seed(0)
    oracle = TResNetFull(wpg=4, num_classes=11, num_frames=4, crop=32,
                         nl_s3=nl)
    _randomize_bn(oracle)
    oracle.eval()
    rc = ResNetFamilyConfig(
        arch=arch, depth=50, width_per_group=4, num_frames=4, crop_size=32,
        num_classes=11, dropout_rate=0.0,
        nonlocal_location=(((),), ((0,),) if nl else ((),), ((),), ((),)),
        nonlocal_instantiation="softmax",
    )
    model = ResNetModel(rc=rc)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    variables = _flax_from_oracle(model, oracle, jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        out_t = oracle(pack_pathways_torch(x, "slow", 1))
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               atol=1e-4, rtol=1e-4)


def pack_pathways_torch(x_ndhwc, arch, alpha):
    frames = _to_torch(x_ndhwc)
    if arch != "slowfast":
        return [frames]
    t = frames.shape[2]
    idx = torch.linspace(0, t - 1, t // alpha).long()
    return [frames.index_select(2, idx), frames]


def test_slowfast_full_eval_parity():
    torch.manual_seed(1)
    wpg, alpha, bi = 8, 4, 8
    oracle = TSlowFastFull(wpg=wpg, num_classes=9, num_frames=8, crop=32,
                           alpha=alpha, beta_inv=bi)
    _randomize_bn(oracle)
    oracle.eval()
    rc = ResNetFamilyConfig(
        arch="slowfast", depth=50, width_per_group=wpg, num_frames=8,
        crop_size=32, num_classes=9, alpha=alpha, beta_inv=bi,
        dropout_rate=0.0,
        num_block_temp_kernel=((3, 3), (4, 4), (6, 6), (3, 3)),
        spatial_strides=((1, 1), (2, 2), (2, 2), (2, 2)),
        spatial_dilations=((1, 1), (1, 1), (1, 1), (1, 1)),
        nonlocal_location=(((), ()),) * 4,
        nonlocal_group=((1, 1),) * 4,
        nonlocal_pool=(((1, 2, 2), (1, 2, 2)),) * 4,
    )
    model = SlowFastModel(rc=rc)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 32, 32, 3).astype(np.float32)
    variables = _flax_from_oracle(model, oracle, jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        out_t = oracle(pack_pathways_torch(x, "slowfast", alpha))
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_x3d_full_eval_parity():
    torch.manual_seed(2)
    oracle = TX3DFull(num_classes=5, num_frames=4, crop=32, dim_c1=12,
                      bottleneck=2.25, dim_c5=64)
    _randomize_bn(oracle)
    oracle.eval()
    rc = ResNetFamilyConfig(
        arch="x3d", depth=50, num_frames=4, crop_size=32, num_classes=5,
        trans_func="x3d_transform", x3d_dim_c1=12, x3d_bottleneck_factor=2.25,
        x3d_dim_c5=64, dropout_rate=0.0,
    )
    model = X3DModel(rc=rc)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    variables = _flax_from_oracle(model, oracle, jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        out_t = oracle(pack_pathways_torch(x, "x3d", 1))
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_pack_pathways_linspace_semantics():
    """Slow-pathway frame selection reproduces torch.linspace().long()
    truncation (reference lib/datasets/utils.py:92-98)."""
    x = np.arange(32, dtype=np.float32).reshape(1, 32, 1, 1, 1)
    slow, fast = pack_pathways(jnp.asarray(x), "slowfast", 8)
    idx = torch.linspace(0, 31, 4).long().numpy()
    np.testing.assert_array_equal(np.asarray(slow)[0, :, 0, 0, 0], idx)
    assert fast.shape[1] == 32


def test_c2_name_conversion():
    from procedurevrl_tpu.utils.c2_model_loading import get_name_convert_func

    conv = get_name_convert_func()
    cases = {
        "res4_4_branch2c_bn_s": "s4.pathway0_res4.branch2.c_bn.weight",
        "res4_0_branch1_w": "s4.pathway0_res0.branch1.weight",
        "conv1_w": "s1.pathway0_stem.conv.weight",
        "res_conv1_bn_rm": "s1.pathway0_stem.bn.running_mean",
        "t_res5_2_branch2a_bn_riv":
            "s5.pathway1_res2.branch2.a_bn.running_var",
        "t_pool1_subsample_w": "s1_fuse.conv_f2s.weight",
        "nonlocal_conv3_1_theta_w": "s3.pathway0_nonlocal1.conv_theta.weight",
        "pred_b": "head.projection.bias",
        "conv_5_w": "head.conv_5.weight",
    }
    for c2, expect in cases.items():
        assert conv(c2) == expect, (c2, conv(c2), expect)


def test_precise_bn_recovery_and_average():
    """compute_precise_bn_stats: momentum inversion recovers exact batch
    stats, and the streaming average matches direct computation
    (reference lib/utils/bn_helper.py:10-76)."""
    from procedurevrl_tpu.utils.bn import compute_precise_bn_stats

    rng = np.random.RandomState(0)
    bn = VideoBatchNorm()
    x0 = rng.randn(4, 2, 2, 2, 3).astype(np.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x0), True)
    params, state0 = variables["params"], variables["batch_stats"]

    batches = [rng.randn(4, 2, 2, 2, 3).astype(np.float32) for _ in range(3)]

    def apply_stats(ms, batch):
        _, mut = bn.apply({"params": params, "batch_stats": ms},
                          jnp.asarray(batch), True, mutable=["batch_stats"])
        return mut["batch_stats"]

    precise = compute_precise_bn_stats(apply_stats, state0, iter(batches),
                                       num_batches=3)
    n = np.prod([4, 2, 2, 2])
    means = [b.mean((0, 1, 2, 3)) for b in batches]
    varies = [b.var((0, 1, 2, 3)) * n / (n - 1) for b in batches]
    exp_mean = np.mean(means, 0)
    exp_var = np.mean([v + m ** 2 for v, m in zip(varies, means)], 0) - exp_mean ** 2
    np.testing.assert_allclose(np.asarray(precise["mean"]), exp_mean,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(precise["var"]), exp_var,
                               atol=1e-5, rtol=1e-5)


def test_backbone_train_step_end_to_end():
    """The generic train step threads batch_stats for BN models: loss is
    finite, the step increments, and running stats actually change."""
    import optax

    from procedurevrl_tpu.engine.steps import TrainState, make_train_step
    from procedurevrl_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TRAIN.LABEL_EMB = ""
    cfg.RESNET.WIDTH_PER_GROUP = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    from procedurevrl_tpu.models.build import build_model

    model, _ = build_model(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx = optax.sgd(0.1)
    state = TrainState.create(variables["params"], tx,
                              variables["batch_stats"])
    step = make_train_step(model, tx, cfg, None, lambda s: 0.1)
    batch = {"frames": np.asarray(x), "labels": np.zeros((2,), np.int32)}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    old_mean = jax.tree_util.tree_leaves(state.model_state)[0]
    new_mean = jax.tree_util.tree_leaves(new_state.model_state)[0]
    assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))


def test_roi_align_exact_on_grid():
    """ROIAlign recovers exact feature values when the ROI aligns to the
    pixel grid and each bin contains one pixel (aligned=True samples the
    pixel centers)."""
    from procedurevrl_tpu.ops.roi_align import roi_align

    feats = jnp.asarray(
        np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1))
    # ROI covering pixels (1..2)x(1..2) of image 1: box in pixel coords
    # [x1,y1,x2,y2] = [1,1,3,3] -> 2x2 bins, centers at 1.5/2.5
    boxes = jnp.asarray([[1.0, 1.0, 1.0, 3.0, 3.0]])
    out = roi_align(feats, boxes, output_size=2, spatial_scale=1.0,
                    sampling_ratio=1, aligned=True)
    base = feats[1, :, :, 0]
    expected = np.array([[base[1, 1], base[1, 2]], [base[2, 1], base[2, 2]]])
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), expected,
                               atol=1e-6)


def test_roi_align_bilinear_midpoint():
    """A half-pixel-shifted 1x1 ROI averages the 4 neighbours."""
    from procedurevrl_tpu.ops.roi_align import roi_align

    feats = jnp.asarray(
        np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    boxes = jnp.asarray([[0.0, 1.5, 1.5, 2.5, 2.5]])
    out = roi_align(feats, boxes, output_size=1, spatial_scale=1.0,
                    sampling_ratio=1, aligned=True)
    # sample point at (y, x) = (1.5, 1.5): mean of f[1,1],f[1,2],f[2,1],f[2,2]
    expected = np.mean([5.0, 6.0, 9.0, 10.0])
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expected, atol=1e-6)


def test_slowfast_detection_head_forward():
    """DETECTION.ENABLE path: RoI head produces per-box probabilities
    (the reference's own detection branch references a head class that
    does not exist in its fork; this is the intended capability)."""
    rc = ResNetFamilyConfig(
        arch="slowfast", depth=50, width_per_group=8, num_frames=8,
        crop_size=64, num_classes=6, alpha=4, beta_inv=8,
        dropout_rate=0.0, head_act="sigmoid",
        num_block_temp_kernel=((3, 3), (4, 4), (6, 6), (3, 3)),
        spatial_strides=((1, 1), (2, 2), (2, 2), (2, 2)),
        spatial_dilations=((1, 1), (1, 1), (1, 1), (1, 1)),
        nonlocal_location=(((), ()),) * 4,
        nonlocal_group=((1, 1),) * 4,
        nonlocal_pool=(((1, 2, 2), (1, 2, 2)),) * 4,
        detection_enable=True, spatial_scale_factor=16,
        roi_xform_resolution=2,
    )
    model = SlowFastModel(rc=rc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 64, 64, 3), jnp.float32)
    bboxes = jnp.asarray([[0, 0, 0, 32, 32], [1, 16, 16, 63, 63],
                          [0, 8, 8, 40, 56]], jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False,
                   bboxes=bboxes)
    out = model.apply(v, x, train=False, bboxes=bboxes)
    assert out.shape == (3, 6)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_frozen_bn_uses_running_stats_in_train():
    """BN.FROZEN: train-mode forward normalizes with running stats and does
    not update them (reference misc.frozen_bn_stats, lib/utils/misc.py:243)."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2, 2, 2, 3).astype(np.float32)
    bn = VideoBatchNorm(frozen=True)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    stats = {"mean": jnp.asarray([0.5, -0.5, 0.0]),
             "var": jnp.asarray([2.0, 1.0, 0.5])}
    out, mut = bn.apply({"params": variables["params"], "batch_stats": stats},
                        jnp.asarray(x), True, mutable=["batch_stats"])
    expected = (x - np.array([0.5, -0.5, 0.0])) / np.sqrt(
        np.array([2.0, 1.0, 0.5]) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               np.asarray(stats["mean"]))


def test_aggregate_sub_bn_stats_export():
    from procedurevrl_tpu.utils.bn import aggregate_sub_bn_stats

    state = {"s1": {"bn": {"mean": np.array([[0.0, 2.0], [2.0, 4.0]]),
                           "var": np.array([[1.0, 1.0], [1.0, 1.0]])}},
             "s2": {"bn": {"mean": np.array([1.0, 1.0]),
                           "var": np.array([2.0, 2.0])}}}
    agg, n = aggregate_sub_bn_stats(state)
    assert n == 1
    np.testing.assert_allclose(agg["s1"]["bn"]["mean"], [1.0, 3.0])
    # var = mean(vars) + between-split variance = 1 + 1
    np.testing.assert_allclose(agg["s1"]["bn"]["var"], [2.0, 2.0])
    np.testing.assert_allclose(agg["s2"]["bn"]["mean"], [1.0, 1.0])


def test_bn_stats_sharded_equals_single_device():
    """SyncBN-for-free under pjit: BatchNorm statistics computed with the
    batch sharded over all 8 devices equal the unsharded computation (the
    cross-chip reduction is the all-reduce XLA inserts; reference
    NaiveSyncBatchNorm3d, batchnorm_helper.py:173-217)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from procedurevrl_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    rng = np.random.RandomState(0)
    x = rng.randn(16, 2, 4, 4, 3).astype(np.float32)
    bn = VideoBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    def run(xs):
        out, mut = bn.apply(variables, xs, True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    sharded = jax.jit(run, in_shardings=NamedSharding(mesh, P("data")))
    with mesh:
        out_s, stats_s = sharded(jnp.asarray(x))
    out_1, stats_1 = jax.jit(run)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats_s["mean"]),
                               np.asarray(stats_1["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats_s["var"]),
                               np.asarray(stats_1["var"]), atol=1e-6)
