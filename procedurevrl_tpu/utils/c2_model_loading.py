"""Caffe2 -> framework checkpoint name conversion
(reference ``lib/utils/c2_model_loading.py:8-119``).

Old PySlowFast model-zoo checkpoints are Caffe2 pickles whose blob names
encode the layer structure (``res4_0_branch2c_bn_s``,
``nonlocal_conv3_1_theta_w``, ``t_res5_2_...`` for the fast pathway).  The
reference converts those names to its PyTorch module paths; our flax module
tree uses the same path segments by construction
(``models/resnet_video.py``), so the same name grammar lands directly on
our tree — only the trailing tensor-kind suffix differs:

=============  ====================  =========================
Caffe2 suffix  reference (PyTorch)   here (flax)
=============  ====================  =========================
``_w``         ``.weight``           ``kernel`` (params)
``_b``         ``.bias``             ``bias`` (params)
``_bn_s``      ``bn.weight``         ``scale`` (params)
``_bn_b``      ``bn.bias``           ``bias`` (params)
``_bn_rm``     ``.running_mean``     ``mean`` (batch_stats)
``_bn_riv``    ``.running_var``      ``var`` (batch_stats)
=============  ====================  =========================

``convert_c2_state_dict`` produces a *PyTorch-style* flat dict (same names
the reference's loader would produce), which then feeds the normal
torch->flax converter (``utils/converter.py:convert_resnet_video``).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

# (source, dest) regex pairs, applied in order
# (reference lib/utils/c2_model_loading.py:15-104)
_PAIRS = [
    # nonlocal blocks: 'nonlocal_conv3_1_theta_w' -> 's3.pathway0_nonlocal1_theta_w'
    [r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"],
    [r"^(.*)_nonlocal([0-9]+)_(theta)(.*)", r"\1_nonlocal\2.conv_\3\4"],
    [r"^(.*)_nonlocal([0-9]+)_(g)(.*)", r"\1_nonlocal\2.conv_\3\4"],
    [r"^(.*)_nonlocal([0-9]+)_(phi)(.*)", r"\1_nonlocal\2.conv_\3\4"],
    [r"^(.*)_nonlocal([0-9]+)_(out)(.*)", r"\1_nonlocal\2.conv_\3\4"],
    [r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"],
    # SlowFast lateral fusions
    [r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"],
    [r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"],
    [r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)",
     r"s\1_fuse.bn.\3"],
    [r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)",
     r"s\1_fuse.conv_f2s.\3"],
    # slow-pathway residual blocks + stem
    [r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway0_res\2.branch\3.\4_\5"],
    [r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"],
    [r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"],
    [r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"],
    [r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway0_res\2.branch\3_\4"],
    [r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"],
    # fast ('t_'-prefixed) pathway
    [r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway1_res\2.branch\3.\4_\5"],
    [r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"],
    [r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"],
    [r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway1_res\2.branch\3_\4"],
    [r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"],
    # heads
    [r"pred_(.*)", r"head.projection.\1"],
    [r"(.*)b_bn_fc(.*)", r"\1se.fc\2"],
    [r"conv_5(.*)", r"head.conv_5\1"],
    [r"lin_5(.*)", r"head.lin_5\1"],
    # tensor-kind suffixes
    [r"(.*)bn.b\Z", r"\1bn.bias"],
    [r"(.*)bn.s\Z", r"\1bn.weight"],
    [r"(.*)bn.rm\Z", r"\1bn.running_mean"],
    [r"(.*)bn.riv\Z", r"\1bn.running_var"],
    [r"(.*)[\._]b\Z", r"\1.bias"],
    [r"(.*)[\._]w\Z", r"\1.weight"],
]


def get_name_convert_func():
    """Caffe2 blob name -> PyTorch-style module path
    (reference ``lib/utils/c2_model_loading.py:106-119``)."""

    def convert(name: str) -> str:
        for source, dest in _PAIRS:
            name = re.sub(source, dest, name)
        return name

    return convert


def convert_c2_state_dict(blobs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename a Caffe2 blob dict into PyTorch state-dict names, dropping
    optimizer-side blobs (``_momentum``, ``lr``, ``model_iter`` ...)."""
    convert = get_name_convert_func()
    out = {}
    for k, v in blobs.items():
        if k.endswith("_momentum") or k in ("lr", "model_iter"):
            continue
        out[convert(k)] = np.asarray(v)
    return out
