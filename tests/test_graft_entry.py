"""Driver-entry coverage.

``__graft_entry__.dryrun_multichip`` defaults to the core TimeSformer
DP/ZeRO-1/TP equivalence proof (sized for the driver's single-core
budget); the MViT and BN-backbone sharding-equivalence variants are
gated behind ``DRYRUN_FULL=1`` and exercised here every round instead.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_extras_mvit_and_bn_variants():
    """MViT DP with interpret-mode partition-aware pooled-attention
    kernels, and SlowFast DP + ZeRO-1 with batch_stats, each matching a
    1-device run of the same global batch (asserts inside)."""
    import __graft_entry__ as ge

    ge.dryrun_extras(8)
