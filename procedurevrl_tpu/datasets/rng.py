"""Per-sample RNG policy shared by all datasets.

The reference draws fresh *global* randomness in every ``__getitem__``
(torch/numpy global state mutated by DataLoader workers; e.g. reference
``lib/datasets/howto100m.py:476-520``).  A threaded loader cannot use global
state race-free, so each sample gets its own ``np.random.RandomState``
seeded from stable inputs instead.  For that to reproduce the reference's
*statistics*, the seed must change across epochs and across EPOCH_MUL
repeats of the same clip within an epoch — otherwise augmentation and
ASR-window resampling silently collapse to one fixed draw per sample.

Policy:
- test mode: deterministic seed from the (raw, unfolded) index only, so
  multi-view ensembling is reproducible run-to-run;
- train/val: fold in the loader epoch (plumbed via ``set_epoch``) and the
  raw index (before any ``% len`` EPOCH_MUL fold).  Hosts never share
  streams because the per-host batch shards are disjoint in raw index —
  no pid/host salt is folded in, so a run is bit-reproducible and a
  2-process run sees the exact same per-sample draws as a 1-process run
  of the same global batch (the multi-process equivalence proof relies
  on this).

``stable_hash`` replaces Python's ``hash()`` for string-keyed seeds:
``hash`` is randomized per process (PYTHONHASHSEED), which would make
synthetic data differ between processes of one job and between reruns.
"""

from __future__ import annotations

import zlib

import numpy as np


def stable_hash(s: str) -> int:
    """Process-stable 31-bit hash of a string (crc32, not ``hash()``)."""
    return zlib.crc32(s.encode("utf-8")) & 0x7FFFFFFF


class EpochRNG:
    """Mixin: epoch-aware per-sample RandomState construction.

    Datasets inherit this; ``Loader.set_epoch`` plumbs the epoch down each
    time the training loop reshuffles (reference ``loader.py:142-160``).
    """

    _epoch: int = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def sample_rng(
        self, index: int, salt: int, deterministic: bool
    ) -> np.random.RandomState:
        """RandomState for one ``__getitem__`` call.

        Args:
            index: the RAW dataset index (before any EPOCH_MUL fold).
            salt: per-dataset odd multiplier (decorrelates datasets).
            deterministic: True for test mode (seed from index alone).
        """
        if deterministic:
            seed = (index * salt) % 2**31
        else:
            seed = (
                index * salt + (self._epoch + 1) * 1_000_000_007
            ) % 2**31
        return np.random.RandomState(seed)
