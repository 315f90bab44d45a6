"""Data loader: per-host sharding + threaded decode + device prefetch.

TPU-native replacement for ``torch.utils.data.DataLoader`` +
``DistributedSampler`` (reference ``lib/datasets/loader.py:75-160``,
``lib/datasets/utils.py:358-372``):

- each *host* (not device) owns ``1/num_hosts`` of every global batch,
  sliced from an epoch-seeded global permutation — identical sample-to-step
  assignment as DistributedSampler with ``drop_last`` semantics;
- a thread pool decodes samples concurrently (the decode work is
  subprocess/cv2/numpy — GIL-free); batches are assembled in order and
  pushed through a bounded prefetch queue so decode overlaps device compute
  (the double-buffering the reference gets from DataLoader workers +
  ``non_blocking`` copies);
- the final partial test batch is padded to the static batch shape and the
  number of valid rows is reported (XLA needs static shapes; the reference
  just ran a smaller last batch).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from procedurevrl_tpu.datasets.build import build_dataset
from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


def _collate(samples) -> Tuple[Dict[str, np.ndarray], np.ndarray, Dict]:
    """Stack (frames, label, index, meta) tuples into a batch dict."""
    frames = np.stack([s[0] for s in samples])
    labels0 = [s[1] for s in samples]
    idx = np.asarray([s[2] for s in samples], np.int64)
    batch = {"frames": frames, "index": idx}
    if isinstance(labels0[0], dict):
        batch["verb"] = np.asarray([l["verb"] for l in labels0], np.int64)
        batch["noun"] = np.asarray([l["noun"] for l in labels0], np.int64)
    else:
        batch["labels"] = np.asarray(labels0, np.int64)
    meta0 = samples[0][3]
    extra_meta = {}
    for k in meta0:
        vals = [s[3][k] for s in samples]
        arr = None
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            arr = np.stack([np.asarray(v) for v in vals])
        # only numeric arrays become device batch entries; strings and
        # ragged objects (e.g. EPIC narration ids) stay host-side metadata
        if arr is not None and np.issubdtype(arr.dtype, np.number):
            batch[k] = arr
        else:
            extra_meta[k] = vals
    return batch, idx, extra_meta


class Loader:
    """Iterable over host-local batches for one split."""

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        shuffle: bool,
        drop_last: bool,
        num_workers: int = 8,
        prefetch_depth: int = 2,
        num_hosts: int = 1,
        host_id: int = 0,
        seed: int = 0,
        repeated_aug: int = 0,
        short_cycle_sizes=None,
    ):
        """``short_cycle_sizes``: optional (b0, b1, b2) global batch sizes
        for multigrid short-cycle training (reference
        ``lib/datasets/multigrid_helper.py:11-79``): batches cycle through
        the three sizes and each sample carries its cycle index so the
        dataset can shrink the crop.  XLA compiles one program per cycle
        shape (3 static shapes).  Requires drop_last."""
        assert global_batch_size % num_hosts == 0
        if short_cycle_sizes is not None:
            assert drop_last and len(short_cycle_sizes) == 3
            assert all(s % num_hosts == 0 for s in short_cycle_sizes)
        self.short_cycle_sizes = short_cycle_sizes
        self.dataset = dataset
        self.global_batch = global_batch_size
        self.local_batch = global_batch_size // num_hosts
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch_depth = max(prefetch_depth, 1)
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.seed = seed
        self.repeated_aug = repeated_aug
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch and re-seed per-sample augmentation RNG
        (reference ``loader.py:142-160``)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _short_cycle_plan(self, n: int):
        """[(start, size, cycle_idx)] batch plan cycling through the three
        short-cycle sizes — the single source of truth for __len__ and
        __iter__ (reference multigrid_helper.py:41-79)."""
        plan, cursor, counter = [], 0, 0
        while cursor + self.short_cycle_sizes[counter % 3] <= n:
            size = self.short_cycle_sizes[counter % 3]
            plan.append((cursor, size, counter % 3))
            cursor += size
            counter += 1
        return plan

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.short_cycle_sizes is not None:
            return len(self._short_cycle_plan(n))
        if self.drop_last:
            return n // self.global_batch
        return (n + self.global_batch - 1) // self.global_batch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.repeated_aug > 1 and self.shuffle:
            # RASampler semantics (reference lib/datasets/samplers.py:8):
            # each sample appears `repeated_aug` times per epoch so different
            # hosts/augmentations see the same clips; epoch length preserved.
            order = np.repeat(order, self.repeated_aug)[:n]
        return order

    def __iter__(self) -> Iterator:
        order = self._epoch_indices()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        # (global batch size, short-cycle idx or None) per batch
        if self.short_cycle_sizes is not None:
            plan = self._short_cycle_plan(len(order))
            n_batches = len(plan)
        else:
            plan = [(b * self.global_batch, self.global_batch, None)
                    for b in range(n_batches)]

        def _put(q, item, stop_ev, timeout=0.25):
            """Bounded put that keeps checking the stop event: a consumer
            that abandons the generator mid-epoch (precise-BN, breaks,
            exceptions) sets ``stop`` and would otherwise leave the
            producer blocked in ``Queue.put`` forever, leaking the thread
            and its worker pool every time."""
            while not stop_ev.is_set():
                try:
                    q.put(item, timeout=timeout)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                pending = []
                for b in range(n_batches):
                    if stop.is_set():
                        break
                    start, size, cycle = plan[b]
                    gb = order[start : start + size]
                    local_size = size // self.num_hosts
                    # this host's contiguous shard of the global batch
                    local = gb[
                        self.host_id * local_size :
                        (self.host_id + 1) * local_size
                    ]
                    n_valid = len(local)
                    if n_valid < local_size:  # pad final partial batch
                        pad = np.resize(local, local_size - n_valid)
                        local = np.concatenate([local, pad])
                    futs = [
                        pool.submit(
                            self.dataset.__getitem__,
                            int(i) if cycle is None else (int(i), cycle),
                        )
                        for i in local
                    ]
                    pending.append((futs, n_valid))
                    # keep at most prefetch_depth batches in flight
                    while len(pending) > self.prefetch_depth or (
                        b == n_batches - 1 and pending
                    ):
                        futs0, nv0 = pending.pop(0)
                        try:
                            samples = [f.result() for f in futs0]
                            batch, idx, extra = _collate(samples)
                            if not _put(out_q, (batch, nv0, extra), stop):
                                return  # consumer gone: unblock and exit
                        except Exception as e:  # surface in consumer
                            _put(out_q, e, stop)
                            return
            _put(out_q, None, stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def construct_loader(cfg, split: str) -> Loader:
    """Build the loader for a split (reference ``loader.py:75-140``)."""
    import jax

    assert split in ("train", "val", "test")
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        # reference uses drop_last=False for val (lib/datasets/loader.py:118);
        # the final partial batch is padded and n_valid reported.
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False

    dataset = build_dataset(dataset_name, cfg, "val" if split == "val" else split)
    short_cycle_sizes = None
    if split == "train" and cfg.MULTIGRID.SHORT_CYCLE:
        # reference multigrid_helper.py:41-58: bigger batches at the two
        # smaller short-cycle crops
        # DEFAULT_S is snapshotted by MultigridSchedule.init_multigrid;
        # fall back to the current crop when a loader is built standalone
        default_s = cfg.MULTIGRID.DEFAULT_S or cfg.DATA.TRAIN_CROP_SIZE
        bs_factor = [
            int(round((float(cfg.DATA.TRAIN_CROP_SIZE)
                       / (s * default_s)) ** 2))
            for s in cfg.MULTIGRID.SHORT_CYCLE_FACTORS
        ]
        g = batch_size * jax.process_count()
        short_cycle_sizes = [g * bs_factor[0], g * bs_factor[1], g]
    # cfg batch sizes are per host (the reference's per-node BATCH_SIZE);
    # the global per-step batch spans all hosts.
    return Loader(
        dataset,
        global_batch_size=batch_size * jax.process_count(),
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        prefetch_depth=cfg.TPU.PREFETCH_DEPTH,
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
        seed=cfg.RNG_SEED,
        repeated_aug=3 if (split == "train" and cfg.DATA.USE_REPEATED_AUG) else 0,
        short_cycle_sizes=short_cycle_sizes,
    )


def shuffle_dataset(loader: Loader, cur_epoch: int):
    """reference ``loader.py:142-160``."""
    loader.set_epoch(cur_epoch)


def prefetch_to_device(loader: Loader, mesh, size: int = 2):
    """Iterate ``loader`` with batches already device_put one step ahead
    (jax transfers are async: issuing the next batch's transfer before the
    current step's results are consumed overlaps PCIe/tunnel time with
    compute — the reference's ``pin_memory`` + ``non_blocking`` copies)."""
    import collections

    from procedurevrl_tpu.parallel.mesh import shard_batch

    queue = collections.deque()
    it = iter(loader)

    def enqueue(n):
        for _ in range(n):
            try:
                batch, n_valid, extra = next(it)
            except StopIteration:
                return
            queue.append((shard_batch(mesh, batch), n_valid, extra, batch))

    try:
        enqueue(size)
        while queue:
            item = queue.popleft()
            enqueue(1)
            yield item
    finally:
        # propagate close()/GeneratorExit to the loader generator so its
        # producer thread is stopped promptly (not at GC time)
        close = getattr(it, "close", None)
        if close is not None:
            close()
