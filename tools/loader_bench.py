"""Host input-pipeline throughput over REAL encoded video.

Closes the BASELINE.md caveat that the "loader is not a bottleneck"
conclusion rested on the synthetic preproc stage alone: this writes real
mp4v videos at HowTo100M-like geometry (456x256 @ 30 fps) plus per-video
ASR CSVs, then measures the threaded ``Loader`` end to end in the
PRETRAINING configuration — ffmpeg/cv2 decode of M=9 ASR-chosen windows
per sample, scale jitter, crop, uint8 ship — i.e. the exact
``Howto100m.__getitem__`` the train tool drives (reference
``lib/datasets/howto100m.py:497-533``).

Prints steady-state samples/sec and clips/sec/host plus the single-core
``__getitem__`` latency.  Compare clips/sec against bench.py's device
rate (87.9 clips/sec/chip at round 4): the loader keeps one chip fed iff
clips/sec/host >= device rate x chips/host.

Env knobs: LB_VIDEOS (6), LB_DUR (60 s), LB_BATCH (16 samples/batch),
LB_BATCHES (8 timed), LB_WORKERS (cfg default).

Usage: python tools/loader_bench.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np

    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.datasets.build import build_dataset
    from procedurevrl_tpu.datasets.loader import Loader

    n_videos = int(os.environ.get("LB_VIDEOS", "6"))
    dur = int(os.environ.get("LB_DUR", "60"))
    batch = int(os.environ.get("LB_BATCH", "16"))
    n_batches = int(os.environ.get("LB_BATCHES", "8"))

    root = tempfile.mkdtemp(prefix="loader_bench_")
    asr_dir = os.path.join(root, "asr")
    os.makedirs(asr_dir, exist_ok=True)

    print(f"# writing {n_videos} x {dur}s real mp4v videos (456x256@30)...",
          file=sys.stderr, flush=True)
    fps, w, h = 30.0, 456, 256
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for i in range(n_videos):
        vw = cv2.VideoWriter(os.path.join(root, f"vid{i}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        assert vw.isOpened()
        # textured frames so the codec does real work (constant frames
        # would compress to nothing and overstate decode speed)
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        for t in range(int(fps * dur)):
            frame = np.roll(base, t * 3, axis=1)
            vw.write(frame)
        vw.release()
        # 4-second ASR windows spanning the video
        n_rows = dur // 4
        with open(os.path.join(asr_dir, f"vid{i}.csv"), "w") as f:
            f.write("start,end,text\n")
            for r in range(n_rows):
                f.write(f"{r * 4.0},{r * 4.0 + 4.0},"
                        f"narration for video {i} window {r} with words\n")
    print(f"# wrote videos in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    with open(os.path.join(root, "train.csv"), "w") as f:
        for i in range(n_videos):
            f.write(f"vid{i},0,{dur}\n")  # 3-column pretraining row

    cfg = get_cfg()
    cfg.merge_from_file("configs/HowTo100M/procedurevrl_adamw.yaml")
    cfg.DEV.LOAD_DUMMY_DATA = False
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.PATH_PREFIX = root
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.DATA.DECODING_BACKEND = "cv2"
    cfg.TRAIN.TEXT = asr_dir + "/"
    cfg.DEV.CLIP_VIS_FEAT_PATH = os.path.join(root, "feats") + "/"  # absent
    cfg.TRAIN.EPOCH_MUL = max(cfg.TRAIN.EPOCH_MUL, 64)  # enough samples
    if os.environ.get("LB_WORKERS"):
        cfg.DATA_LOADER.NUM_WORKERS = int(os.environ["LB_WORKERS"])

    # no BPE merges file ships in this image: stand in the hash tokenizer
    # (tokenization is microseconds against ~100 ms of decode per sample,
    # so the throughput number is unaffected)
    from procedurevrl_tpu.datasets import howto100m as h100m_mod

    real_build = h100m_mod.build_tokenizer
    h100m_mod.build_tokenizer = (
        lambda bpe_path="", allow_fallback=False:
        real_build(bpe_path, allow_fallback=True)
    )

    ds = build_dataset("howto100m_develop", cfg, "train")
    M = cfg.DEV.ORDER_PRETRAIN_MAX_LEN
    T = cfg.DATA.NUM_FRAMES

    # single-core latency
    t0 = time.perf_counter()
    n_single = 4
    for i in range(n_single):
        ds[i]
    per_sample = (time.perf_counter() - t0) / n_single
    print(f"# single-core __getitem__ ({M} windows x {T}f decode+preproc): "
          f"{per_sample * 1e3:.0f} ms/sample = {M / per_sample:.1f} "
          f"clips/sec/core", flush=True)

    loader = Loader(ds, global_batch_size=batch, shuffle=True,
                    drop_last=True,
                    num_workers=cfg.DATA_LOADER.NUM_WORKERS,
                    prefetch_depth=cfg.TPU.PREFETCH_DEPTH, seed=0)
    loader.set_epoch(0)
    it = iter(loader)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    done = 0
    for _ in range(n_batches):
        try:
            next(it)
            done += 1
        except StopIteration:
            break
    dt = time.perf_counter() - t0
    samples_s = done * batch / dt
    print(
        f"loader steady-state ({cfg.DATA_LOADER.NUM_WORKERS} workers): "
        f"{samples_s:.1f} samples/sec/host = {samples_s * M:.0f} "
        f"clips/sec/host  ({done} batches x {batch} in {dt:.1f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
