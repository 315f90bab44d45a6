"""End-to-end smoke coverage for the CLI tools that previously had none:
``tools/test_net.py`` (multi-view zero-shot test), ``tools/feat_extract.py``
(per-view prediction dump), ``tools/benchmark.py`` (data-loading
throughput), ``tools/emb_extract.py`` (CLIP text bank extraction),
``tools/video_download.py`` (yt-dlp command composition), and
``tools/visualization.py`` (saved-predictions visualization path).

Reference counterparts: ``tools/test_net.py:31-220``,
``tools/feat_extract.py:50-60``, ``lib/utils/benchmark.py:20-103``,
``tools/emb_extract.py:9-60``, ``tools/video_download.py:17-28``,
``tools/visualization.py``.  All run at tiny geometry on the CPU mesh with
synthetic data (DEV.LOAD_DUMMY_DATA).
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procedurevrl_tpu.config import get_cfg

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _tiny_test_cfg(tmp_path, views=2):
    """Tiny zero-shot COIN step-classification config (the reference's
    ``TRAIN.ENABLE False DEV.MATCH_LANG_EMB True`` CLI invocation)."""
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, "COIN", "step_classification.yaml"))
    cfg.DEV.LOAD_DUMMY_DATA = True
    cfg.DEV.MATCH_LANG_EMB = True  # zero-shot: bank matching, no CE head
    cfg.TRAIN.ENABLE = False
    cfg.TEST.BATCH_SIZE = 16
    cfg.TEST.NUM_ENSEMBLE_VIEWS = views
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.TIMESFORMER.DEPTH = 1
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.PATH_TO_DATA_DIR = "/nonexistent"  # force synthetic index
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOG_PERIOD = 4
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def test_test_net_multiview_end_to_end(tmp_path):
    """tools/test_net.test(): multi-view ensembling + both dump formats
    (reference ``tools/test_net.py:127-146``)."""
    from tools.test_net import test

    cfg = _tiny_test_cfg(tmp_path)
    cfg.TEST.SAVE_RESULTS_PATH = "preds.pkl"
    cfg.TEST.SAVE_PREDICT_PATH = "vis_pred_zeroshot_step_cls.pth"
    stats = test(cfg)

    # 64 synthetic videos x 2 views ensembled down to 64 score rows
    assert "top1_acc" in stats and "top5_acc" in stats
    with open(os.path.join(str(tmp_path), "preds.pkl"), "rb") as f:
        blob = pickle.load(f)
    assert blob["preds"].shape == (64, cfg.MODEL.NUM_CLASSES)
    assert blob["labels"].shape == (64,)

    import torch

    pth = torch.load(
        os.path.join(str(tmp_path), "vis_pred_zeroshot_step_cls.pth"),
        weights_only=False,
    )
    assert tuple(pth["preds"].shape) == (64, cfg.MODEL.NUM_CLASSES)
    np.testing.assert_allclose(
        pth["preds"].numpy(), blob["preds"], rtol=0, atol=0
    )


def test_feat_extract_accumulates_per_view(tmp_path):
    """tools/feat_extract.extract(): raw per-view predictions, NO per-video
    ensembling (reference ``tools/feat_extract.py:50-60``)."""
    from tools.feat_extract import extract

    cfg = _tiny_test_cfg(tmp_path)
    cfg.TEST.SAVE_PREDICT_PATH = "features.pkl"
    extract(cfg)

    with open(os.path.join(str(tmp_path), "features.pkl"), "rb") as f:
        blob = pickle.load(f)
    # 64 videos x 2 views: per-view rows survive (no ensembling)
    assert blob["preds"].shape == (128, cfg.MODEL.NUM_CLASSES)
    assert blob["labels"].shape == (128,)
    assert blob["index"].shape == (128,)
    # index is the flat per-clip dataset index: every clip exactly once,
    # and collapsing views (idx // num_clips, the TestMeter mapping) gives
    # each of the 64 videos exactly `views` rows
    assert np.array_equal(np.sort(blob["index"]), np.arange(128))
    _, counts = np.unique(blob["index"] // 2, return_counts=True)
    assert (counts == 2).all()


def test_benchmark_data_loading(tmp_path):
    """tools/benchmark.py: host-pipeline throughput loop
    (reference ``lib/utils/benchmark.py:20-103``)."""
    from tools.benchmark import benchmark_data_loading

    cfg = _tiny_test_cfg(tmp_path)
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.BENCHMARK.NUM_EPOCHS = 1
    cfg.BENCHMARK.LOG_PERIOD = 2
    clips_per_sec = benchmark_data_loading(cfg)
    assert clips_per_sec > 0


def _tiny_clip_state_dict():
    """Synthesize a minimal OpenAI-CLIP-format text tower state_dict
    (1 layer, width 64 so ``heads = width // 64 >= 1``, embed_dim 8)."""
    import torch

    g = torch.Generator().manual_seed(0)
    w, e, vocab = 64, 8, 49408

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "token_embedding.weight": r(vocab, w),
        "positional_embedding": r(77, w),
        "text_projection": r(w, e),
        "ln_final.weight": torch.ones(w),
        "ln_final.bias": torch.zeros(w),
        # a visual.* key that load_clip_text_tower must filter out
        "visual.conv1.weight": r(4, 3, 2, 2),
    }
    p = "transformer.resblocks.0."
    sd.update({
        p + "ln_1.weight": torch.ones(w), p + "ln_1.bias": torch.zeros(w),
        p + "ln_2.weight": torch.ones(w), p + "ln_2.bias": torch.zeros(w),
        p + "attn.in_proj_weight": r(3 * w, w),
        p + "attn.in_proj_bias": torch.zeros(3 * w),
        p + "attn.out_proj.weight": r(w, w),
        p + "attn.out_proj.bias": torch.zeros(w),
        p + "mlp.c_fc.weight": r(4 * w, w),
        p + "mlp.c_fc.bias": torch.zeros(4 * w),
        p + "mlp.c_proj.weight": r(w, 4 * w),
        p + "mlp.c_proj.bias": torch.zeros(w),
    })
    return sd


def test_emb_extract_bank(tmp_path, monkeypatch):
    """tools/emb_extract.get_step_emb(): 28 prompt templates, mean-pooled,
    saved as .npy + .pth (reference ``tools/emb_extract.py:9-60``)."""
    import torch

    from procedurevrl_tpu.datasets import tokenizer as tok_mod
    from tools.emb_extract import PROMPTS, get_step_emb

    assert len(PROMPTS) == 28
    ckpt = str(tmp_path / "clip_tiny.pth")
    torch.save(_tiny_clip_state_dict(), ckpt)
    # the real BPE vocab is not in this image: substitute the deterministic
    # hash tokenizer (ids < SOT, valid rows of the 49408-entry embedding)
    monkeypatch.setattr(
        tok_mod, "build_tokenizer", lambda path="": tok_mod.HashTokenizer()
    )

    out = str(tmp_path / "bank.pth")
    bank = get_step_emb(["pour water into pot", "whisk the eggs"], out, ckpt)
    assert bank.shape == (2, 8)
    assert np.isfinite(bank).all() and np.abs(bank).sum() > 0

    npy = np.load(str(tmp_path / "bank.npy"))
    np.testing.assert_array_equal(npy, bank)
    pth = torch.load(out, weights_only=False)
    np.testing.assert_array_equal(pth.numpy(), bank)

    # mean-pooling check: a single-prompt encode differs from the pooled row
    single = get_step_emb(["pour water into pot"], str(tmp_path / "b2.pth"), ckpt)
    assert single.shape == (1, 8)


def test_video_download_command_composition(tmp_path, monkeypatch):
    """tools/video_download.py: one yt-dlp invocation per COIN video, with
    the explicit video_url when present and the YouTube-id fallback
    otherwise (reference ``tools/video_download.py:17-28``)."""
    import subprocess

    import tools.video_download as vd

    ann = tmp_path / "COIN.json"
    ann.write_text(json.dumps({
        "database": {
            "abc123": {"video_url": "https://example.com/v/abc123.mp4"},
            "def456": {},
        }
    }))
    calls = []
    monkeypatch.setattr(
        subprocess, "run", lambda cmd, **kw: calls.append(cmd) or None
    )
    monkeypatch.setattr(sys, "argv", [
        "video_download.py", "--annotations", str(ann),
        "--out_dir", str(tmp_path / "videos"),
    ])
    vd.main()

    assert len(calls) == 2
    assert all(c[0] == "yt-dlp" for c in calls)
    urls = sorted(c[-1] for c in calls)
    assert urls == [
        "https://example.com/v/abc123.mp4",
        "https://www.youtube.com/watch?v=def456",
    ]
    assert os.path.isdir(str(tmp_path / "videos"))


def test_visualization_tool_predictions_path(tmp_path):
    """tools/visualization.run_visualization(): confusion matrix + per-class
    histograms from a saved predictions pickle."""
    from tools.visualization import run_visualization

    rng = np.random.RandomState(0)
    preds = rng.rand(40, 7).astype(np.float32)
    labels = rng.randint(0, 7, (40,)).astype(np.int64)
    pkl = tmp_path / "preds.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"preds": preds, "labels": labels}, f)

    cfg = _tiny_test_cfg(tmp_path)
    cfg.TENSORBOARD.ENABLE = True
    cfg.TENSORBOARD.PREDICTIONS_PATH = str(pkl)
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True
    cfg.TENSORBOARD.HISTOGRAM.ENABLE = True
    cfg.TENSORBOARD.HISTOGRAM.TOPK = 3
    run_visualization(cfg)

    log_dir = os.path.join(
        str(tmp_path), cfg.TENSORBOARD.LOG_DIR or f"runs-{cfg.TRAIN.DATASET}"
    )
    events = [f for f in os.listdir(log_dir) if "tfevents" in f]
    assert events, f"no tensorboard event files under {log_dir}"
