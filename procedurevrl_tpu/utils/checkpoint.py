"""Checkpointing (reference ``lib/utils/checkpoint.py``).

Native checkpoints are orbax-style msgpack trees written by the master host
under ``OUTPUT_DIR/checkpoints/checkpoint_epoch_{:05d}`` with the same
directory contract as the reference (periodic by ``TRAIN.CHECKPOINT_PERIOD``
+ always at the last epoch; AUTO_RESUME picks the newest).  Contents mirror
the reference's ``{"epoch", "model_state", "optimizer_state", "cfg"}``
(reference ``lib/utils/checkpoint.py:126-131``).

PyTorch ``.pyth`` checkpoints from the reference model zoo load through
``load_reference_checkpoint`` + the converters in ``utils/converter.py``
(DDP prefix stripping per reference ``:224-227``; shape-filtered partial
load with skipped-key logging per ``:369-390``).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

from procedurevrl_tpu.utils import logging as logging_util

logger = logging_util.get_logger(__name__)


def make_checkpoint_dir(path_to_job: str) -> str:
    d = os.path.join(path_to_job, "checkpoints")
    if jax.process_index() == 0:
        os.makedirs(d, exist_ok=True)
    return d


def get_checkpoint_dir(path_to_job: str) -> str:
    return os.path.join(path_to_job, "checkpoints")


def get_path_to_checkpoint(path_to_job: str, epoch: int) -> str:
    name = "checkpoint_epoch_{:05d}.pyth".format(epoch)
    return os.path.join(get_checkpoint_dir(path_to_job), name)


def get_last_checkpoint(path_to_job: str) -> Optional[str]:
    d = get_checkpoint_dir(path_to_job)
    # only completed saves: a crash mid-save leaves a .pyth.tmp that would
    # sort after the real checkpoint and break AUTO_RESUME on unpickle
    names = (
        [f for f in os.listdir(d) if "checkpoint" in f and f.endswith(".pyth")]
        if os.path.isdir(d)
        else []
    )
    if not names:
        return None
    return os.path.join(d, sorted(names)[-1])


def has_checkpoint(path_to_job: str) -> bool:
    return get_last_checkpoint(path_to_job) is not None


def is_checkpoint_epoch(cfg, cur_epoch: int) -> bool:
    """reference ``lib/utils/checkpoint.py:84-104`` (no multigrid schedule)."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0


def _write_payload(path: str, host_state, cfg, epoch: int) -> str:
    payload = {
        "epoch": epoch,
        "model_state": serialization.to_bytes(host_state.params),
        "optimizer_state": serialization.to_bytes(host_state.opt_state),
        "step": int(host_state.step),
        "cfg": cfg.dump() if hasattr(cfg, "dump") else str(cfg),
    }
    if getattr(host_state, "model_state", None) is not None:
        # BatchNorm running statistics (ResNet/SlowFast/X3D family)
        payload["batch_stats"] = serialization.to_bytes(host_state.model_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    logger.info("Saved checkpoint to %s", path)
    return path


def save_checkpoint(path_to_job: str, state, cfg, epoch: int) -> Optional[str]:
    """Master-host-only synchronous save of the TrainState + config."""
    if jax.process_index() != 0:
        return None
    make_checkpoint_dir(path_to_job)
    path = get_path_to_checkpoint(path_to_job, epoch + 1)
    return _write_payload(path, jax.device_get(state), cfg, epoch)


class AsyncCheckpointer:
    """Non-blocking checkpoint writer (reference saves synchronously,
    ``lib/utils/checkpoint.py:107-136``; a blocking device fetch of the full
    params + optimizer state stalls training ~95 s through the device
    tunnel).

    ``save`` takes a *device-side snapshot* of the state (a jitted identity
    — an HBM-to-HBM copy, milliseconds) and hands it to a background thread
    that performs the device->host fetch and the pickle/write.  The snapshot
    makes the fetch safe against the train loop's buffer donation: the live
    state can be donated into the next step while the copy drains.  At most
    one save is in flight; a second save (or ``wait()``) joins the first.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread: Optional[Any] = None
        self._error: Optional[BaseException] = None

    def wait(self) -> None:
        """Block until the in-flight save (if any) has finished."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, path_to_job: str, state, cfg, epoch: int) -> Optional[str]:
        if jax.process_index() != 0:
            return None
        self.wait()
        make_checkpoint_dir(path_to_job)
        path = get_path_to_checkpoint(path_to_job, epoch + 1)
        snapshot = jax.jit(lambda s: s)(state)
        jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), snapshot)

        def work():
            try:
                _write_payload(path, jax.device_get(snapshot), cfg, epoch)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = self._threading.Thread(
            target=work, name="ckpt-writer", daemon=False
        )
        self._thread.start()
        return path


def is_native_checkpoint(path: str) -> bool:
    """Native checkpoints are plain pickles with serialized flax trees; the
    reference's are torch zip/legacy archives (both may be named .pyth —
    the directory contract keeps the reference filename)."""
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return isinstance(payload, dict) and isinstance(
            payload.get("model_state"), bytes
        )
    except Exception:
        return False


def load_checkpoint(path: str, state):
    """Restore a native checkpoint into a TrainState template.

    Returns (state, epoch)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    try:
        params = serialization.from_bytes(jax.device_get(state.params),
                                          payload["model_state"])
        opt_state = serialization.from_bytes(jax.device_get(state.opt_state),
                                             payload["optimizer_state"])
    except ValueError as e:
        # flax's key-mismatch error names neither the file nor the likely
        # cause; an incompatible AUTO_RESUME checkpoint (e.g. a stale
        # OUTPUT_DIR from a different model config) is the common one
        raise ValueError(
            f"checkpoint {path!r} does not match the current model/optimizer "
            f"structure (wrong MODEL config or stale OUTPUT_DIR?): {e}"
        ) from e
    import jax.numpy as jnp

    state = state.replace(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(payload.get("step", 0), jnp.int32),
    )
    if payload.get("batch_stats") is not None and state.model_state is not None:
        state = state.replace(
            model_state=serialization.from_bytes(
                jax.device_get(state.model_state), payload["batch_stats"]
            )
        )
    return state, payload["epoch"]


def load_train_checkpoint(cfg, state) -> Tuple[Any, int]:
    """AUTO_RESUME / explicit-path loading (reference ``:543-570``).

    Returns (state, start_epoch)."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR):
        last = get_last_checkpoint(cfg.OUTPUT_DIR)
        logger.info("Load from last checkpoint, %s.", last)
        state, epoch = load_checkpoint(last, state)
        return state, epoch + 1
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        logger.info("Load from given checkpoint file %s.",
                    cfg.TRAIN.CHECKPOINT_FILE_PATH)
        if cfg.TRAIN.CHECKPOINT_TYPE == "pytorch" and not is_native_checkpoint(
            cfg.TRAIN.CHECKPOINT_FILE_PATH
        ):
            params, epoch = load_reference_params(
                cfg.TRAIN.CHECKPOINT_FILE_PATH, jax.device_get(state.params),
                clear_patterns=cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN,
            )
            state = state.replace(params=params)
            if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
                return state, 0
            return state, (epoch + 1 if epoch is not None else 0)
        state, epoch = load_checkpoint(cfg.TRAIN.CHECKPOINT_FILE_PATH, state)
        if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
            return state, 0
        return state, epoch + 1
    return state, 0


def load_test_checkpoint(cfg, state):
    """reference ``lib/utils/checkpoint.py:505-540``."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        path = cfg.TEST.CHECKPOINT_FILE_PATH
    elif has_checkpoint(cfg.OUTPUT_DIR):
        path = get_last_checkpoint(cfg.OUTPUT_DIR)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
    else:
        logger.info(
            "Unknown way of loading checkpoint. Using with random initialization, only for debugging."
        )
        return state
    if not is_native_checkpoint(path):
        params, _ = load_reference_params(path, jax.device_get(state.params))
        return state.replace(params=params)
    state, _ = load_checkpoint(path, state)
    return state


# ---------------------------------------------------------------------------
# reference (.pyth) interop
# ---------------------------------------------------------------------------


def load_reference_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Optional[int]]:
    """Read a reference ``.pyth`` file into a flat numpy state dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    epoch = None
    if isinstance(blob, dict) and "model_state" in blob:
        sd = blob["model_state"]
        epoch = blob.get("epoch")
    elif isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
    elif isinstance(blob, dict) and "model" in blob and hasattr(
        next(iter(blob["model"].values()), None), "numpy"
    ):
        sd = blob["model"]
    else:
        sd = blob
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out, epoch


def _resize_time_embed(flat_c: dict, flat_t: dict) -> None:
    """Load-time time-embed resize (reference ``lib/utils/checkpoint.py:
    360-365``): a checkpoint ``time_embed`` whose frame count differs from
    the model's is nearest-resized to the model's length instead of being
    shape-filtered away — e.g. finetuning a 96-frame COIN model from an
    8-frame pretraining checkpoint keeps the pretrained (interpolated)
    temporal positions, not a fresh random init.  In-place on ``flat_c``."""
    for k, tv in flat_t.items():
        if not k.endswith("time_embed"):
            continue
        cv = flat_c.get(k)
        if cv is None:
            continue
        cv = np.asarray(cv)
        tshape = tuple(np.shape(tv))
        if (cv.ndim == 3 and len(tshape) == 3 and cv.shape[1] != tshape[1]
                and cv.shape[0] == tshape[0] and cv.shape[2] == tshape[2]):
            idx = np.floor(
                np.arange(tshape[1]) * (cv.shape[1] / tshape[1])
            ).astype(np.int64)
            flat_c[k] = cv[:, idx]
            logger.info(
                "Nearest-resized %s time axis %d -> %d at load "
                "(reference checkpoint.py:360-365)", k, cv.shape[1], tshape[1]
            )


def load_pretrained_encoder(cfg, params):
    """Initialize the video encoder from an external pretrained checkpoint
    (the reference's build-time ``load_pretrained``: ImageNet ViT-B/16 for
    TimeSformer with temporal inflation, or MViTv2 IN1k with 2D->3D
    inflation; reference ``lib/models/vit.py:487-505``,
    ``lib/models/helpers.py:100-145``).

    Path comes from ``TIMESFORMER.PRETRAINED_MODEL`` and is gated by
    ``MODEL.PRETRAINED``. Returns the params tree with the encoder subtree
    replaced (shape-filtered)."""
    path = cfg.TIMESFORMER.PRETRAINED_MODEL
    if not cfg.MODEL.PRETRAINED or not path:
        return params
    if not os.path.exists(path):
        logger.warning("Pretrained model %s not found; keeping random init.",
                       path)
        return params
    from procedurevrl_tpu.utils.converter import (
        convert_imagenet_vit, convert_mvit, convert_procedurevrl,
        inflate_mvit_in1k, strip_prefixes,
    )

    state, _ = load_reference_state_dict(path)
    state = strip_prefixes(state)
    if any(k.startswith("video_encoder.") for k in state):
        enc = convert_mvit(
            {k[len("video_encoder."):]: v for k, v in state.items()
             if k.startswith("video_encoder.")}
        )
    elif cfg.MODEL.MODEL_NAME == "MViT":
        if state.get("patch_embed.proj.weight") is not None and np.ndim(
            state["patch_embed.proj.weight"]
        ) == 4:
            # image checkpoint: inflate over time first
            rel_lens = {}
            state = inflate_mvit_in1k(
                state, time_kernel=cfg.MVIT.PATCH_KERNEL[0]
            )
        enc = convert_mvit(state)
    elif "blocks.0.temporal_attn.qkv.weight" in state:
        # already a TimeSformer (video) checkpoint
        from procedurevrl_tpu.utils.converter import convert_timesformer

        depth = 1 + max(int(k.split(".")[1]) for k in state
                        if k.startswith("blocks."))
        enc = convert_timesformer(state, depth=depth)
    else:
        # ImageNet ViT: inflate spatial attention into temporal slots
        enc = convert_imagenet_vit(state, num_frames=cfg.DATA.NUM_FRAMES)

    flat_t = flatten_dict(params["encoder"], sep="/")
    flat_c = flatten_dict(enc, sep="/")
    _resize_time_embed(flat_c, flat_t)
    merged, skipped = {}, []
    for k, tv in flat_t.items():
        cv = flat_c.get(k)
        if cv is not None and tuple(np.shape(cv)) == tuple(np.shape(tv)):
            merged[k] = np.asarray(cv, dtype=np.asarray(tv).dtype)
        else:
            merged[k] = tv
            skipped.append(k)
    if skipped:
        logger.info("Pretrained-encoder keys kept at init: %s",
                    sorted(skipped)[:20])
    params = dict(params)
    params["encoder"] = unflatten_dict(merged, sep="/")
    logger.info("Initialized encoder from %s (%d tensors)", path,
                len(flat_c))
    return params


def load_reference_params(path: str, params_template,
                          clear_patterns=()) -> Tuple[Any, Optional[int]]:
    """Convert a full reference ProcedureVRL checkpoint into our param tree,
    shape-filtered against the template (reference ``:369-390``).

    ``clear_patterns`` drops checkpoint keys containing any pattern before
    conversion (reference ``TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN``)."""
    from procedurevrl_tpu.utils.converter import convert_procedurevrl

    state, epoch = load_reference_state_dict(path)
    for pattern in clear_patterns or ():
        dropped = [k for k in state if pattern in k]
        for k in dropped:
            del state[k]
        if dropped:
            logger.info("Cleared %d keys matching %r", len(dropped), pattern)
    converted = convert_procedurevrl(state)
    flat_t = flatten_dict(params_template, sep="/")
    flat_c = flatten_dict(converted, sep="/")
    _resize_time_embed(flat_c, flat_t)
    merged = {}
    missing, skipped = [], []
    for k, tv in flat_t.items():
        cv = flat_c.get(k)
        if cv is None:
            missing.append(k)
            merged[k] = tv
        elif tuple(np.shape(cv)) != tuple(np.shape(tv)):
            skipped.append((k, np.shape(cv), np.shape(tv)))
            merged[k] = tv
        else:
            merged[k] = np.asarray(cv, dtype=np.asarray(tv).dtype)
    extra = set(flat_c) - set(flat_t)
    if missing:
        logger.info("Keys kept at init (not in checkpoint): %s",
                    sorted(missing)[:20])
    if skipped:
        logger.info("Keys skipped for shape mismatch: %s", skipped[:20])
    if extra:
        logger.info("Checkpoint keys unused: %s", sorted(extra)[:20])
    return unflatten_dict(merged, sep="/"), epoch
