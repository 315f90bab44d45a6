"""One-command zero-shot checkpoint-numerics check against released weights.

Given a released reference checkpoint (``.pyth``) and the COIN step bank,
verifies the converter + zero-shot eval path two ways:

1. ``--probe``: torch-free numeric probe — runs the flax zero-shot forward
   on synthetic frames twice (converted params vs converted params) and
   dumps logits to compare runs/machines.
2. default: full zero-shot COIN step classification eval through the
   standard test path (``tools/test_net.py``) and prints top-1 — the number
   to compare with the reference's published 16.6%
   (reference ``README.md:73-78``).

Usage:
    python tools/zero_shot_parity.py \
        --ckpt /path/ProcedureVRL_pretrained.pyth \
        [--cfg configs/COIN/zero_shot_step_classification.yaml] \
        [--probe out_logits.npy] [opts KEY VAL ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="released .pyth checkpoint")
    ap.add_argument("--cfg", default="configs/COIN/step_classification.yaml")
    ap.add_argument(
        "--probe", default="",
        help="dump zero-shot logits on synthetic frames to this .npy and exit",
    )
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import os as _os

    # pin the platform the way all entry points do (see utils/parser)
    if _os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    from procedurevrl_tpu.config import get_cfg
    from procedurevrl_tpu.utils.parser import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.TEST.CHECKPOINT_FILE_PATH = args.ckpt
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = True

    if args.probe:
        import numpy as np

        import jax
        import jax.numpy as jnp

        from procedurevrl_tpu.engine.steps import TrainState
        from procedurevrl_tpu.models.build import build_model
        from procedurevrl_tpu.solver import construct_optimizer, lr_schedule
        from procedurevrl_tpu.utils import checkpoint as cu
        from tools.train_net import init_params

        model, label_emb = build_model(cfg)
        params = init_params(cfg, model, label_emb)
        tx = construct_optimizer(
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
            ),
            cfg, lr_schedule(cfg, 1),
        )
        state = cu.load_test_checkpoint(cfg, TrainState.create(params, tx))
        T = cfg.DATA.NUM_FRAMES * max(cfg.MODEL.NUM_SEG, 1)
        S = cfg.DATA.TEST_CROP_SIZE
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, T, S, S, 3), jnp.float32
        )
        probs = model.apply(
            {"params": state.params}, x,
            label_emb=None if label_emb is None else jnp.asarray(label_emb),
            train=False,
        )
        np.save(args.probe, np.asarray(probs, np.float32))
        print(f"probe logits saved to {args.probe}; "
              f"top-1 ids: {np.argmax(np.asarray(probs), -1).tolist()}")
        return

    from tools.test_net import test

    stats = test(cfg)
    print(f"zero-shot result: {stats}  (reference target: top1 16.6 for "
          f"COIN step classification, README.md:73-78)")


if __name__ == "__main__":
    main()
