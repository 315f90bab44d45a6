from procedurevrl_tpu.engine.steps import (
    TrainState,
    compile_step,
    make_eval_step,
    make_train_step,
    normalize_frames,
)

__all__ = [
    "TrainState",
    "compile_step",
    "make_eval_step",
    "make_train_step",
    "normalize_frames",
]
