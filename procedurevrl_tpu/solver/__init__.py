from procedurevrl_tpu.solver.lr_policy import get_lr_at_epoch, lr_schedule
from procedurevrl_tpu.solver.optimizer import construct_optimizer

__all__ = ["get_lr_at_epoch", "lr_schedule", "construct_optimizer"]
