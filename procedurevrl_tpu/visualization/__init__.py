from procedurevrl_tpu.visualization.tensorboard_vis import TensorboardWriter  # noqa
