from procedurevrl_tpu.visualization.tensorboard_vis import TensorboardWriter  # noqa
from procedurevrl_tpu.visualization.model_vis import (  # noqa
    GradCAM, get_activations, get_layer_weights,
)
