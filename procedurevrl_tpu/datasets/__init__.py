from procedurevrl_tpu.datasets.build import DATASET_REGISTRY, build_dataset  # noqa
import procedurevrl_tpu.datasets.howto100m  # noqa: F401 (registers)
import procedurevrl_tpu.datasets.kinetics  # noqa: F401
import procedurevrl_tpu.datasets.epickitchens  # noqa: F401
import procedurevrl_tpu.datasets.ssv2  # noqa: F401
