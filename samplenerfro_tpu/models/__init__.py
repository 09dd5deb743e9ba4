from samplenerfro_tpu.models import mlp  # noqa: F401
from samplenerfro_tpu.models import path_sampler  # noqa: F401
from samplenerfro_tpu.models import nerf  # noqa: F401

from samplenerfro_tpu.models.nerf import NerfModel, construct_nerf, get_model  # noqa: F401
