from samplenerfro_tpu.data.rays import Rays, namedtuple_map  # noqa: F401
from samplenerfro_tpu.data.datasets import (  # noqa: F401
    Dataset, Blender, NSVF, OpenCV, LLFF, Grid, dataset_dict, get_dataset)
