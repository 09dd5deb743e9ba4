from samplenerfro_tpu.train.step import (  # noqa: F401
    Stats, create_optimizer, make_train_step, make_render_fn)
from samplenerfro_tpu.train import checkpoints  # noqa: F401
