"""Pure-functional compute primitives (no flax dependency).

Everything in this package is a jittable function over explicit arrays, so it
can be reused from flax modules, Pallas kernels, tests, and offline tools.
"""

from samplenerfro_tpu.ops import math  # noqa: F401
from samplenerfro_tpu.ops import sh  # noqa: F401
from samplenerfro_tpu.ops import grid  # noqa: F401
from samplenerfro_tpu.ops import render  # noqa: F401
from samplenerfro_tpu.ops import eikonal  # noqa: F401
from samplenerfro_tpu.ops import mip  # noqa: F401
from samplenerfro_tpu.ops import mlp  # noqa: F401
