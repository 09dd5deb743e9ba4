"""Import the reference implementation (/root/reference/rnerf) for parity tests.

The reference is pure JAX/flax; it imports cleanly on the modern stack once
three unavailable-in-this-image deps are stubbed out (gin, trimesh, pysdf —
none touch the math under test) and `flax.optim` (removed from flax, only
referenced by an unused dataclass annotation in rnerf/utils.py:42-44) is
shimmed. Nothing here is shipped with the framework; it exists so
tests/test_reference_parity.py can diff our ops against the reference's
actual code instead of a transcription of it.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _gin_stub():
  gin = types.ModuleType("gin")

  def configurable(fn_or_none=None, *args, **kwargs):
    if callable(fn_or_none):
      return fn_or_none  # @gin.configurable
    return lambda fn: fn  # @gin.configurable(...)

  gin.configurable = configurable
  gin.add_config_file_search_path = lambda *a, **k: None
  gin.parse_config_files_and_bindings = lambda *a, **k: None
  gin.config_str = lambda: ""
  gin.REQUIRED = object()
  return gin


def load_reference():
  """Import and return the rnerf package modules as a namespace (cached)."""
  if "rnerf" in sys.modules:
    import rnerf  # noqa: F401
  else:
    sys.modules.setdefault("gin", _gin_stub())
    if "trimesh" not in sys.modules:
      sys.modules["trimesh"] = types.ModuleType("trimesh")
    if "pysdf" not in sys.modules:
      pysdf = types.ModuleType("pysdf")
      pysdf.SDF = object
      sys.modules["pysdf"] = pysdf
    import flax
    if not hasattr(flax, "optim"):
      flax.optim = types.SimpleNamespace(Optimizer=object)
    if REFERENCE_ROOT not in sys.path:
      sys.path.insert(0, REFERENCE_ROOT)

  from rnerf import (eikonal_utils, ior_utils, math_utils, mip, model_utils,
                     models, rl_utils, sh, utils)

  # The reference (jax 0.2.22-era) calls jnp.broadcast_to([1e-3], shape)
  # with a plain list (rnerf/model_utils.py:267); modern JAX requires
  # arrays/scalars. Swap in a semantics-preserving jnp proxy on each
  # reference module (list/tuple args are converted to arrays first).
  import jax.numpy as jnp

  class _JnpShim:

    def __getattr__(self, name):
      return getattr(jnp, name)

    @staticmethod
    def broadcast_to(arr, shape):
      if isinstance(arr, (list, tuple)):
        arr = jnp.asarray(arr)
      return jnp.broadcast_to(arr, shape)

  shim = _JnpShim()
  for mod in (eikonal_utils, ior_utils, math_utils, mip, model_utils, models,
              rl_utils, sh, utils):
    if getattr(mod, "jnp", None) is jnp:
      mod.jnp = shim

  return types.SimpleNamespace(
      math_utils=math_utils, model_utils=model_utils, sh=sh, mip=mip,
      ior_utils=ior_utils, eikonal_utils=eikonal_utils, models=models,
      rl_utils=rl_utils, utils=utils)
