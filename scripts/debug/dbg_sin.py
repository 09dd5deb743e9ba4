import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def kern(x_ref, o_ref):
  o_ref[...] = jnp.sin(x_ref[...])


x = np.random.RandomState(0).uniform(-4, 4, (8, 256)).astype(np.float32)
for scale in (1.0, 64.0, 512.0, 2048.0):
  xs = (x * scale).astype(np.float32)
  out = pl.pallas_call(
      kern, out_shape=jax.ShapeDtypeStruct(xs.shape, jnp.float32))(
          jnp.asarray(xs))
  ref = np.sin(xs.astype(np.float64))
  xla = np.asarray(jax.jit(jnp.sin)(jnp.asarray(xs)))
  print(f"scale {scale:7.0f}: mosaic err {np.abs(np.asarray(out) - ref).max():.3e}"
        f"  xla err {np.abs(xla - ref).max():.3e}")
