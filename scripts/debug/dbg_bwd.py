import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
"""On-device debug: per-leaf grad deviation of both reverse-sweep impls."""
import os
import numpy as np
import jax
import jax.numpy as jnp
from jax import random

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.train import selfcheck

SO3_KEY = selfcheck.SO3_KEY
grid_n, window, refetch = 128, 16, 8
block_size, s_grad = 256, int(os.environ.get("SGRAD", "192"))
spec = grid_ops.GridSpec([grid_n] * 3, [-1.5] * 3, [1.5] * 3)
data, data3d = selfcheck._blob_grid3d(spec, grid_n)
o, d = selfcheck._center_tile_rays(block_size)
near, far = 2.0, 6.0
h = (far - near) / (768 - 1)

in_dim = 2 * 3 * SO3_KEY[1]
so3 = fmlp.mlp_init(random.PRNGKey(7), in_dim, net_depth=4, net_width=128,
                    skip_layer=2, num_out_channels=3, output_init_std=1e-2)
alpha = jnp.float32(0.6)
og, dg = o[:block_size], d[:block_size]
rng = np.random.RandomState(0)
weights = (jnp.asarray(rng.randn(block_size, s_grad, 3), jnp.float32),
           jnp.asarray(rng.randn(block_size, s_grad, 3), jnp.float32),
           jnp.asarray(rng.randn(block_size, s_grad), jnp.float32),
           jnp.asarray(rng.randn(block_size, s_grad, 1), jnp.float32),
           jnp.asarray(rng.randn(block_size, s_grad, 3), jnp.float32))


def loss_of(outs5):
  pos, dirs, dist, nv, g = outs5[:5]
  wp, wd, wt, wn, wg = weights
  return (jnp.sum(jnp.sin(pos) * wp) + jnp.sum(dirs * wd)
          + jnp.sum(dist * wt) + jnp.sum(nv * wn) + jnp.sum(g * wg))


so3_apply = eikonal_vjp.make_so3_apply(*SO3_KEY)


def loss_ref(o_, d_, al_, th_):
  pred = lambda rp, g: so3_apply(th_, al_, rp, g)
  return loss_of(eikt.march_tiled(
      spec, data3d, o_, d_, near, h, s_grad, block_size=block_size,
      window=window, refetch_every=refetch, pred_grad_fn=pred,
      use_pred_grad=True))


val_ref, grads_ref = jax.jit(jax.value_and_grad(
    loss_ref, argnums=(0, 1, 2, 3)))(og, dg, alpha, so3)

for impl in ("stepvjp", "pallas"):
  march_all = eikonal_vjp.make_march_allstage(
      spec, near, h, s_grad, block_size, window, refetch, SO3_KEY,
      "pallas", bwd_impl=impl)

  def loss_new(o_, d_, al_, th_, march_all=march_all):
    return loss_of(march_all(data3d, o_, d_, al_, th_))

  val_new, grads_new = jax.jit(jax.value_and_grad(
      loss_new, argnums=(0, 1, 2, 3)))(og, dg, alpha, so3)
  print(f"== {impl}: loss dev {abs(float(val_ref) - float(val_new)):.3e}")
  for name, gr, gn in zip(("origins", "directions", "alpha", "so3"),
                          grads_ref, grads_new):
    new_leaves = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gr):
      got = new_leaves[path]
      scale = max(float(np.abs(leaf).max()), 1e-3)
      dev = float(np.abs(np.asarray(leaf) - np.asarray(got)).max())
      print(f"  {impl} {name}{jax.tree_util.keystr(path)}: "
            f"dev {dev:.3e} rel {dev/scale:.3e}")
