import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import jax, numpy as np, jax.numpy as jnp
from jax import random
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.train import selfcheck as sc

grid_n, window, refetch, block_size = 128, 16, 8, 256
spec = grid_ops.GridSpec([grid_n]*3, [-1.5]*3, [1.5]*3)
data, data3d = sc._blob_grid3d(spec, grid_n)
o, d = sc._center_tile_rays(512)
near, h = 2.0, (6.0-2.0)/767
KEY = sc.SO3_KEY
in_dim = 2*3*KEY[1]
so3 = fmlp.mlp_init(random.PRNGKey(7), in_dim, net_depth=4, net_width=128,
                    skip_layer=2, num_out_channels=3, output_init_std=1e-2)
alpha = jnp.float32(0.63)
og, dg = o[:block_size], d[:block_size]

for s_grad in (8, 16, 64, 192):
  rng = np.random.RandomState(0)
  weights = tuple(jnp.asarray(rng.randn(*shp), jnp.float32) for shp in
    ((block_size, s_grad, 3),(block_size, s_grad, 3),(block_size, s_grad),
     (block_size, s_grad, 1),(block_size, s_grad, 3)))
  def loss_of(outs5, weights=weights):
    pos, dirs, dist, nv, g = outs5[:5]
    wp, wd, wt, wn, wg = weights
    return (jnp.sum(jnp.sin(pos)*wp) + jnp.sum(dirs*wd) + jnp.sum(dist*wt)
            + jnp.sum(nv*wn) + jnp.sum(g*wg))
  grads = {}
  for impl in ("stepvjp", "pallas"):
    ma = eikonal_vjp.make_march_allstage(spec, near, h, s_grad, block_size,
        window, refetch, KEY, "pallas", bwd_impl=impl)
    f = jax.jit(jax.value_and_grad(lambda o_,d_,al_,th_, ma=ma, lo=loss_of: lo(ma(data3d,o_,d_,al_,th_)), argnums=(0,1,2,3)))
    grads[impl] = f(og, dg, alpha, so3)[1]
  worst = 0.0; worst_name = ""
  for name, gr, gn in zip(("origins","directions","alpha","so3"), grads["stepvjp"], grads["pallas"]):
    leaves_n = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, lr in jax.tree_util.tree_leaves_with_path(gr):
      ln = leaves_n[path]
      rel = float(jnp.abs(lr-ln).max())/max(float(jnp.abs(lr).max()),1e-3)
      tag = f"{name}{jax.tree_util.keystr(path)}"
      if rel > worst: worst, worst_name = rel, tag
  a_s = float(grads["stepvjp"][2]); a_p = float(grads["pallas"][2])
  print(f"s_grad={s_grad}: worst rel {worst:.3e} ({worst_name}); alpha step {a_s:.5e} pallas {a_p:.5e}")
