import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, numpy as np, jax.numpy as jnp
from jax import random
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.train import selfcheck as sc

grid_n, window, refetch, block_size = 128, 16, 8, 256
s_grad = 192
spec = grid_ops.GridSpec([grid_n]*3, [-1.5]*3, [1.5]*3)
data, data3d = sc._blob_grid3d(spec, grid_n)
o, d = sc._center_tile_rays(512)
near, far = 2.0, 6.0
h = (far - near) / (768 - 1)
SO3_KEY = sc.SO3_KEY
in_dim = 2*3*SO3_KEY[1]
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
  return (jnp.sum(jnp.sin(pos)*wp) + jnp.sum(dirs*wd) + jnp.sum(dist*wt)
          + jnp.sum(nv*wn) + jnp.sum(g*wg))

so3_apply = eikonal_vjp.make_so3_apply(*SO3_KEY)
def loss_ref(o_, d_, al_, th_):
  pred = lambda rp, g: so3_apply(th_, al_, rp, g)
  return loss_of(eikt.march_tiled(spec, data3d, o_, d_, near, h, s_grad,
      block_size=block_size, window=window, refetch_every=refetch,
      pred_grad_fn=pred, use_pred_grad=True))
val_ref, grads_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0,1,2,3)))(og, dg, alpha, so3)

res = {}
for impl in ("stepvjp", "pallas"):
  ma = eikonal_vjp.make_march_allstage(spec, near, h, s_grad, block_size,
      window, refetch, SO3_KEY, "pallas", bwd_impl=impl)
  f = jax.jit(jax.value_and_grad(lambda o_,d_,al_,th_, ma=ma: loss_of(ma(data3d,o_,d_,al_,th_)), argnums=(0,1,2,3)))
  val, grads = f(og, dg, alpha, so3)
  res[impl] = (val, grads)
  print(f"== {impl}: loss dev {abs(float(val)-float(val_ref)):.3e}")
  for name, gr, gn in zip(("origins","directions","alpha","so3"), grads_ref, grads[:4] if isinstance(grads, tuple) else grads):
    leaves_r = jax.tree_util.tree_leaves_with_path(gr)
    leaves_n = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, lr in leaves_r:
      ln = leaves_n[path]
      dev = float(jnp.abs(lr - ln).max()); scale = float(jnp.abs(lr).max())
      print(f"  {name}{jax.tree_util.keystr(path)}: abs {dev:.3e}  rel {dev/max(scale,1e-30):.3e}  scale {scale:.3e}")

# pallas vs stepvjp directly
print("== pallas vs stepvjp")
for name, gr, gn in zip(("origins","directions","alpha","so3"), res["stepvjp"][1], res["pallas"][1]):
  leaves_r = jax.tree_util.tree_leaves_with_path(gr)
  leaves_n = dict(jax.tree_util.tree_leaves_with_path(gn))
  for path, lr in leaves_r:
    ln = leaves_n[path]
    dev = float(jnp.abs(lr - ln).max()); scale = float(jnp.abs(lr).max())
    print(f"  {name}{jax.tree_util.keystr(path)}: abs {dev:.3e}  rel {dev/max(scale,1e-30):.3e}")
