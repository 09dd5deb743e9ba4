"""Micro-timing for the all-stage march: forward vs fwd+bwd (scan-timed).

Times the differentiable all-stage march (ops/eikonal_vjp.py) at ship
scale on the current backend, isolating the analytic reverse sweep's cost
from the fused forward. Scan-timed (one jitted lax.scan carrying a data
dependency) per the TPU timing rules in CLAUDE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.train import selfcheck


def scan_timeit(body, init, iters=30):
  f = jax.jit(lambda x: jax.lax.scan(lambda c, _: (body(c), None), x, None,
                                     length=iters)[0])
  out = f(init)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  out = f(init)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--grid_n", type=int, default=128)
  p.add_argument("--window", type=int, default=16)
  p.add_argument("--refetch", type=int, default=8)
  p.add_argument("--samples", type=int, default=768)
  p.add_argument("--batch", type=int, default=1024)
  p.add_argument("--block", type=int, default=256)
  p.add_argument("--fwd_mode", default="pallas")
  p.add_argument("--bwd_dtype", default="float32")
  p.add_argument("--bwd_impl", default=None,
                 help="stepvjp | passes | pallas (None -> $EIKVJP_IMPL)")
  p.add_argument("--fwd_interp", default="highest")
  args = p.parse_args()

  spec = grid_ops.GridSpec([args.grid_n] * 3, [-1.5] * 3, [1.5] * 3)
  _, data3d = selfcheck._blob_grid3d(spec, args.grid_n)
  o, d = selfcheck._center_tile_rays(args.batch)
  near, far = 2.0, 6.0
  h = (far - near) / (args.samples - 1)
  so3 = fmlp.mlp_init(random.PRNGKey(7), 60, net_depth=4, net_width=128,
                      skip_layer=2, num_out_channels=3, output_init_std=1e-2)
  alpha = jnp.float32(0.6)

  march = eikonal_vjp.make_march_allstage(
      spec, near, h, args.samples, args.block, args.window, args.refetch,
      selfcheck.SO3_KEY, args.fwd_mode, bwd_dtype=args.bwd_dtype,
      bwd_impl=args.bwd_impl, fwd_interp=args.fwd_interp)

  def fwd_body(oo):
    pos, dirs, dist, nv, g, oow = march(data3d, oo, d, alpha, so3)
    return oo + 1e-12 * pos[:, 0] + 1e-12 * dist[:, :1]

  def loss(oo):
    pos, dirs, dist, nv, g, oow = march(data3d, oo, d, alpha, so3)
    return (jnp.sum(pos * 1e-6) + jnp.sum(dirs * 1e-6)
            + jnp.sum(dist * 1e-6) + jnp.sum(nv * 1e-6) + jnp.sum(g * 1e-6))

  def fwdbwd_body(oo):
    val, gr = jax.value_and_grad(loss)(oo)
    return oo + 1e-12 * val + 1e-12 * gr

  def loss_th(th):
    pos, dirs, dist, nv, g, oow = march(data3d, o, d, alpha, th)
    return (jnp.sum(pos * 1e-6) + jnp.sum(dirs * 1e-6)
            + jnp.sum(dist * 1e-6) + jnp.sum(nv * 1e-6) + jnp.sum(g * 1e-6))

  def fwdbwd_th_body(th):
    gr = jax.grad(loss_th)(th)
    return jax.tree_util.tree_map(lambda a, b: a + 1e-12 * b, th, gr)

  t_fwd = scan_timeit(fwd_body, o)
  print(f"march fwd:              {t_fwd * 1e3:8.2f} ms")
  t_fb = scan_timeit(fwdbwd_body, o)
  print(f"march fwd+bwd (wrt o):  {t_fb * 1e3:8.2f} ms  "
        f"(bwd ~ {(t_fb - t_fwd) * 1e3:.2f} ms)")
  t_fbt = scan_timeit(fwdbwd_th_body, so3)
  print(f"march fwd+bwd (wrt so3):{t_fbt * 1e3:8.2f} ms  "
        f"(bwd ~ {(t_fbt - t_fwd) * 1e3:.2f} ms)")


if __name__ == "__main__":
  main()
