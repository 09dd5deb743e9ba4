"""Micro-benchmark: eikonal marchers at ship scale on the real accelerator.

Compares the scan marcher, the XLA windowed marcher, and the fused Pallas
kernel on the reference workload shape (batch 1024 rays in 16x16 pixel
tiles, 64 coarse x 12 path samples = 768 steps), across grid resolutions
including the flagship scenes' 384^3 (glass) and 512^3 (ship).

Usage: python scripts/bench_march.py [--grids 128,384,512] [--so3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_kernel

BATCH = 1024
BLOCK = 256
S = 768
NEAR, FAR = 2.0, 6.0
H = (FAR - NEAR) / (S - 1)


def make_grid(n):
  axes = np.linspace(-1.5, 1.5, n, dtype=np.float32)
  xx = axes[:, None, None]
  yy = axes[None, :, None]
  zz = axes[None, None, :]
  vals = (1.0 + 0.33 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)).astype(
      np.float32)
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  values = vals.reshape(-1, 1)
  # Assemble on the host: [N^3, C] device intermediates are 32x tile-padded.
  data = np.concatenate(
      [values, grid_ops.central_difference_grad_numpy(spec, values)],
      axis=-1).astype(np.float32)
  # March layout [n, n, n*4]: what PathSampler feeds the windowed/fused
  # marchers (the flat->3D reshape is a ~6 ms/call HBM relayout).
  return spec, jax.device_put(data.reshape(n, n, n * 4))


def make_rays(tile=16, res=800, fov=0.69, seed=0):
  rng = np.random.RandomState(seed)
  o = np.array([0, 0, -4.0], np.float32)
  dirs = []
  for _ in range(BATCH // (tile * tile)):
    cx, cy = rng.randint(0, res - tile, 2)
    for py in range(tile):
      for px in range(tile):
        x = (cx + px - res / 2) / res * fov
        y = (cy + py - res / 2) / res * fov
        dd = np.array([np.tan(x), np.tan(y), 1.0])
        dirs.append(dd / np.linalg.norm(dd))
  d = np.asarray(dirs, np.float32)
  return (jnp.asarray(np.broadcast_to(o, d.shape).copy()), jnp.asarray(d))


def _sync(out):
  # block_until_ready is unreliable through the remote-TPU tunnel; a real
  # device_get of every output forces completion.
  return jax.device_get(jax.tree_util.tree_map(lambda x: x.sum(), out))


def timeit(fn, *args, iters=10):
  out = fn(*args)
  _sync(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  _sync(out)
  dt = (time.perf_counter() - t0) / iters
  oow = int(out[5]) if len(out) > 5 else 0
  return dt, oow


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--grids", default="128")
  parser.add_argument("--so3", action="store_true")
  parser.add_argument("--skip_scan", action="store_true")
  parser.add_argument("--iters", type=int, default=10)
  args = parser.parse_args()

  o, d = make_rays()
  print(f"device: {jax.devices()[0]}, batch {BATCH}, block {BLOCK}, "
        f"S {S} steps")

  so3_params = None
  pred_grad_fn = None
  if args.so3:
    max_deg = 10
    so3_params = fmlp.mlp_init(jax.random.PRNGKey(0), 60,
                               output_init_std=1e-5)
    so3_params = jax.device_put(so3_params)

    def pred_grad_fn(rp, g):
      raw = fmlp.mlp_apply(
          so3_params, math_ops.annealed_pos_enc(rp, 0, 10, alpha=6.0))
      return eik_ops.rodrigues_rotate(raw, g)

  for n in [int(g) for g in args.grids.split(",")]:
    spec, data = make_grid(n)
    print(f"\n=== grid {n}^3 ({data.size * 4 / 2**20:.0f} MiB) ===")

    if not args.skip_scan and not args.so3:
      flat = jax.device_put(np.asarray(data).reshape(-1, 4))
      scan = jax.jit(lambda dd, oo, di: eik_ops.march(
          spec, dd, oo, di, NEAR, H, S, unroll=8))
      dt, _ = timeit(scan, flat, o, d, iters=max(2, args.iters // 3))
      print(f"scan:              {dt * 1e3:8.2f} ms   "
            f"{BATCH / dt:10.0f} rays/s")

    for w in (8, 16):
      tiled = jax.jit(lambda dd, oo, di, w=w: eikt.march_tiled(
          spec, dd, oo, di, NEAR, H, S, block_size=BLOCK, window=w,
          refetch_every=8, pred_grad_fn=pred_grad_fn,
          use_pred_grad=args.so3))
      dt, oow = timeit(tiled, data, o, d, iters=args.iters)
      print(f"xla tiled w={w:<3d}    {dt * 1e3:8.2f} ms   "
            f"{BATCH / dt:10.0f} rays/s   oow={oow}")

    for w in (8, 16):
      def pallas_fn(dd, oo, di, w=w):
        return march_kernel.march_tiled_pallas(
            spec, dd, oo, di, NEAR, H, S, block_size=BLOCK, window=w,
            refetch_every=8, so3_params=so3_params, annealed_alpha=0.6)
      try:
        dt, oow = timeit(pallas_fn, data, o, d, iters=args.iters)
        print(f"pallas w={w:<3d}       {dt * 1e3:8.2f} ms   "
              f"{BATCH / dt:10.0f} rays/s   oow={oow}")
      except Exception as e:  # noqa: BLE001 - report and continue
        print(f"pallas w={w}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
  main()
