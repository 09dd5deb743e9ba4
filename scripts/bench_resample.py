"""Micro-bench the pieces of hierarchical resampling on the attached chip.

Breaks scripts/perf_report.py's 4.5 ms "hierarchical resample" line into
its stages — stratified inverse-CDF draw, merge+sort, the searchsorted
re-anchor, and the fused payload gather — at the production step shapes,
to direct optimization work at the piece that actually costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

from samplenerfro_tpu.ops import render as render_ops

B, NC, NF, S = 1024, 64, 128, 768


def timeit(fn, *args, iters=20):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters * 1e3


def main():
  key = random.PRNGKey(0)
  bins = jnp.sort(random.uniform(key, (B, NC - 1)) * 4 + 2, axis=-1)
  weights = random.uniform(key, (B, NC - 2))
  path_dist = jnp.cumsum(random.uniform(key, (B, S)) * 0.01, -1) + 2
  path_pos = random.normal(key, (B, S, 3))
  path_dir = random.normal(key, (B, S, 3))
  path_grad = random.normal(key, (B, S, 3))
  jitter = jnp.arange(0, S, S // NC)
  z = jnp.sort(random.uniform(key, (B, NC + NF)) * 4 + 2, axis=-1)

  draw = jax.jit(lambda k, b, w: render_ops.sorted_piecewise_constant_pdf(
      k, b, w, NF, True))
  t_draw = timeit(draw, key, bins, weights)

  reanchor = jax.jit(render_ops.reanchor_on_path)
  t_reanchor = timeit(reanchor, z, path_pos, path_dir, path_dist, path_grad)

  search = jax.jit(lambda d, v: jax.vmap(
      lambda a, x: jnp.searchsorted(a, x, side="left",
                                    method="compare_all"))(d, v))
  t_search = timeit(search, path_dist, z)

  idx = jnp.clip(search(path_dist, z) - 1, 0, S - 1)
  payload = jnp.concatenate(
      [path_pos, path_dir, path_grad, path_dist[..., None]], axis=-1)
  gather = jax.jit(lambda p, i: jnp.take_along_axis(p, i[..., None], axis=1))
  t_gather = timeit(gather, payload, idx)

  full = jax.jit(lambda k, b, w: render_ops.sample_pdf(
      k, b, w, path_pos, path_dir, path_dist, path_grad, NF, True,
      jitter, 2.0))
  t_full = timeit(full, key, bins, weights)

  print(f"sorted_piecewise_constant_pdf: {t_draw:.3f} ms")
  print(f"searchsorted(compare_all) [S={S}, M={NC+NF}]: {t_search:.3f} ms")
  print(f"payload take_along_axis [B,{S},10]->[B,{NC+NF},10]: "
        f"{t_gather:.3f} ms")
  print(f"reanchor_on_path total: {t_reanchor:.3f} ms")
  print(f"sample_pdf total: {t_full:.3f} ms")


if __name__ == "__main__":
  main()
