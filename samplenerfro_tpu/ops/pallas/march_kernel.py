"""Pallas TPU kernel: fused tile-coherent eikonal march (experimental).

Fuses the whole march loop for one ray block into a single Mosaic kernel:
window DMA from HBM, trilinear one-hot weight construction on the VPU,
interpolation on the MXU, Euler integration, and per-step output stores.
Grid = (num_blocks, num_windows); ray state lives in VMEM scratch that
persists across the sequential window iterations of each block.

Status: correct (fp32-parity with ops/eikonal_tiled.march_tiled on
linear fields; zero window violations on coherent bundles) but NOT the
production path. Mosaic requires DMA slice offsets aligned to the
(8, 128) tile grid, which forces the VMEM window to WX x 16 x 64 voxels
and inflates the per-step contraction ~8x over the compact 8^3 window:
measured on one v5e at ship scale 17.3 ms (window 8) / 21.5 ms
(window 16) vs the XLA windowed marcher's 8.8 / 20.9 ms — and the
alignment-padded y extent still under-covers strongly-diverging bundles
the XLA window-16 marcher handles. Kept as the starting point for a
future unaligned-gather variant; ops/eikonal_tiled.py remains the
default.

Semantics: out-of-window cells are clamped and counted into the oow output
for verification, as in the XLA marcher.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenerfro_tpu.ops import math as math_ops


def _march_kernel(origins_ref, dirs_ref, grid_hbm, selmat_ref, out_ref,
                  oow_ref, state_ref, brick_ref, sem_ref, *, n, w,
                  block_size, refetch, num_windows, near, step_size, nmin,
                  ndelta, yext, zext):
  b = pl.program_id(1)  # window index (sequential per block)
  r = block_size

  @pl.when(b == 0)
  def _init():
    o = origins_ref[0]
    d = dirs_ref[0]
    state_ref[0:r, :] = o + near * d  # rp
    state_ref[r:2 * r, :] = d  # rd
    state_ref[2 * r:3 * r, :] = jnp.full((r, 3), near, jnp.float32)  # rt (x3)
    oow_ref[0, 0, 0] = 0

  rp = state_ref[0:r, :]
  rd = state_ref[r:2 * r, :]
  rt = state_ref[2 * r:3 * r, 0:1]

  def cells_of(p):
    # Per-axis python-float constants (jnp constants cannot be captured by
    # pallas kernels).
    cols = []
    for a in range(3):
      cols.append(jnp.clip((p[:, a:a + 1] - nmin[a]) / ndelta[a],
                           0.0, n - 1.0))
    c = jnp.concatenate(cols, axis=1)
    cell = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    return cell, c - cell.astype(jnp.float32)

  # Window origin from current + straight-line-predicted cells.
  cell_now, _ = cells_of(rp)
  cell_pred, _ = cells_of(rp + refetch * step_size * rd)

  def axis_origin(a):  # x uses the plain window-centered origin
    lo = jnp.minimum(jnp.min(cell_now[:, a]), jnp.min(cell_pred[:, a]))
    hi = jnp.maximum(jnp.max(cell_now[:, a]), jnp.max(cell_pred[:, a]))
    center = (lo + hi + 1) // 2
    return jnp.clip(center - w // 2, 0, n - w)

  wx = axis_origin(0)
  # y-base aligned to 8 voxels (sublane tile) and z-base aligned to 32
  # voxels (128 lanes), so the DMA slice offsets stay tile-aligned.
  ylo = jnp.minimum(jnp.min(cell_now[:, 1]), jnp.min(cell_pred[:, 1]))
  ybase = jnp.clip((ylo // 8) * 8, 0, n - yext)
  zlo = jnp.minimum(jnp.min(cell_now[:, 2]), jnp.min(cell_pred[:, 2]))
  zbase = jnp.clip((zlo // 32) * 32, 0, n - zext)
  worigin_row = jnp.stack([wx, ybase, zbase])

  # Window DMA: the grid is laid out [N, N, N*4] (z and channel fused in
  # the minor dim) so the slice keeps lane-dim tile alignment.
  copy = pltpu.make_async_copy(
      grid_hbm.at[pl.ds(wx, w), pl.ds(pl.multiple_of(ybase, 8), yext),
                  pl.ds(pl.multiple_of(zbase * 4, 128), zext * 4)],
      brick_ref, sem_ref)
  copy.start()
  copy.wait()
  brick2d = brick_ref[:].reshape(w * yext, zext * 4)  # [(x, y), (z, c)]

  lane_xy = jax.lax.broadcasted_iota(jnp.int32, (r, w * yext), 1)
  ix = lane_xy // yext
  iy = lane_xy % yext
  lane_zc = jax.lax.broadcasted_iota(jnp.int32, (r, zext * 4), 1)
  izc = lane_zc // 4
  selmat = selmat_ref[:]

  def axis_w(i_idx, rel0, frac):
    rel0 = rel0[:, None]
    frac = frac[:, None]
    return (jnp.where(i_idx == rel0, 1.0 - frac, 0.0)
            + jnp.where(i_idx == rel0 + 1, frac, 0.0))

  def step_body(i, carry):
    rp, rd, rt, oow = carry
    cell, frac = cells_of(rp)
    rel = cell - worigin_row[None, :]
    relx = jnp.clip(rel[:, 0], 0, w - 2)
    rely = jnp.clip(rel[:, 1], 0, yext - 2)
    relz = jnp.clip(rel[:, 2], 0, zext - 2)
    oow = oow + jnp.sum(
        (rel[:, 0] > w - 2).astype(jnp.int32)
        + (rel[:, 1] > yext - 2).astype(jnp.int32)
        + (rel[:, 2] > zext - 2).astype(jnp.int32)
        + jnp.sum((rel < 0).astype(jnp.int32), axis=1))

    # Stage 1: contract (x, y) on the MXU -> [R, zext*4] (z, c) values.
    wxy = (axis_w(ix, relx, frac[:, 0])
           * axis_w(iy, rely, frac[:, 1]))
    t_zc = jax.lax.dot_general(
        wxy, brick2d, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    # Stage 2: z-interp weight, then channel-select matmul.
    t_zc = t_zc * axis_w(izc, relz, frac[:, 2])
    vals = jax.lax.dot_general(
        t_zc, selmat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    nval = vals[:, 0:1]
    g = vals[:, 1:4]

    next_rp = rp + step_size / nval * rd
    next_rd = rd + step_size * g
    next_rt = rt + jnp.sqrt(
        jnp.sum((rp - next_rp)**2, axis=-1, keepdims=True))

    out_ref[0, i] = jnp.concatenate([rp, rd, rt, nval, g], axis=1)
    return next_rp, next_rd, next_rt, oow

  rp, rd, rt, oow = jax.lax.fori_loop(
      0, refetch, step_body, (rp, rd, rt, oow_ref[0, 0, 0]), unroll=True)

  state_ref[0:r, :] = rp
  state_ref[r:2 * r, :] = rd
  state_ref[2 * r:3 * r, :] = jnp.broadcast_to(rt, (r, 3))
  oow_ref[0, 0, 0] = oow


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_samples", "near", "step_size",
                     "block_size", "window", "refetch_every", "interpret"))
def march_tiled_pallas(spec, data, origins, directions, near, step_size,
                       num_samples, block_size=256, window=8,
                       refetch_every=8, interpret=False):
  """Fused-kernel twin of eikonal_tiled.march_tiled (same returns)."""
  n = spec.ndim[0]
  w = window
  yext = 16  # y-extent: covers any 8-wide window from an 8-aligned base
  zext = 64  # z-extent: covers any 8-wide window from a 32-aligned base
  batch = origins.shape[0]
  assert batch % block_size == 0
  nb = batch // block_size
  assert num_samples % refetch_every == 0
  num_windows = num_samples // refetch_every

  grid3d = data.reshape(n, n, n * 4)
  o_blocks = origins.reshape(nb, block_size, 3)
  d_blocks = directions.reshape(nb, block_size, 3)
  import numpy as np
  selmat = jnp.asarray(
      (np.arange(zext * 4)[:, None] % 4 == np.arange(4)[None, :])
      .astype(np.float32))

  kernel = functools.partial(
      _march_kernel, n=n, w=w, block_size=block_size,
      refetch=refetch_every, num_windows=num_windows, near=near,
      step_size=step_size, nmin=spec.nmin, ndelta=spec.ndelta, yext=yext,
      zext=zext)

  out, oow = pl.pallas_call(
      kernel,
      interpret=interpret,
      grid=(nb, num_windows),
      in_specs=[
          pl.BlockSpec((1, block_size, 3), lambda b, k: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, block_size, 3), lambda b, k: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec(memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((1, refetch_every, block_size, 11),
                       lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 1), lambda b, k: (b, 0, 0),
                       memory_space=pltpu.SMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((nb, num_samples, block_size, 11),
                               jnp.float32),
          jax.ShapeDtypeStruct((nb, 1, 1), jnp.int32),
      ),
      scratch_shapes=[
          pltpu.VMEM((3 * block_size, 3), jnp.float32),
          pltpu.VMEM((w, yext, zext * 4), jnp.float32),
          pltpu.SemaphoreType.DMA(()),
      ],
  )(o_blocks, d_blocks, grid3d, selmat)

  # [nb, S, R, 11] -> per-ray arrays [batch, S, ...].
  out = jnp.moveaxis(out, 2, 1).reshape(batch, num_samples, 11)
  pos = out[..., 0:3]
  dirs = math_ops.safe_l2_normalize(out[..., 3:6])
  dist = out[..., 6]
  nvals = out[..., 7:8]
  g = out[..., 8:11]
  return pos, dirs, dist, nvals, g, jnp.sum(oow)
