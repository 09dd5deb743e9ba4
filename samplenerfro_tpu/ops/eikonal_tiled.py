"""Tile-coherent eikonal marching: windowed interpolation on the MXU/VPU.

The reference marches each ray independently and pays a scattered 8-corner
gather from the [N^3, 4] grid per step (rnerf/eikonal_utils.py:29-49 +
rnerf/ior_utils.py:188-223). On TPU, XLA lowers those gathers to a
serialized row-copy engine (~3 GB/s), which dominates the whole train step.

This module exploits spatial coherence: rays grouped into pixel tiles stay
within a few voxels of each other along the entire march, so each block of
rays interpolates out of ONE small window of the grid:

  1. per block, slice a [W, W, W, 4] window around the rays' cells — one
     clean DMA, reused for `refetch_every` consecutive steps (the window
     drifts well under a cell per step);
  2. build the trilinear weights as a dense [R, W^3] one-hot-with-weights
     matrix (8 weighted nonzeros per row, built with iota compares on the
     VPU);
  3. interpolate with a [R, W^3] x [W^3, 4] contraction at fp32 precision.

Semantics match ops/eikonal.march exactly (clip-to-edge trilinear, Euler
step, arclength accumulation) whenever every ray's interpolation cell lies
inside its block's window for the whole reuse period; the kernel returns the
number of (block, step, ray, axis) window violations so callers can verify
coverage (0 == exact; violations are clamped to the window edge).

Use cases: full-image rendering (pixels reordered into tiles — a pure
execution-order change, see `tile_order`), and tile-batched training
(opt-in). The "all"-stage residual-gradient (so3) refinement is supported
via `pred_grad_fn`, evaluated per step on the block batch exactly as in
ops/eikonal.march.
"""

import jax
import jax.numpy as jnp

from samplenerfro_tpu.ops import math as math_ops


def _axis_weights(rel0, frac, window):
  """[..., W] weights: (1-frac) at rel0, frac at rel0+1, else 0."""
  iota = jnp.arange(window, dtype=jnp.int32)
  shape = rel0.shape + (window,)
  rel0 = rel0[..., None]
  frac = frac[..., None]
  iota = jnp.broadcast_to(iota, shape)
  return (jnp.where(iota == rel0, 1.0 - frac, 0.0)
          + jnp.where(iota == rel0 + 1, frac, 0.0))


def _axis_dweights(rel0, window):
  """d(_axis_weights)/d(frac): -1 at rel0, +1 at rel0+1, else 0."""
  iota = jnp.arange(window, dtype=jnp.int32)
  shape = rel0.shape + (window,)
  rel0 = rel0[..., None]
  iota = jnp.broadcast_to(iota, shape)
  return (jnp.where(iota == rel0, -1.0, 0.0)
          + jnp.where(iota == rel0 + 1, 1.0, 0.0))


def make_cells_of(spec, n, dtype=jnp.float32):
  """(rp [.., 3]) -> (cell int32, frac) with the marcher's exact clipping."""
  nmin = jnp.asarray(spec.nmin, dtype=dtype)
  ndelta = jnp.asarray(spec.ndelta, dtype=dtype)

  def cells_of(rp):
    c = jnp.clip((rp - nmin) / ndelta, 0.0, n - 1.0)
    cell = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    return cell, c - cell.astype(c.dtype)

  return cells_of


def make_slice_window(grid3d, grid4d, n, w):
  """Per-block [W, W, W, 4] window slicer (vmapped over block origins)."""
  if grid4d is not None:
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(grid4d, (s[0], s[1], s[2], 0),
                                        (w, w, w, 4)))
  return jax.vmap(
      lambda s: jax.lax.dynamic_slice(grid3d, (s[0], s[1], s[2] * 4),
                                      (w, w, w * 4)).reshape(w, w, w, 4))


def window_origin(cells_of, rp, rd, refetch_every, step_size, w, n):
  """Shared-window origin from current cells + straight-line-predicted."""
  cell, _ = cells_of(rp)
  pred_cell, _ = cells_of(rp + refetch_every * step_size * rd)
  cmin = jnp.minimum(jnp.min(cell, axis=1), jnp.min(pred_cell, axis=1))
  cmax = jnp.maximum(jnp.max(cell, axis=1), jnp.max(pred_cell, axis=1))
  center = (cmin + cmax + 1) // 2
  return jnp.clip(center - w // 2, 0, n - w)


def march_tiled(spec, data, origins, directions, near, step_size, num_samples,
                block_size=256, window=8, refetch_every=8, unroll=2,
                pred_grad_fn=None, use_pred_grad=False, normalize_dirs=True,
                interp_precision="highest"):
  """March eikonal paths for spatially-coherent ray blocks.

  Args:
    spec: grid_ops.GridSpec (cubic grid).
    data: [N^3, 4] flattened [n, grad n] grid.
    origins: [batch, 3]; batch divisible by block_size; rays within each
      consecutive block_size chunk must be spatially coherent (a pixel tile).
    directions: [batch, 3].
    near, step_size, num_samples: as in ops/eikonal.march.
    block_size: rays per shared window.
    window: window side length in grid points.
    refetch_every: steps between window refreshes (window margin must cover
      bundle spread + drift over this many steps; violations are counted).
    unroll: outer lax.scan unroll.
    pred_grad_fn: optional (pos [batch, 3], grid_grad [batch, 3]) ->
      [batch, 3] refined-gradient callable (the so3 head), applied where
      ||grid grad|| > 1e-3 as in ops/eikonal.march ("all" stage).
    use_pred_grad: bool, enable the refinement.

  Returns:
    (ray_pos, ray_dir, ray_dist, idx_data, idx_grad, oow_count) — first five
    exactly as ops/eikonal.march; oow_count is an int32 scalar counting
    window violations (0 == results match the scan marcher to fp32).
  """
  nx, ny, nz = spec.ndim
  assert nx == ny == nz, "tiled march assumes a cubic grid"
  n = nx
  w = window
  batch = origins.shape[0]
  assert batch % block_size == 0, (batch, block_size)
  nb = batch // block_size
  assert num_samples % refetch_every == 0, (num_samples, refetch_every)
  n_outer = num_samples // refetch_every

  # March-layout grid [n, n, n*4] (z fused with channels). Accepting the
  # flat [N^3, 4] shape is kept for compatibility, but the reshape is a full
  # HBM relayout (~6 ms for 128^3 on v5e) re-paid on every call — callers on
  # the hot path pass the pre-laid-out 3D array (PathSampler's 'data3d'
  # grid variable).
  grid3d = data if data.ndim == 3 else data.reshape(n, n, n * 4)
  # Measured on one v5e at ship scale: unaligned-lane window slices from the
  # 3D layout are fast for small windows (w=8: 7.5 vs 8.6 ms) but slow for
  # large ones (w=16: 27.5 vs 20.4 ms), where a single up-front relayout to
  # [n, n, n, 4] plus aligned 4D slicing wins despite its ~6 ms cost.
  grid4d = grid3d.reshape(n, n, n, 4) if w >= 12 else None

  init_pos = (origins + near * directions).reshape(nb, block_size, 3)
  init_dir = directions.reshape(nb, block_size, 3)
  init_dist = jnp.full((nb, block_size), near, dtype=origins.dtype)

  cells_of = make_cells_of(spec, n, origins.dtype)
  slice_window = make_slice_window(grid3d, grid4d, n, w)

  def inner_step(carry, _):
    rp, rd, rt, oow, worigin, bricks = carry
    cell, frac = cells_of(rp)
    rel = cell - worigin[:, None, :]
    oow = oow + jnp.sum((rel > w - 2).astype(jnp.int32)
                        + (rel < 0).astype(jnp.int32))
    rel = jnp.clip(rel, 0, w - 2)

    ux = _axis_weights(rel[..., 0], frac[..., 0], w)
    uy = _axis_weights(rel[..., 1], frac[..., 1], w)
    uz = _axis_weights(rel[..., 2], frac[..., 2], w)
    wmat = (ux[..., :, None, None] * uy[..., None, :, None]
            * uz[..., None, None, :]).reshape(nb, block_size, w**3)
    # interp_precision mirrors the fused kernel's --march_interp semantics
    # (march_kernel._precision): HIGHEST = exact fp32 products, DEFAULT =
    # single-pass-bf16 MXU multiplies with fp32 accumulate — the production
    # fast path whose trajectory rounding this XLA marcher can now A/B
    # without a Mosaic compile.
    vals = jnp.einsum("brw,bwc->brc", wmat, bricks.reshape(nb, w**3, 4),
                      precision=getattr(jax.lax.Precision,
                                        str(interp_precision).upper()),
                      preferred_element_type=origins.dtype)

    nvals = vals[..., :1]
    g = vals[..., 1:]
    if use_pred_grad:
      flat_rp = rp.reshape(-1, 3)
      flat_g = g.reshape(-1, 3)
      refined = pred_grad_fn(flat_rp, flat_g).reshape(g.shape)
      grad = jnp.where(
          jnp.linalg.norm(g, axis=-1, keepdims=True) > 1e-3, refined, g)
    else:
      grad = g
    next_rp = rp + step_size / nvals * rd
    next_rd = rd + step_size * grad
    next_rt = rt + jnp.linalg.norm(rp - next_rp, axis=-1)
    out = (rp, rd, rt, nvals, g)
    return (next_rp, next_rd, next_rt, oow, worigin, bricks), out

  def outer_step(carry, _):
    rp, rd, rt, oow = carry
    # Refresh the shared window from the bounding box of the current cells
    # AND the straight-line-predicted cells one reuse-period ahead, so the
    # drift over the reuse window stays inside the margin.
    worigin = window_origin(cells_of, rp, rd, refetch_every, step_size, w, n)
    bricks = slice_window(worigin)
    (rp, rd, rt, oow, _, _), outs = jax.lax.scan(
        inner_step, (rp, rd, rt, oow, worigin, bricks), None,
        length=refetch_every, unroll=refetch_every)
    return (rp, rd, rt, oow), outs

  carry = (init_pos, init_dir, init_dist, jnp.int32(0))
  (_, _, _, oow), (pos, dirs, dist, nvals, g) = jax.lax.scan(
      outer_step, carry, None, length=n_outer, unroll=unroll)

  # [n_outer, refetch, nb, R, ...] -> [batch, S, ...].
  def unblock(a):
    a = a.reshape((num_samples,) + a.shape[2:])  # [S, nb, R, ...]
    a = jnp.moveaxis(a, 0, 2)  # [nb, R, S, ...]
    return a.reshape((batch,) + a.shape[2:])

  dirs_out = math_ops.safe_l2_normalize(dirs) if normalize_dirs else dirs
  return (unblock(pos), unblock(dirs_out),
          unblock(dist), unblock(nvals), unblock(g), oow)


def tile_order(height, width, tile):
  """Pixel permutation grouping the image into row-major `tile` x `tile` blocks.

  Returns (perm, inv_perm) index arrays of length height*width such that
  flat_pixels[perm] is tile-contiguous and x[inv_perm] undoes it. Partial
  edge tiles are emitted last.
  """
  import numpy as np
  idx = np.arange(height * width).reshape(height, width)
  full, partial = [], []
  for ty in range(0, height, tile):
    for tx in range(0, width, tile):
      blk = idx[ty:ty + tile, tx:tx + tile].reshape(-1)
      (full if blk.size == tile * tile else partial).append(blk)
  perm = np.concatenate(full + partial)
  inv = np.empty_like(perm)
  inv[perm] = np.arange(perm.size)
  return perm, inv
