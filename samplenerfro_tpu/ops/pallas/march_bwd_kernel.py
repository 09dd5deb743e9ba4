"""Pallas TPU kernel: fused reverse sweep for the 'all'-stage eikonal march.

The analytic reverse sweep (ops/eikonal_vjp.py) replays the stored forward
trajectory in reverse and applies hand-derived step adjoints. Its XLA
formulations are bound by a measured ~15-20 ms floor PER PASS over the
[batch, 768, ...] trajectory on v5e (relayouts + scan overhead), so this
kernel fuses the whole sweep — window DMA, trilinear adjoint, so3 MLP
recompute + backward, Rodrigues adjoint, Euler adjoint, and the so3
parameter-gradient accumulation — into one Mosaic kernel mirroring the
forward march kernel's transposed rays-on-lanes layout
(ops/pallas/march_kernel.py).

Math parity target: eikonal_vjp.bwd_stepvjp (the per-step adjoint of
rnerf/eikonal_utils.py:29-49 + ior_utils.py:188-259), cross-tested against
jax autodiff of the tiled forward in tests/test_eikonal_vjp.py.

Key layout choices:
  - Stored trajectory and cotangents stream in march layout
    [nb, S, 11, R] (rays on lanes), one reuse window per grid step,
    REVERSED via the BlockSpec index map — no XLA pass ever walks the
    trajectory.
  - The trilinear position-adjoint needs three directional weight
    derivatives; reassociated as TWO window matmuls per block-step
    (brick2d [wy, zc] @ (z-weights * vbar) [zc, R]) plus VPU one-hot
    builds and sublane reductions — the [R, w^3] weight tensor never
    exists (same trick as the forward).
  - The so3 MLP recompute + backward runs per ray block in the forward
    kernel's transposed layout (sublane concats only — Mosaic rejects
    lane-dim concatenation at nb > 1); parameter gradients accumulate
    into revisited output blocks (lane-contraction outer products),
    bias/alpha gradients accumulate as [*, R] rows and reduce over lanes
    once at the end.
  - Window placement recomputes a bounding box over the window's STORED
    positions (strictly tighter than the forward's predictive placement;
    any window containing the stencil yields the identical adjoint).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenerfro_tpu.ops.pallas import march_kernel as mk

_ZEXT = mk._ZEXT


def _rows_dot(a, b):
  """Sum over sublane rows of a*b -> [1, R]."""
  return jnp.sum(a * b, axis=0, keepdims=True)


def _axis_dw(idx_col, rel_row):
  """d(one-hot pair)/d(frac): -1 at rel, +1 at rel+1 ([rows, R])."""
  return (jnp.where(idx_col == rel_row, -1.0, 0.0)
          + jnp.where(idx_col == rel_row + 1, 1.0, 0.0))


def _pe_rows(p, alpha, max_deg):
  """Annealed PE of [3, R] -> (x [6*max_deg, R], per-degree caches).

  Row order matches ops/math.py:annealed_pos_enc via the forward kernel's
  _annealed_pe_t: per degree d, [sin(p*2^d)*wd (3), sin(p*2^d+pi/2)*wd (3)].
  Returns the bases and window weights needed by the backward.
  """
  feats, caches = [], []
  for d in range(max_deg):
    xb = p * (2.0 ** d)
    clipd = jnp.clip(alpha * max_deg - d, 0.0, 1.0)
    wd = 0.5 * (1 + jnp.cos(jnp.pi * clipd + jnp.pi))
    # d(wd)/d(alpha) = 0.5*sin(pi*clipd)*pi*max_deg on the open ramp.
    ind = jnp.logical_and(alpha * max_deg - d > 0.0,
                          alpha * max_deg - d < 1.0).astype(jnp.float32)
    dwd = 0.5 * jnp.sin(jnp.pi * clipd) * jnp.pi * max_deg * ind
    s = jnp.sin(xb)
    cth = jnp.sin(xb + 0.5 * jnp.pi)
    feats.append(s * wd)
    feats.append(cth * wd)
    caches.append((s, cth, wd, dwd, 2.0 ** d))
  return jnp.concatenate(feats, axis=0), caches


def _pe_bwd(dx, caches):
  """(dx [6*max_deg, R], caches) -> (pbar [3, R], dalpha_rows [1, R])."""
  pbar = jnp.zeros_like(dx[0:3])
  dal = jnp.zeros_like(dx[0:1])
  for d, (s, cth, wd, dwd, scale) in enumerate(caches):
    dxs = dx[6 * d:6 * d + 3]
    dxc = dx[6 * d + 3:6 * d + 6]
    # d(sin)/dp = cos * 2^d; d(sin(x+pi/2))/dp = -sin * 2^d.
    pbar = pbar + wd * scale * (dxs * cth - dxc * s)
    dal = dal + dwd * (_rows_dot(dxs, s) + _rows_dot(dxc, cth))
  return pbar, dal


def _mlp_fwd_t(x, wts, bstack, precision=jax.lax.Precision.DEFAULT):
  """Transposed skip-MLP forward; returns (raw [3, R], activations).

  precision: MXU precision of the recompute matmuls. DEFAULT (single-pass
  bf16 multiplies, fp32 accumulate) is the parity choice: the XLA so3
  apply the reference gradients differentiate (ops/mlp.py:mlp_apply,
  precision=None) rounds exactly this way, and the transposed layout is
  bit-identical to XLA's forward layout at DEFAULT (measured on v5e:
  0 ReLU flips over 6.3M preacts). Recomputing at HIGHEST instead
  *diverges* from the production rounding by ~bf16 ulp (5e-3 on O(1)
  preacts), flipping thousands of ReLU masks — each flip makes a
  discrete |dh|-sized jump in the bias/kernel cotangents (the round-3
  grad_pallas_so3 envelope failures, BENCH_r03.json).
  """
  w0t, w1t, w2t, w3t, woutt = wts

  def matm(wt, hh):
    return jax.lax.dot_general(wt, hh, (((1,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)

  b = bstack
  h1 = jnp.maximum(matm(w0t, x) + b[:, 0:1], 0.0)
  h2 = jnp.maximum(matm(w1t, h1) + b[:, 1:2], 0.0)
  h3 = jnp.maximum(matm(w2t, h2) + b[:, 2:3], 0.0)
  hc = jnp.concatenate([h3, x], axis=0)
  h4 = jnp.maximum(matm(w3t, hc) + b[:, 3:4], 0.0)
  raw = matm(woutt, h4) + b[0:3, 4:5]
  return raw, (x, h1, h2, h3, hc, h4)


def _rodrigues_bwd(raw, g, ub):
  """Adjoint of rodrigues_rotate on transposed [3, R] rows.

  Forward (ops/eikonal.py:rodrigues_rotate): theta=|raw|_eps, e=raw/theta,
  a=|g|_eps, v=g/a, out = a*(cos(t) v + sin(t) e x v + (1-cos t)(e.v) e).
  Returns (rawbar, gbar) for output cotangent ub.
  """
  eps = 1e-6
  sq_r = jnp.sum(raw**2, axis=0, keepdims=True)
  theta = jnp.sqrt(jnp.maximum(sq_r, eps))
  ind_r = (sq_r > eps).astype(raw.dtype)
  e = raw / theta
  sq_g = jnp.sum(g**2, axis=0, keepdims=True)
  a = jnp.sqrt(jnp.maximum(sq_g, eps))
  ind_g = (sq_g > eps).astype(g.dtype)
  v = g / a
  c = jnp.cos(theta)
  s = jnp.sin(theta)
  exv = mk._cross_rows(e, v)
  wev = _rows_dot(e, v)
  out = a * (c * v + s * exv + (1 - c) * wev * e)

  abar = _rows_dot(ub, out) / a
  pdote = _rows_dot(ub, e)
  vbar = a * c * ub + a * s * mk._cross_rows(ub, e) + a * (1 - c) * pdote * e
  ebar = (a * s * mk._cross_rows(v, ub)
          + a * (1 - c) * (pdote * v + wev * ub))
  tbar = _rows_dot(ub, a * (-s * v + c * exv + s * wev * e))
  # e = raw / theta; theta = sqrt(max(|raw|^2, eps)).
  rawbar = ebar / theta
  tbar = tbar - _rows_dot(ebar, e) / theta
  rawbar = rawbar + tbar * (raw / theta) * ind_r
  # v = g / a; a = sqrt(max(|g|^2, eps)).
  gbar = vbar / a - ind_g * _rows_dot(vbar, v) * v / a + abar * ind_g * v
  return rawbar, gbar


def _bwd_kernel(*refs, n, w, yext, block_size, nb, refetch, step_size,
                nmin, ndelta, max_deg, interp_precision, so3_precision):
  (traj_ref, cts_ref, grid_hbm,
   w0t, w1t, w2t, w3t, woutt, w0, w1, w2, w3, wout, bstack_ref, alpha_ref,
   raybar_ref, dw0t_o, dw1t_o, dw2t_o, dw3t_o, dwoutt_o, dbias_o, dalpha_o,
   brick_ref, sem_ref) = refs
  k = pl.program_id(0)
  r = block_size
  h = step_size
  zext = _ZEXT
  wy = w * yext
  zc = zext * 4
  alpha = alpha_ref[0, 0]
  bstack = bstack_ref[:]
  wts_t = (w0t[:], w1t[:], w2t[:], w3t[:], woutt[:])

  @pl.when(k == 0)
  def _init():
    raybar_ref[0] = jnp.zeros((nb * 3, r), jnp.float32)
    raybar_ref[1] = jnp.zeros((nb * 3, r), jnp.float32)
    for ref in (dw0t_o, dw1t_o, dw2t_o, dw3t_o, dwoutt_o, dbias_o, dalpha_o):
      ref[...] = jnp.zeros(ref.shape, ref.dtype)

  nmin_col = mk._axis_rows(nb, nmin)
  ndelta_col = mk._axis_rows(nb, ndelta)

  def cells_of(p):
    """[nb*3, R] -> (cell int32, frac, in-range mask) in grid coords."""
    praw = (p - nmin_col) / ndelta_col
    c = jnp.clip(praw, 0.0, n - 1.0)
    cell = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    inr = jnp.logical_and(praw > 0.0, praw < n - 1.0).astype(jnp.float32)
    return cell, c - cell.astype(jnp.float32), inr

  # ---- window placement: bbox over the window's STORED positions --------
  cmins, cmaxs = [], []
  for s in range(refetch):
    p_rows = jnp.concatenate([traj_ref[b, s, 0:3, :] for b in range(nb)],
                             axis=0)
    cell_s, _, _ = cells_of(p_rows)
    cmins.append(jnp.min(cell_s, axis=1))
    cmaxs.append(jnp.max(cell_s, axis=1))
  cmin = functools.reduce(jnp.minimum, cmins)
  cmax = functools.reduce(jnp.maximum, cmaxs)

  worigin_scalars = []
  dmas = []
  for b in range(nb):
    lo, hi = cmin[3 * b], cmax[3 * b]
    wx = jnp.clip((lo + hi + 1) // 2 - w // 2, 0, n - w)
    ybase = jnp.clip((cmin[3 * b + 1] // 8) * 8, 0, n - yext)
    zbase = jnp.clip((cmin[3 * b + 2] // 32) * 32, 0, n - zext)
    worigin_scalars.extend([wx, ybase, zbase])
    dma = pltpu.make_async_copy(
        grid_hbm.at[pl.ds(wx, w), pl.ds(pl.multiple_of(ybase, 8), yext),
                    pl.ds(pl.multiple_of(zbase * 4, 128), zext * 4)],
        brick_ref.at[b], sem_ref.at[b])
    dma.start()
    dmas.append(dma)
  worigin_col = jnp.concatenate(
      [sv.reshape(1, 1) for sv in worigin_scalars], axis=0)
  for dma in dmas:
    dma.wait()

  sub_wy = jax.lax.broadcasted_iota(jnp.int32, (wy, 1), 0)
  ix = sub_wy // yext
  iy = sub_wy % yext
  izc = jax.lax.broadcasted_iota(jnp.int32, (zc, 1), 0) // 4
  chmod = jax.lax.broadcasted_iota(jnp.int32, (zc, 1), 0) % 4
  bound_col = mk._axis_rows(nb, (float(w - 2), float(yext - 2),
                                 float(zext - 2))).astype(jnp.int32)

  def axis_w(idx_col, rel_row, frac_row):
    return (jnp.where(idx_col == rel_row, 1.0 - frac_row, 0.0)
            + jnp.where(idx_col == rel_row + 1, frac_row, 0.0))

  def step_body(i, carry):
    pbar_all, dbar_all = carry
    s = refetch - 1 - i

    # Per-block stored state and cotangents ([11, R] per block at step s;
    # s is a traced scalar index on a non-tiled leading dim).
    tstep = [traj_ref[b, s] for b in range(nb)]
    cstep = [cts_ref[b, s] for b in range(nb)]
    p_b = [t[0:3] for t in tstep]
    d_b = [t[3:6] for t in tstep]
    n_b = [t[7:8] for t in tstep]
    g_b = [t[8:11] for t in tstep]
    dp_b = [c[0:3] for c in cstep]
    dd_b = [c[3:6] for c in cstep]
    sb_b = [c[6:7] for c in cstep]
    dn_b = [c[7:8] for c in cstep]
    dg_b = [c[8:11] for c in cstep]

    # ---- so3 head: recompute + adjoint, per ray block (the forward's
    # layout discipline: sublane concats only — Mosaic rejects the
    # lane-concatenated variant at nb > 1) ----
    ubar_b = [h * dbar_all[3 * b:3 * b + 3, :] for b in range(nb)]
    mask_b = [
        (jnp.sqrt(jnp.sum(g_b[b]**2, axis=0, keepdims=True)) > 1e-3)
        .astype(jnp.float32) for b in range(nb)]

    # The whole so3 chain (recompute, dh chains, outer products) runs at
    # so3_precision — DEFAULT to match the rounding of the XLA vjp of the
    # precision=None so3 apply that the reference gradients use (see
    # _mlp_fwd_t docstring); interp adjoints keep interp_precision.
    def matm(wmat, hh):  # [in, out] @ [out, M] -> [in, M]
      return jax.lax.dot_general(wmat, hh, (((1,), (0,)), ((), ())),
                                 precision=so3_precision,
                                 preferred_element_type=jnp.float32)

    def outer(dh, act):  # [out, M] x [in, M] -> [out, in], contract lanes
      return jax.lax.dot_general(dh, act, (((1,), (1,)), ((), ())),
                                 precision=so3_precision,
                                 preferred_element_type=jnp.float32)

    p_so3_b, g_so3_b = [], []
    for b in range(nb):
      x_c, pe_caches = _pe_rows(p_b[b], alpha, max_deg)
      raw, acts = _mlp_fwd_t(x_c, wts_t, bstack,
                             precision=so3_precision)
      rawbar, g_so3 = _rodrigues_bwd(raw, g_b[b], ubar_b[b] * mask_b[b])
      _, h1, h2, h3, hc, h4 = acts

      width = h1.shape[0]
      dh4 = matm(wout[:], rawbar) * (h4 > 0)
      dhc = matm(w3[:], dh4)
      dh3 = dhc[0:width] * (h3 > 0)
      dx_skip = dhc[width:]
      dh2 = matm(w2[:], dh3) * (h2 > 0)
      dh1 = matm(w1[:], dh2) * (h1 > 0)
      dx = matm(w0[:], dh1) + dx_skip

      dw0t_o[...] += outer(dh1, x_c)
      dw1t_o[...] += outer(dh2, h1)
      dw2t_o[...] += outer(dh3, h2)
      dw3t_o[...] += outer(dh4, hc)
      dwoutt_o[...] += outer(rawbar, h4)
      # Bias/alpha cotangents: accumulate [*, R] rows, reduce lanes once
      # at the very end (outside the kernel).
      dbias_o[0] += dh1
      dbias_o[1] += dh2
      dbias_o[2] += dh3
      dbias_o[3] += dh4
      dbias_o[4] += jnp.concatenate(
          [rawbar, jnp.zeros((width - 3, r), jnp.float32)], axis=0)

      pbar_pe, dal_rows = _pe_bwd(dx, pe_caches)
      dalpha_o[...] += dal_rows
      p_so3_b.append(pbar_pe)
      g_so3_b.append(g_so3)

    # ---- per-block Euler + trilinear adjoints ----
    new_p, new_d = [], []
    for b in range(nb):
      pbar = pbar_all[3 * b:3 * b + 3, :]
      dbar = dbar_all[3 * b:3 * b + 3, :]
      p_so3 = p_so3_b[b] * mask_b[b]
      g_so3 = g_so3_b[b]

      gbar = ubar_b[b] * (1.0 - mask_b[b]) + g_so3 + dg_b[b]
      dlen = jnp.sqrt(jnp.maximum(
          jnp.sum(d_b[b]**2, axis=0, keepdims=True), 1e-6))
      inv_n = 1.0 / n_b[b]
      pdotd = _rows_dot(pbar, d_b[b])
      nbar = (-(h * inv_n**2) * pdotd + dn_b[b]
              - sb_b[b] * (h * inv_n**2) * dlen)
      dbar_k = (dbar + (h * inv_n) * pbar + dd_b[b]
                + sb_b[b] * (h * inv_n) * d_b[b] / dlen)

      # Trilinear adjoint via the Q-form: two window matmuls per block.
      cell, frac, inr = cells_of_rows(p_b[b])
      rel = jnp.clip(cell - worigin_col[3 * b:3 * b + 3],
                     0, bound_col[3 * b:3 * b + 3])
      relx, rely, relz = rel[0:1], rel[1:2], rel[2:3]
      fx_, fy_, fz_ = frac[0:1], frac[1:2], frac[2:3]

      # vbar broadcast over the fused z*4 rows: row z*4+c holds vbar_c.
      vbar4 = jnp.concatenate([nbar, gbar], axis=0)       # [4, R]
      vsel = (jnp.where(chmod == 0, vbar4[0:1], 0.0)
              + jnp.where(chmod == 1, vbar4[1:2], 0.0)
              + jnp.where(chmod == 2, vbar4[2:3], 0.0)
              + jnp.where(chmod == 3, vbar4[3:4], 0.0))   # [zc, R]
      uz_rows = axis_w(izc, relz, fz_)
      dz_rows = _axis_dw(izc, relz)
      brick2d = brick_ref[b].reshape(wy, zc)
      q_u = jax.lax.dot_general(
          brick2d, uz_rows * vsel, (((1,), (0,)), ((), ())),
          precision=interp_precision, preferred_element_type=jnp.float32)
      q_d = jax.lax.dot_general(
          brick2d, dz_rows * vsel, (((1,), (0,)), ((), ())),
          precision=interp_precision, preferred_element_type=jnp.float32)

      ux_rows = axis_w(ix, relx, fx_)
      uy_rows = axis_w(iy, rely, fy_)
      dx_rows = _axis_dw(ix, relx)
      dy_rows = _axis_dw(iy, rely)
      fxr = _rows_dot(dx_rows * uy_rows, q_u)
      fyr = _rows_dot(ux_rows * dy_rows, q_u)
      fzr = _rows_dot(ux_rows * uy_rows, q_d)
      fracbar = jnp.concatenate([fxr, fyr, fzr], axis=0)  # [3, R]
      p_interp = fracbar * inr / ndelta_col[3 * b:3 * b + 3]

      new_p.append(pbar + p_so3 + p_interp + dp_b[b])
      new_d.append(dbar_k)
    return (jnp.concatenate(new_p, axis=0), jnp.concatenate(new_d, axis=0))

  def cells_of_rows(prow):
    # prow is a [3, R] slice; the _axis_rows constants repeat per 3 rows.
    nmin3 = nmin_col[0:3]
    nd3 = ndelta_col[0:3]
    praw = (prow - nmin3) / nd3
    c = jnp.clip(praw, 0.0, n - 1.0)
    cell = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    inr = jnp.logical_and(praw > 0.0, praw < n - 1.0).astype(jnp.float32)
    return cell, c - cell.astype(jnp.float32), inr

  pbar0 = raybar_ref[0]
  dbar0 = raybar_ref[1]
  pbar_all, dbar_all = jax.lax.fori_loop(
      0, refetch, step_body, (pbar0, dbar0))
  raybar_ref[0] = pbar_all
  raybar_ref[1] = dbar_all


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_samples", "near", "step_size",
                     "block_size", "window", "refetch_every", "max_deg",
                     "interpret", "interp_precision", "so3_precision"))
def _march_bwd_impl(spec, data, traj, cts, so3_mats, bstack, alpha, near,
                    step_size, num_samples, block_size, window,
                    refetch_every, max_deg, interpret,
                    interp_precision="highest", so3_precision="default"):
  """traj/cts: [nb, S, 11, R] march layout. Returns raw kernel outputs."""
  n = spec.ndim[0]
  w = window
  yext = w + 8
  nb = traj.shape[0]
  n_outer = num_samples // refetch_every
  width = so3_mats[1].shape[0]  # w1t: [width, width]
  in_dim = 2 * 3 * max_deg

  grid3d = data if data.ndim == 3 else data.reshape(n, n, n * 4)

  rev = lambda kk: (0, n_outer - 1 - kk, 0, 0)
  in_specs = [
      pl.BlockSpec((nb, refetch_every, 11, block_size), rev,
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((nb, refetch_every, 11, block_size), rev,
                   memory_space=pltpu.VMEM),
      pl.BlockSpec(memory_space=pl.ANY),
  ]
  inputs = [traj, cts, grid3d]
  # Transposed kernels [out, in] for the recompute, untransposed [in, out]
  # for the backward dh chains.
  for m in so3_mats:
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(m)
  for m in so3_mats:
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(jnp.transpose(m, (1, 0)))
  in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
  inputs.append(bstack)
  in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
  inputs.append(jnp.asarray(alpha, jnp.float32).reshape(1, 1))

  const = lambda *_: tuple([0] * 2)
  const3 = lambda *_: tuple([0] * 3)
  out_specs = (
      pl.BlockSpec((2, nb * 3, block_size), const3, memory_space=pltpu.VMEM),
      pl.BlockSpec((width, in_dim), const, memory_space=pltpu.VMEM),
      pl.BlockSpec((width, width), const, memory_space=pltpu.VMEM),
      pl.BlockSpec((width, width), const, memory_space=pltpu.VMEM),
      pl.BlockSpec((width, width + in_dim), const, memory_space=pltpu.VMEM),
      pl.BlockSpec((3, width), const, memory_space=pltpu.VMEM),
      pl.BlockSpec((5, width, block_size), const3, memory_space=pltpu.VMEM),
      pl.BlockSpec((1, block_size), const, memory_space=pltpu.VMEM),
  )
  out_shape = (
      jax.ShapeDtypeStruct((2, nb * 3, block_size), jnp.float32),
      jax.ShapeDtypeStruct((width, in_dim), jnp.float32),
      jax.ShapeDtypeStruct((width, width), jnp.float32),
      jax.ShapeDtypeStruct((width, width), jnp.float32),
      jax.ShapeDtypeStruct((width, width + in_dim), jnp.float32),
      jax.ShapeDtypeStruct((3, width), jnp.float32),
      jax.ShapeDtypeStruct((5, width, block_size), jnp.float32),
      jax.ShapeDtypeStruct((1, block_size), jnp.float32),
  )

  kernel = functools.partial(
      _bwd_kernel, n=n, w=w, yext=yext, block_size=block_size, nb=nb,
      refetch=refetch_every, step_size=step_size, nmin=spec.nmin,
      ndelta=spec.ndelta, max_deg=max_deg,
      interp_precision=mk._precision(interp_precision),
      so3_precision=mk._precision(so3_precision))

  return pl.pallas_call(
      kernel,
      interpret=interpret,
      grid=(n_outer,),
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=[
          pltpu.VMEM((nb, w, yext, _ZEXT * 4), jnp.float32),
          pltpu.SemaphoreType.DMA((nb,)),
      ],
  )(*inputs)


def bwd_vmem_bytes(window, refetch_every, block_size, nb, width=128):
  """Scoped-VMEM estimate for one reverse-kernel invocation."""
  yext = window + 8
  zc = _ZEXT * 4
  brick = nb * window * yext * zc * 4
  blocks = 2 * nb * refetch_every * mk._pad8(11) * block_size * 4 * 2
  carry = 2 * nb * 3 * block_size * 4
  accs = (5 * width * block_size + width * (3 * width + 2 * (width + 60))
          ) * 4
  acts = (6 * width + 2 * 60) * nb * block_size * 4  # step transients
  return brick + blocks + carry + accs + acts


def supports(spec, num_samples, batch, block_size, window, refetch_every):
  """Whether the fused reverse kernel can run this configuration."""
  if not mk.supports(spec, num_samples, batch, block_size, window,
                     refetch_every):
    return False
  nb = batch // block_size
  return bwd_vmem_bytes(window, refetch_every, block_size,
                        nb) <= mk._VMEM_BUDGET_BYTES


def march_bwd_pallas(spec, data, pos, dirs_raw, nvals, g, dpos, ddirs_raw,
                     dn, dg, segbar, so3_params, alpha, near, step_size,
                     block_size, window, refetch_every, max_deg,
                     interpret=False, interp_precision=None, traj_raw=None,
                     so3_precision=None):
  """Fused reverse sweep. Per-ray-layout inputs [batch, S, ...].

  traj_raw: optional [nb, S, 11, R] march-layout trajectory straight from
  the forward kernel (march_tiled_pallas with_raw=True). It is the exact
  tensor `pack` would rebuild from the per-ray arrays (the kernel never
  reads row 6, where raw carries real arclength and pack a zero dummy),
  so passing it skips one full relayout pass over [batch, S, 11] —
  a measured 15-20 ms floor per pass on v5e.

  Returns (origins_bar [batch, 3], directions_bar [batch, 3],
  alphabar scalar, thetabar pytree matching so3_params).
  """
  if interp_precision is None:
    interp_precision = "highest"
  if so3_precision is None:
    # "default" is the PARITY choice, not a speed shortcut: the XLA so3
    # apply differentiated by the reference gradients rounds at DEFAULT
    # (ops/mlp.py precision=None), and matching it bit-for-bit keeps the
    # ReLU masks identical (see _mlp_fwd_t). It is also ~2x MXU rate.
    so3_precision = os.environ.get("MARCH_BWD_SO3_PRECISION", "default")
  if not interpret and jax.default_backend() != "tpu":
    interpret = True
  batch, num_samples = pos.shape[:2]
  nb = batch // block_size

  # ONE packed relayout into march layout [nb, S, 11, R] for each of the
  # trajectory (unless the forward kernel's raw output is supplied) and
  # its cotangents (vs. 8+ separate reblocks in the XLA formulations).
  # MARCH_BWD_PACK picks how the rays-to-lanes transpose runs:
  #   mxu (default): contract the ray axis against a constant identity on
  #     the MXU (einsum, HIGHEST) — exact (0/1 coefficients select single
  #     addends; fp32 passthrough), and rides the matmul unit instead of
  #     XLA's strided-copy transpose (the measured relayout floor).
  #   xla: the plain jnp.transpose formulation (A/B anchor).
  pack_impl = os.environ.get("MARCH_BWD_PACK", "mxu")

  def pack(parts):
    cat = jnp.concatenate(
        [a if a.ndim == 3 else a[..., None] for a in parts], axis=-1)
    if pack_impl == "mxu":
      flat = cat.reshape(nb, block_size, num_samples * 11)
      eye = jnp.eye(block_size, dtype=cat.dtype)
      out = jnp.einsum("brm,rk->bmk", flat, eye,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=cat.dtype)
      return out.reshape(nb, num_samples, 11, block_size)
    cat = cat.reshape(nb, block_size, num_samples, 11)
    return jnp.transpose(cat, (0, 2, 3, 1))

  if traj_raw is not None:
    traj = traj_raw
  else:
    dist_dummy = jnp.zeros_like(nvals[..., 0])
    traj = pack([pos, dirs_raw, dist_dummy, nvals[..., 0], g])
  cts = pack([dpos, ddirs_raw, segbar, dn[..., 0], dg])

  mats = [so3_params["Dense_0"]["kernel"], so3_params["Dense_1"]["kernel"],
          so3_params["Dense_2"]["kernel"], so3_params["Dense_3"]["kernel"],
          so3_params["Dense_out"]["kernel"]]
  width = mats[1].shape[0]
  so3_mats = tuple(jnp.transpose(jnp.asarray(m, jnp.float32), (1, 0))
                   for m in mats)
  bstack = jnp.zeros((width, 5), jnp.float32)
  for i in range(4):
    bstack = bstack.at[:, i].set(so3_params[f"Dense_{i}"]["bias"])
  bstack = bstack.at[0:3, 4].set(so3_params["Dense_out"]["bias"])

  (raybar, dw0t, dw1t, dw2t, dw3t, dwoutt, dbias_rows,
   dalpha_rows) = _march_bwd_impl(
       spec, data, traj, cts, so3_mats, bstack, alpha, near, step_size,
       num_samples, block_size, window, refetch_every, max_deg, interpret,
       interp_precision=interp_precision, so3_precision=so3_precision)

  pbar = jnp.transpose(raybar[0].reshape(nb, 3, block_size),
                       (0, 2, 1)).reshape(batch, 3)
  dbar = jnp.transpose(raybar[1].reshape(nb, 3, block_size),
                       (0, 2, 1)).reshape(batch, 3)
  origins_bar = pbar
  directions_bar = near * pbar + dbar

  alphabar = jnp.sum(dalpha_rows).astype(jnp.float32).reshape(())
  thetabar = {
      "Dense_0": {"kernel": jnp.transpose(dw0t, (1, 0)),
                  "bias": jnp.sum(dbias_rows[0], axis=-1)},
      "Dense_1": {"kernel": jnp.transpose(dw1t, (1, 0)),
                  "bias": jnp.sum(dbias_rows[1], axis=-1)},
      "Dense_2": {"kernel": jnp.transpose(dw2t, (1, 0)),
                  "bias": jnp.sum(dbias_rows[2], axis=-1)},
      "Dense_3": {"kernel": jnp.transpose(dw3t, (1, 0)),
                  "bias": jnp.sum(dbias_rows[3], axis=-1)},
      "Dense_out": {"kernel": jnp.transpose(dwoutt, (1, 0)),
                    "bias": jnp.sum(dbias_rows[4][0:3], axis=-1)},
  }
  return origins_bar, directions_bar, alphabar, thetabar
