"""Pallas TPU kernel: fused tile-coherent eikonal march.

Fuses the whole march for ALL ray blocks into a single Mosaic kernel: per
reuse-window, one aligned DMA per block pulls a grid window from HBM into
VMEM; each step builds trilinear one-hot weights on the VPU, interpolates
with a two-stage MXU contraction, optionally refines the gradient with the
so3 MLP (annealed PE + 4x128 skip-MLP + Rodrigues, the "all"-stage path),
and Euler-integrates. Ray state lives in VMEM scratch across the sequential
window iterations; the per-step trilinear weight matrices never touch HBM
(they are the XLA marcher's bandwidth bottleneck: a [blocks, R, W^3] f32
intermediate per step).

Layout: everything is TRANSPOSED — rays live on the lane (minor) dimension.
Ray state is [nb*3, R] (coordinates on sublanes), weights are [window, R],
interpolated values come out as [4, R] rows that feed the Euler update
directly. In the naive [R, 3] layout every elementwise op costs R/8 vector
registers at 3/128 lane occupancy; lane-packing rays makes the per-step
scalar math ~10x denser, and the Euler update for all blocks fuses into one
[nb*3, R] op. The kernel grid is (num_windows,), so the sequential-step
count is num_samples regardless of block count.

Mosaic DMA slices must be (8, 128)-tile aligned in the minor two dims. The
grid is laid out [N, N, N*4] (z fused with channels); the window is w voxels
in x (arbitrary origin), yext = w + 8 in y (8-aligned origin), and 64 in z
(32-aligned origin). Coverage per axis (max cell extent without clamping):
x: w-2, y: w-1, z: 31 — at least the XLA marcher's `window=w` coverage on
every axis. Out-of-window cells are clamped and counted (oow) exactly like
the XLA marcher; callers verify oow == 0 for exactness.

Parity targets: rnerf/eikonal_utils.py:29-49 (Euler step), ior_utils.py:
188-223 (trilinear), 225-259 (so3 head). Cross-tested against
ops/eikonal_tiled.march_tiled (tests/test_pallas_march.py) and through it
against the reference scan (tests/test_reference_parity.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenerfro_tpu.ops import math as math_ops

_ZEXT = 64  # z window extent (voxels); 32-aligned origin => covers extent 31
# Default interpolation matmul precision (HIGHEST == fp32-exact, required
# for bit-parity with the XLA marcher; "high" == bf16x3 halves the MXU
# passes of the per-step one-hot contractions — the march's dominant cost
# — at a small trajectory perturbation, quality-gated via
# scripts/validate_quality.py). Callers override via the march_interp
# config flag; MARCH_INTERP_PRECISION is the env ablation knob.
_INTERP_PRECISION = __import__("os").environ.get(
    "MARCH_INTERP_PRECISION", "highest")


def _precision(name):
  return getattr(jax.lax.Precision, name.upper())
# Scoped-VMEM budget for one kernel invocation. The kernel advances every
# ray block per grid step, so its scratch (grid windows + transposes + ray
# state) and double-buffered output scale LINEARLY with the block count;
# Mosaic's scoped-vmem stack is 16 MB and also holds loop temporaries and
# spills the model below can't see. Additionally, a SMALL grid (the
# memory_space=ANY operand) may be placed entirely in VMEM by the compiler
# — measured ~10.5 MB of nb-independent scoped use with a 4 MB grid — so
# the grid's footprint is charged against the budget when it can plausibly
# be VMEM-resident. Batches needing more blocks are split into sequential
# kernel calls (march_tiled_pallas).
_VMEM_BUDGET_BYTES = 13 * 2**20
_GRID_VMEM_RESIDENT_MAX = 6 * 2**20


def _pad8(x):
  return -(-x // 8) * 8


def _per_block_vmem_bytes(window, refetch_every, block_size, unroll=1,
                          so3=False, emit_rows=11, sub_rows=0):
  """Scoped-VMEM bytes one ray block contributes to a kernel invocation.

  Minor-two dims of every buffer are (8, 128)-tile padded, hence the
  sublane rounding on the second-minor extents. Intentionally conservative
  (the fitted variable cost at w16 is ~0.43 MB/block; this model charges
  ~1.1 MB): splitting into a few extra sequential calls is cheap, a
  scoped-vmem compile failure is not.

  A fully-unrolled step loop keeps part of each step's temporaries (the
  [w*yext, R] one-hot matrix dominates) live on Mosaic's scoped stack
  instead of reusing one iteration's slots. The 0.75 factor is fitted to
  compile-probe ground truth at 512^3/nb4: w8/w16 fit at full unroll,
  w24 OOMs at both r8 (17.99 MB vs the 16 MB stack) and r4.

  emit_rows is the dense-output channel count (11 full / 7 lean);
  sub_rows charges the VMEM-resident jittered-subsample output block
  ([num_coarse, 7, R] per ray block) when the in-kernel subsample is on.
  """
  yext = window + 8
  zc = _ZEXT * 4
  win_scratch = window * _pad8(yext) * zc * 4   # grid window (VMEM scratch)
  tr_scratch = zc * window * yext * 4           # transposed window scratch
  out_block = refetch_every * _pad8(emit_rows) * block_size * 4 * 2  # dbl-buf
  sub_block = sub_rows * _pad8(7) * block_size * 4  # resident whole-march
  state = 3 * _pad8(3) * block_size * 4
  unrolled = 0
  if unroll > 1:
    step_rows = 0.75 * window * yext + (512 if so3 else 0)
    unrolled = int((unroll - 1) * step_rows * block_size * 4)
  return win_scratch + tr_scratch + out_block + sub_block + state + unrolled


def max_blocks_per_call(window, refetch_every, block_size, grid_bytes=0,
                        unroll=1, so3=False, emit_rows=11, sub_rows=0):
  """Largest block count whose scratch+output staging fits scoped VMEM."""
  fixed = 2 * grid_bytes if grid_bytes <= _GRID_VMEM_RESIDENT_MAX else 0
  avail = _VMEM_BUDGET_BYTES - fixed
  return max(1, avail // _per_block_vmem_bytes(window, refetch_every,
                                               block_size, unroll, so3,
                                               emit_rows, sub_rows))


def _supports(spec, num_samples, batch, block_size, window, refetch_every):
  """Whether the fused kernel can run this configuration."""
  n = spec.ndim[0]
  yext = window + 8
  return (spec.ndim[0] == spec.ndim[1] == spec.ndim[2]
          and n % 32 == 0 and n >= _ZEXT and n >= yext
          # Mosaic HBM slices must be sublane-aligned in the second-minor
          # dim: the y window extent must be a multiple of 8 (window 8,
          # 16, 24, ...). Other windows fall back to the XLA tiled marcher.
          and yext % 8 == 0
          and batch % block_size == 0
          and num_samples % refetch_every == 0
          and block_size % 128 == 0)


def mosaic_off():
  """True when Mosaic compiles are administratively unavailable on TPU.

  Drivers set SAMPLENERFRO_MOSAIC=0 after utils/mosaic_probe.py finds the
  remote-compile relay unresponsive (a hung relay blocks the FIRST
  pallas_call forever — see the probe module). Every capability check
  consults this, so the whole marcher stack (forward, lean emit, reverse
  sweep, selfcheck arms) structurally falls back to the XLA tiled path
  instead of hanging. CPU/interpret-mode pallas needs no relay and is
  never gated.
  """
  import os  # noqa: PLC0415
  return (os.environ.get("SAMPLENERFRO_MOSAIC") == "0"
          and jax.default_backend() == "tpu")


def supports(spec, num_samples, batch, block_size=256, window=8,
             refetch_every=8):
  """Public capability check for callers choosing a marcher."""
  return not mosaic_off() and _supports(spec, num_samples, batch,
                                        block_size, window, refetch_every)


def supports_lean(spec, num_samples, batch, num_coarse, block_size=256,
                  window=8, refetch_every=8):
  """Capability check for the lean-emit + in-kernel-subsample variant."""
  return (not mosaic_off()
          and _supports(spec, num_samples, batch, block_size, window,
                        refetch_every)
          and num_coarse > 0 and num_samples % num_coarse == 0)


def _axis_rows(nb, vals):
  """[nb*3, 1] column whose row r holds vals[r % 3] (python floats)."""
  sub = jax.lax.broadcasted_iota(jnp.int32, (nb * 3, 1), 0) % 3
  return jnp.where(sub == 0, vals[0], jnp.where(sub == 1, vals[1], vals[2]))


def _annealed_pe_t(x, alpha, max_deg):
  """Annealed PE of [3, R] -> [6*max_deg, R] (ops/math.py:annealed_pos_enc).

  Row order per degree d: [sin(x*2^d)*w_d (3 rows), sin(x*2^d + pi/2)*w_d
  (3 rows)]; w_d the Nerfies cosine easing window at alpha*max_deg.
  (Measured: Mosaic's sin is bit-identical to XLA's at the full PE arg
  range — scripts/debug/dbg_sin.py on v5e — so no in-kernel range
  reduction is needed.)
  """
  feats = []
  for d in range(max_deg):
    xb = x * (2.0 ** d)
    wd = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(alpha * max_deg - d, 0.0, 1.0)
                            + jnp.pi))
    feats.append(jnp.sin(xb) * wd)
    feats.append(jnp.sin(xb + 0.5 * jnp.pi) * wd)
  return jnp.concatenate(feats, axis=0)


def _row_norm(x, eps=1e-6):
  return jnp.sqrt(jnp.maximum(jnp.sum(x**2, axis=0, keepdims=True), eps))


def _cross_rows(a, b):
  return jnp.concatenate([
      a[1:2] * b[2:3] - a[2:3] * b[1:2],
      a[2:3] * b[0:1] - a[0:1] * b[2:3],
      a[0:1] * b[1:2] - a[1:2] * b[0:1],
  ], axis=0)


def _so3_refine_t(rp, g, alpha, so3_refs, max_deg,
                  precision=jax.lax.Precision.DEFAULT):
  """so3 refinement on transposed [3, R] tensors.

  so3_refs holds PRE-TRANSPOSED kernels (WkT: [out, in]) and a [width, 5]
  bias stack (cols 0..3 hidden, col 4 rows 0:3 = output bias), so every
  layer is WkT @ h with activations [width, R] and biases [width, 1].
  Parity: models/path_sampler.py wrapper_grad_mlp + ops/eikonal.py
  rodrigues_rotate. precision: MXU precision of the MLP matmuls
  ($MARCH_SO3_PRECISION). "default" IS the parity setting: the XLA so3
  head it mirrors (ops/mlp.py:mlp_apply, precision=None) rounds at
  DEFAULT, and the transposed layout is bit-identical to XLA's at that
  precision (measured on v5e: 0/6.3M preact mismatches); "highest" is
  kept as an A/B anchor but actually rounds DIFFERENTLY from the XLA
  reference (bf16-ulp-level), flipping ReLU masks.
  """
  w0t, w1t, w2t, w3t, woutt, b = so3_refs

  def matm(wt, h):
    return jax.lax.dot_general(wt[:], h, (((1,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)

  x = _annealed_pe_t(rp, alpha, max_deg)
  bv = b[:]
  h = jnp.maximum(matm(w0t, x) + bv[:, 0:1], 0.0)
  h = jnp.maximum(matm(w1t, h) + bv[:, 1:2], 0.0)
  h = jnp.maximum(matm(w2t, h) + bv[:, 2:3], 0.0)
  h = jnp.concatenate([h, x], axis=0)  # skip-concat after layer 2
  h = jnp.maximum(matm(w3t, h) + bv[:, 3:4], 0.0)
  raw = matm(woutt, h) + bv[0:3, 4:5]

  theta = _row_norm(raw)
  e = raw / theta
  a = _row_norm(g)
  v = g / a
  cos_t = jnp.cos(theta)
  refined = a * (cos_t * v + jnp.sin(theta) * _cross_rows(e, v)
                 + (1 - cos_t) * jnp.sum(e * v, axis=0, keepdims=True) * e)
  gnorm = jnp.sqrt(jnp.sum(g**2, axis=0, keepdims=True))
  return jnp.where(gnorm > 1e-3, refined, g)


def _march_kernel(refs, *, n, w, yext, block_size, nb, refetch, near,
                  step_size, nmin, ndelta, use_pred_grad, max_deg, unroll,
                  interp_precision, so3_precision=None, emit_rows=11,
                  num_path=None, skip_brick=None):
  refs = list(refs)
  origins_ref, dirs_ref, grid_hbm, selmat_ref = refs[:4]
  idx = 4
  if use_pred_grad:
    alpha_ref, w0t, w1t, w2t, w3t, woutt, bstack = refs[idx:idx + 7]
    idx += 7
    so3_refs = (w0t, w1t, w2t, w3t, woutt, bstack)
    alpha = alpha_ref[0, 0]
  else:
    so3_refs = None
    alpha = None
  if num_path is not None:
    jitter_ref = refs[idx]
    idx += 1
  if skip_brick is not None:
    uflags_ref, namb_ref = refs[idx:idx + 2]
    idx += 2
  out_ref = refs[idx]
  idx += 1
  if num_path is not None:
    sub_ref = refs[idx]
    idx += 1
  oow_ref, state_ref, brick_ref, bt_ref, sem_ref = refs[idx:]
  k = pl.program_id(0)  # reuse-window index (sequential)
  r = block_size
  zext = _ZEXT
  wy = w * yext
  zc = zext * 4

  nmin_col = _axis_rows(nb, nmin)
  ndelta_col = _axis_rows(nb, ndelta)

  @pl.when(k == 0)
  def _init():
    o = origins_ref[:]  # [nb*3, R]
    d = dirs_ref[:]
    state_ref[0] = o + near * d  # rp
    state_ref[1] = d  # rd
    state_ref[2] = jnp.full((nb * 3, r), near, jnp.float32)  # rt (x3 rows)
    oow_ref[0, 0] = 0

  def cells_of(p):
    """[nb*3, R] positions -> (cell int32, frac) in grid coords."""
    c = jnp.clip((p - nmin_col) / ndelta_col, 0.0, n - 1.0)
    cell = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    return cell, c - cell.astype(jnp.float32)

  rp_all = state_ref[0]
  rd_all = state_ref[1]
  cell_now, _ = cells_of(rp_all)
  cell_pred, _ = cells_of(rp_all + refetch * step_size * rd_all)
  cmin = jnp.minimum(jnp.min(cell_now, axis=1), jnp.min(cell_pred, axis=1))
  cmax = jnp.maximum(jnp.max(cell_now, axis=1), jnp.max(cell_pred, axis=1))

  # Per-block window origins + DMAs (start all, then wait all). With
  # skip_brick set, a per-block "uniform" scalar is ANDed from the
  # host-precomputed per-brick uniformity flags covering the window
  # extent; a uniform window's DMA + transpose (and, per step, its
  # interp matmuls + so3 MLP) are skipped entirely — in n==ambient
  # free space with g == 0 the Euler update is exactly p += h/n_amb * d.
  worigin_scalars = []
  dmas = []
  uni_flags = [None] * nb
  if skip_brick is not None:
    nbk = n // skip_brick
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
    if skip_brick is None:
      dma.start()
    else:
      bx0, bx1 = wx // skip_brick, (wx + w - 1) // skip_brick
      by0, by1 = ybase // skip_brick, (ybase + yext - 1) // skip_brick
      bz0, bz1 = zbase // skip_brick, (zbase + zext - 1) // skip_brick
      u = jnp.int32(1)
      for bx in (bx0, bx1):
        for by in (by0, by1):
          for bz in (bz0, bz1):
            u = u * uflags_ref[bx * nbk + by, bz]
      uni_flags[b] = u

      @pl.when(u == 0)
      def _start(dma=dma):
        dma.start()
    dmas.append(dma)
  worigin_col = jnp.concatenate(
      [s.reshape(1, 1) for s in worigin_scalars], axis=0)  # [nb*3, 1]
  for b, dma in enumerate(dmas):
    if uni_flags[b] is None:
      dma.wait()
    else:
      @pl.when(uni_flags[b] == 0)
      def _wait(dma=dma):
        dma.wait()

  # Transpose each block's window once per reuse period: [wy, zc] -> [zc, wy]
  # so the per-step contraction is a plain (1,)x(0,) matmul.
  for b in range(nb):
    if uni_flags[b] is None:
      bt_ref[b] = jnp.transpose(brick_ref[b].reshape(wy, zc), (1, 0))
    else:
      @pl.when(uni_flags[b] == 0)
      def _tr(b=b):
        bt_ref[b] = jnp.transpose(brick_ref[b].reshape(wy, zc), (1, 0))

  # Sublane iotas for the one-hot weight rows.
  sub_wy = jax.lax.broadcasted_iota(jnp.int32, (wy, 1), 0)
  ix = sub_wy // yext
  iy = sub_wy % yext
  izc = jax.lax.broadcasted_iota(jnp.int32, (zc, 1), 0) // 4
  selt = selmat_ref[:]  # [4, zc] channel-select one-hot

  # Per-row clamp bounds (axis pattern x, y, z).
  bound_col = _axis_rows(nb, (float(w - 2), float(yext - 2),
                              float(zext - 2))).astype(jnp.int32)

  def axis_w(idx_col, rel_row, frac_row):
    """One-hot-with-weights [rows, R] from sublane iota and lane rows."""
    return (jnp.where(idx_col == rel_row, 1.0 - frac_row, 0.0)
            + jnp.where(idx_col == rel_row + 1, frac_row, 0.0))

  def step_body(i, carry):
    rp_all, rd_all, rt_all, oow_vec = carry
    cell, frac = cells_of(rp_all)
    rel = cell - worigin_col
    # Accumulate violations as a vector; the scalar reduction happens once
    # per reuse window (a per-step cross-lane reduce costs ~1.5 ms total).
    oow_vec = oow_vec + ((rel < 0).astype(jnp.int32)
                         + (rel > bound_col).astype(jnp.int32))
    rel = jnp.clip(rel, 0, bound_col)

    t_blocks = []
    for b in range(nb):
      relx = rel[3 * b:3 * b + 1, :]
      rely = rel[3 * b + 1:3 * b + 2, :]
      relz = rel[3 * b + 2:3 * b + 3, :]
      fx = frac[3 * b:3 * b + 1, :]
      fy = frac[3 * b + 1:3 * b + 2, :]
      fz = frac[3 * b + 2:3 * b + 3, :]

      # Stage 1: (x, y) one-hot contraction on the MXU -> [zc, R], then the
      # per-ray z-interp weight on the VPU.
      def _interp(relx=relx, rely=rely, relz=relz, fx=fx, fy=fy, fz=fz, b=b):
        wxyt = axis_w(ix, relx, fx) * axis_w(iy, rely, fy)
        t_zc = jax.lax.dot_general(
            bt_ref[b], wxyt, (((1,), (0,)), ((), ())),
            precision=interp_precision, preferred_element_type=jnp.float32)
        t_zc = t_zc * axis_w(izc, relz, fz)
        # Stage 2: channel-select matmul -> [4, R].
        return jax.lax.dot_general(
            selt, t_zc, (((1,), (0,)), ((), ())),
            precision=interp_precision, preferred_element_type=jnp.float32)

      if uni_flags[b] is None:
        vals = _interp()
      else:
        # Uniform window: interp of the constant region is n_amb for the
        # n channel (exact constant vs the matmul's +-1-ulp weight-sum
        # reassociation) and exactly 0 for the g channels.
        namb = namb_ref[0, 0]
        vals = jax.lax.cond(
            uni_flags[b] == 0, _interp,
            lambda: jnp.concatenate(
                [jnp.full((1, r), namb, jnp.float32),
                 jnp.zeros((3, r), jnp.float32)], axis=0))
      t_blocks.append(vals)

    nrows = [t_blocks[b][0:1, :] for b in range(nb)]
    grows = [t_blocks[b][1:4, :] for b in range(nb)]

    n_rep = jnp.concatenate([row for row in nrows for _ in range(3)], axis=0)
    g_all = jnp.concatenate(grows, axis=0)  # [nb*3, R]
    if use_pred_grad:
      refined = []
      for b in range(nb):
        def _so3(b=b):
          return _so3_refine_t(rp_all[3 * b:3 * b + 3, :], grows[b], alpha,
                               so3_refs, max_deg,
                               precision=(so3_precision
                                          or jax.lax.Precision.HIGHEST))
        if uni_flags[b] is None:
          refined.append(_so3())
        else:
          # g == 0 in a uniform window, so the |g| > 1e-3 mask inside
          # _so3_refine_t returns g (= 0) identically: skip the MLP.
          refined.append(jax.lax.cond(
              uni_flags[b] == 0, _so3,
              lambda: jnp.zeros((3, r), jnp.float32)))
      upd_all = jnp.concatenate(refined, axis=0)
    else:
      upd_all = g_all

    next_rp = rp_all + step_size / n_rep * rd_all
    next_rd = rd_all + step_size * upd_all
    d2 = (rp_all - next_rp)**2
    seg = jnp.sum(d2.reshape(nb, 3, r), axis=1)  # [nb, R]
    rt_next = rt_all + jnp.sqrt(seg)

    for b in range(nb):
      state7 = [
          rp_all[3 * b:3 * b + 3, :],
          rd_all[3 * b:3 * b + 3, :],
          rt_all[b:b + 1, :],
      ]
      if emit_rows == 11:
        out_ref[b, i] = jnp.concatenate(
            state7 + [nrows[b], grows[b]], axis=0)  # [11, R]
      else:
        out_ref[b, i] = jnp.concatenate(state7, axis=0)  # [7, R]

    if num_path is not None:
      # In-kernel jittered subsample: each global step s belongs to coarse
      # bin c = s // num_path; it is the bin's selected sample iff
      # jitter[c] == s (jitter[c] is in [c*num_path, (c+1)*num_path) by
      # construction, models/nerf.py). The [nb, Nc, 7, R] output block is
      # VMEM-resident across the whole march (same block every grid step)
      # and every bin row is written exactly once.
      s_glob = k * refetch + i
      c = s_glob // num_path
      sel = jitter_ref[0, c] == s_glob

      @pl.when(sel)
      def _store_sub():
        for b in range(nb):
          sub_ref[b, c] = jnp.concatenate([
              rp_all[3 * b:3 * b + 3, :],
              rd_all[3 * b:3 * b + 3, :],
              rt_all[b:b + 1, :],
          ], axis=0)  # [7, R]

    return next_rp, next_rd, rt_next, oow_vec

  rt_all = state_ref[2][:nb, :]
  oow_vec0 = jnp.zeros((nb * 3, r), jnp.int32)
  rp_all, rd_all, rt_all, oow_vec = jax.lax.fori_loop(
      0, refetch, step_body,
      (state_ref[0], state_ref[1], rt_all, oow_vec0), unroll=unroll)

  state_ref[0] = rp_all
  state_ref[1] = rd_all
  state_ref[2] = jnp.concatenate(
      [rt_all, jnp.zeros((2 * nb, r), jnp.float32)], axis=0)
  oow_ref[0, 0] = oow_ref[0, 0] + jnp.sum(oow_vec)


def uniformity_flags(grid3d, n, brick):
  """Per-brick uniformity flags for the free-space skip.

  A brick is "uniform" when its gradient channels are identically 0 AND
  its n channel equals the grid's corner "ambient" value (free space).
  Any window covered entirely by uniform bricks interpolates to exactly
  (n_amb, 0, 0, 0) at every in-window stencil, so the march's Euler
  update degenerates to the straight line p += h/n_amb * d. Returns
  (uni [nbk, nbk, nbk] bool, namb scalar).

  Layout note: every reshape below is a contiguous row-major split and
  the first (large) reduction runs over the minormost (lane) axis — the
  naive 7-D reshape + strided multi-axis `jnp.all` costs >100 ms at
  512^3 on v5e (a relayout of the whole 2 GB grid), this form ~3 ms.
  Production marches avoid even that by passing HOST-precomputed flags
  (host_skip_flags; threaded via the model's 'grid' variable
  collection) — the grid is static per scene, so the flags are too.
  """
  nbk = n // brick
  g = grid3d.reshape(n, n, n * 4)
  namb = g[0, 0, 0]
  tgt = jnp.tile(jnp.concatenate(
      [namb.reshape(1), jnp.zeros((3,), grid3d.dtype)]), n)
  eq = g == tgt  # [n, n, n*4]
  r1 = jnp.all(eq.reshape(n, n, nbk, brick * 4), axis=-1)  # lane reduce
  r2 = jnp.all(r1.reshape(n, nbk, brick, nbk), axis=2)
  uni = jnp.all(r2.reshape(nbk, brick, nbk, nbk), axis=1)
  return uni, namb


def host_skip_flags(grid_flat, n, brick=None):
  """Host (numpy) precompute of the free-space-skip flag arrays.

  Returns (uni [nbk*nbk, nbk] float32, namb [1, 1] float32) in the
  layout `_march_pallas_impl` feeds the kernel's SMEM refs, or None when
  the grid shape does not support the skip (not divisible by the brick
  size / fewer than 2 bricks per axis). float32 (not int) so the arrays
  thread through differentiable call paths with ordinary zero
  cotangents. One numpy pass per scene load — the flags are static.
  """
  brick = _SKIP_BRICK if brick is None else brick
  if n % brick != 0 or n // brick < 2:
    return None
  nbk = n // brick
  g = np.asarray(grid_flat, np.float32).reshape(n, n, n * 4)
  namb = g[0, 0, 0]
  tgt = np.tile(np.array([namb, 0.0, 0.0, 0.0], np.float32), n)
  r1 = np.all(g.reshape(n, n, nbk, brick * 4) == tgt.reshape(nbk, brick * 4),
              axis=-1)
  r2 = np.all(r1.reshape(n, nbk, brick, nbk), axis=2)
  uni = np.all(r2.reshape(nbk, brick, nbk, nbk), axis=1)
  return (uni.reshape(nbk * nbk, nbk).astype(np.float32),
          np.full((1, 1), namb, np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_samples", "near", "step_size",
                     "block_size", "window", "refetch_every", "max_deg",
                     "unroll", "interpret", "normalize_dirs",
                     "interp_precision", "emit", "skip_uniform"))
def _march_pallas_impl(spec, data, origins, directions, near, step_size,
                       num_samples, so3_inputs, block_size, window,
                       refetch_every, max_deg, unroll, interpret,
                       normalize_dirs=True, interp_precision="highest",
                       emit="full", jitter=None, skip_uniform=False,
                       skip_flags=None):
  n = spec.ndim[0]
  w = window
  yext = w + 8
  zext = _ZEXT
  batch = origins.shape[0]
  nb = batch // block_size
  num_windows = num_samples // refetch_every
  use_pred_grad = so3_inputs is not None
  emit_rows = 11 if emit == "full" else 7
  num_coarse = None if jitter is None else jitter.shape[-1]
  num_path = None if jitter is None else num_samples // num_coarse
  # Uniform-window free-space skip: brick granularity _SKIP_BRICK (32)
  # needs the grid divisible and at least 2 bricks per axis. The in-kernel
  # uniformity test ANDs the 8 corner bricks of the window extent, which
  # is complete only while every axis extent spans at most 2 bricks: the
  # largest unaligned extent covering 2 bricks is _SKIP_BRICK + 1, so the
  # y extent (w + 8, the widest unaligned axis) must not exceed it. The z
  # extent (64 = 2 bricks) is 32-aligned, hence always exactly 2 bricks.
  skip_brick = (_SKIP_BRICK if skip_uniform and n % _SKIP_BRICK == 0
                and n // _SKIP_BRICK >= 2
                and yext <= _SKIP_BRICK + 1 else None)

  # March-layout grid (see eikonal_tiled): pass [n, n, n*4] to avoid a
  # per-call HBM relayout of the flat shape.
  grid3d = data if data.ndim == 3 else data.reshape(n, n, n * 4)
  # [batch, 3] -> [nb*3, R]: block-major rows, rays on lanes.
  o_rows = jnp.transpose(origins.reshape(nb, block_size, 3),
                         (0, 2, 1)).reshape(nb * 3, block_size)
  d_rows = jnp.transpose(directions.reshape(nb, block_size, 3),
                         (0, 2, 1)).reshape(nb * 3, block_size)
  selmat = jnp.asarray(
      (np.arange(4)[:, None] == np.arange(zext * 4)[None, :] % 4)
      .astype(np.float32))  # [4, zc]

  in_specs = [
      pl.BlockSpec((nb * 3, block_size), lambda k: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((nb * 3, block_size), lambda k: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec(memory_space=pl.ANY),
      pl.BlockSpec(memory_space=pltpu.VMEM),
  ]
  inputs = [o_rows, d_rows, grid3d, selmat]
  if use_pred_grad:
    alpha, so3 = so3_inputs
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(jnp.asarray(alpha, jnp.float32).reshape(1, 1))
    mats = [so3["Dense_0"]["kernel"], so3["Dense_1"]["kernel"],
            so3["Dense_2"]["kernel"], so3["Dense_3"]["kernel"],
            so3["Dense_out"]["kernel"]]
    feat = 2 * 3 * max_deg
    assert mats[0].shape[0] == feat, (mats[0].shape, feat)
    width = mats[0].shape[1]
    bstack = jnp.zeros((width, 5), jnp.float32)
    for i in range(4):
      bstack = bstack.at[:, i].set(so3[f"Dense_{i}"]["bias"])
    bstack = bstack.at[0:3, 4].set(so3["Dense_out"]["bias"])
    for m in mats:
      in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
      inputs.append(jnp.transpose(jnp.asarray(m, jnp.float32), (1, 0)))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(bstack)
  if jitter is not None:
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(jnp.asarray(jitter, jnp.int32).reshape(1, num_coarse))
  if skip_brick is not None:
    nbk = n // skip_brick
    if skip_flags is not None:
      # Host-precomputed (host_skip_flags): static per scene, zero
      # per-step cost. The in-jit fallback below re-derives them from
      # the grid every call (~3 ms at 512^3) — fine for one-shot
      # callers (selfcheck, tests), wasteful in a train step.
      uni32 = skip_flags[0].astype(jnp.int32).reshape(nbk * nbk, nbk)
      namb32 = skip_flags[1].astype(jnp.float32).reshape(1, 1)
    else:
      uni, namb = uniformity_flags(grid3d, n, skip_brick)
      uni32 = uni.astype(jnp.int32).reshape(nbk * nbk, nbk)
      namb32 = namb.astype(jnp.float32).reshape(1, 1)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(uni32)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(namb32)

  def wrapped_kernel(*refs):
    return _march_kernel(
        refs, n=n, w=w, yext=yext, block_size=block_size, nb=nb,
        refetch=refetch_every, near=near, step_size=step_size,
        nmin=spec.nmin, ndelta=spec.ndelta, use_pred_grad=use_pred_grad,
        max_deg=max_deg, unroll=unroll,
        interp_precision=_precision(interp_precision),
        so3_precision=_precision(
            __import__("os").environ.get("MARCH_SO3_PRECISION", "default")),
        emit_rows=emit_rows, num_path=num_path, skip_brick=skip_brick)

  out_specs = [
      pl.BlockSpec((nb, refetch_every, emit_rows, block_size),
                   lambda k: (0, k, 0, 0), memory_space=pltpu.VMEM),
  ]
  out_shape = [
      jax.ShapeDtypeStruct((nb, num_samples, emit_rows, block_size),
                           jnp.float32),
  ]
  if jitter is not None:
    # Whole-array block revisited every grid step: stays VMEM-resident
    # for the march, written back to HBM once at the end.
    out_specs.append(pl.BlockSpec((nb, num_coarse, 7, block_size),
                                  lambda k: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct(
        (nb, num_coarse, 7, block_size), jnp.float32))
  out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
  out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))

  outs = pl.pallas_call(
      wrapped_kernel,
      interpret=interpret,
      grid=(num_windows,),
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      scratch_shapes=[
          pltpu.VMEM((3, nb * 3, block_size), jnp.float32),
          pltpu.VMEM((nb, w, yext, zext * 4), jnp.float32),
          pltpu.VMEM((nb, zext * 4, w * yext), jnp.float32),
          pltpu.SemaphoreType.DMA((nb,)),
      ],
  )(*inputs)
  raw = outs[0]  # [nb, S, C, R] march-layout trajectory (kernel output)
  sub = outs[1] if jitter is not None else None
  oow = outs[-1]

  # [nb, S, C, R] -> per-ray arrays [batch, S, ...]. `raw` is returned
  # too: it is the exact layout the fused REVERSE kernel streams
  # (march_bwd_kernel), so the all-stage vjp can keep it as a residual
  # instead of re-packing the per-ray arrays (saves one full [batch, S,
  # 11] relayout pass, the measured 15-20 ms floor on v5e). Unused, it is
  # DCE'd under the enclosing jit (it aliases the pallas output buffer).
  out = _to_per_ray(raw, batch, num_samples, emit_rows)
  pos = out[..., 0:3]
  dirs = out[..., 3:6]
  if normalize_dirs:
    dirs = math_ops.safe_l2_normalize(dirs)
  dist = out[..., 6]
  nvals = out[..., 7:8] if emit_rows == 11 else None
  g = out[..., 8:11] if emit_rows == 11 else None
  if sub is not None:
    sub = _to_per_ray(sub, batch, num_coarse, 7)
    sub_pos = sub[..., 0:3]
    sub_dir = sub[..., 3:6]
    if normalize_dirs:
      sub_dir = math_ops.safe_l2_normalize(sub_dir)
    sub_out = (sub_pos, sub_dir, sub[..., 6])
  else:
    sub_out = None
  return pos, dirs, dist, nvals, g, sub_out, oow[0, 0], raw


def _to_per_ray(march_arr, batch, steps, rows):
  """[nb, steps, rows, R] march layout -> per-ray [batch, steps, rows].

  MARCH_EPILOGUE picks the lanes->sublanes relayout implementation:
    xla (default): plain jnp.transpose.
    mxu: contract the ray axis against a constant identity on the MXU
      (bit-exact: 0/1 coefficients select single addends) — the same
      trick as the reverse sweep's cotangent pack (march_bwd_kernel).
  """
  nb, _, _, r = march_arr.shape
  if __import__("os").environ.get("MARCH_EPILOGUE", "xla") == "mxu":
    flat = march_arr.reshape(nb, steps * rows, r)
    eye = jnp.eye(r, dtype=march_arr.dtype)
    out = jnp.einsum("bmr,rk->bkm", flat, eye,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=march_arr.dtype)
    return out.reshape(batch, steps, rows)
  return jnp.transpose(march_arr, (0, 3, 1, 2)).reshape(batch, steps, rows)


# MARCH_UNROLL pins the per-window step-loop unroll (Mosaic supports only
# 1 or full); 0/unset = auto: full unroll when it fits scoped VMEM at the
# chosen block count (measured ~2% faster end-to-end on v5e), else 1.
_ENV_UNROLL = int(__import__("os").environ.get("MARCH_UNROLL", "0"))

# Uniform-window free-space skip (MARCH_SKIP=uniform): brick granularity
# of the host-precomputed uniformity flags. 32 keeps the SMEM flag array
# at [256, 16] int32 (16 KB) for 512^3 grids.
_SKIP_BRICK = 32
SKIP_BRICK = _SKIP_BRICK  # public: models/path_sampler.py sizes its
# precomputed-flag 'grid' variables from it.
_ENV_SKIP = __import__("os").environ.get("MARCH_SKIP", "0") in (
    "uniform", "1")


def march_tiled_pallas(spec, data, origins, directions, near, step_size,
                       num_samples, block_size=256, window=8,
                       refetch_every=8, so3_params=None, annealed_alpha=1.0,
                       max_deg=10, unroll=None, interpret=False,
                       normalize_dirs=True, interp_precision=None,
                       with_raw=False, skip_uniform=None):
  """Fused-kernel twin of eikonal_tiled.march_tiled (same returns).

  Args match march_tiled; instead of a pred_grad_fn closure, the "all"-stage
  so3 refinement is enabled by passing `so3_params` (the ops/mlp.py pytree:
  Dense_0..3 + Dense_out) plus `annealed_alpha`/`max_deg` — the kernel
  evaluates PE + MLP + Rodrigues inline per step.

  with_raw=True appends the kernel's march-layout trajectory
  [nb, S, 11, R] to the returns — the exact input layout of the fused
  reverse kernel (ops/pallas/march_bwd_kernel.py), letting the all-stage
  vjp skip the per-ray -> march-layout re-pack in the backward.

  Forward-only: gradients do not flow through the kernel itself
  (inputs are stop-gradient'd). Differentiated marches ("all"-stage
  training) wrap this forward with the analytic reverse sweep in
  ops/eikonal_vjp.py.
  """
  out = _march_pallas_common(
      spec, data, origins, directions, near, step_size, num_samples,
      block_size, window, refetch_every, so3_params, annealed_alpha,
      max_deg, unroll, interpret, normalize_dirs, interp_precision,
      emit="full", jitter=None, skip_uniform=skip_uniform)
  pos, dirs, dist, nvals, g, _sub, oow, raw = out
  if with_raw:
    return pos, dirs, dist, nvals, g, oow, raw
  return pos, dirs, dist, nvals, g, oow


def march_tiled_pallas_lean(spec, data, origins, directions, near,
                            step_size, num_samples, jitter, block_size=256,
                            window=8, refetch_every=8, unroll=None,
                            interpret=False, normalize_dirs=True,
                            interp_precision=None, skip_uniform=None):
  """Radiance-stage fused march with lean output + in-kernel subsample.

  The dense trajectory is emitted with SEVEN channels (pos, dir,
  arclength) — the only densely-consumed quantities in the radiance path
  (the hierarchical re-anchor, ops/render.py:reanchor_on_path); the
  interpolated n / grad-n trajectory stays in-kernel. The jittered
  1-of-num_path coarse subsample (models/nerf.py jitter gather, parity
  rnerf/models.py:240-247) is written by the kernel into a compact
  [batch, num_coarse, 7] output instead of an XLA gather over the dense
  [batch, S, C] trajectory.

  Args as march_tiled_pallas, plus jitter: [num_coarse] int32, one dense
  index per coarse bin with jitter[c] in [c*num_path, (c+1)*num_path).

  Returns (pos, dirs, dist, sub_pos, sub_dirs, sub_dist, oow).
  """
  pos, dirs, dist, _n, _g, sub, oow, _raw = _march_pallas_common(
      spec, data, origins, directions, near, step_size, num_samples,
      block_size, window, refetch_every, None, 1.0, 10, unroll, interpret,
      normalize_dirs, interp_precision, emit="lean", jitter=jitter,
      skip_uniform=skip_uniform)
  return (pos, dirs, dist) + sub + (oow,)


def _march_pallas_common(spec, data, origins, directions, near, step_size,
                         num_samples, block_size, window, refetch_every,
                         so3_params, annealed_alpha, max_deg, unroll,
                         interpret, normalize_dirs, interp_precision, emit,
                         jitter, skip_uniform=None):
  so3_inputs = None
  if so3_params is not None:
    so3_inputs = (annealed_alpha, so3_params)
  if skip_uniform is None:
    skip_uniform = _ENV_SKIP
  # skip_uniform may be a host-precomputed (uni, namb) pair
  # (host_skip_flags / the model's 'grid' collection) instead of a bool:
  # same kernel, zero per-step flag-recompute cost.
  skip_flags = None
  if isinstance(skip_uniform, (tuple, list)):
    skip_flags = tuple(skip_uniform)
    skip_uniform = True
  if interp_precision is None:
    interp_precision = _INTERP_PRECISION
  # Mosaic kernels only compile for TPU; on CPU (tests, forced-CPU CLI
  # runs) fall back to the interpreter, which is slow but exact.
  if not interpret and jax.default_backend() != "tpu":
    interpret = True
  data = jax.lax.stop_gradient(data)
  origins = jax.lax.stop_gradient(origins)
  directions = jax.lax.stop_gradient(directions)
  emit_rows = 11 if emit == "full" else 7
  sub_rows = 0 if jitter is None else int(jitter.shape[-1])

  # The kernel's scoped VMEM scales with the block count (see
  # _VMEM_BUDGET_BYTES): split large batches (eval render chunks) into
  # sequential kernel calls that each fit the budget. The split is chosen
  # at unroll=1 (fewest sequential calls), then the step loop is fully
  # unrolled only when that is free at the chosen block count — splitting
  # further to afford unroll would cost more than its ~2% gain.
  batch = origins.shape[0]
  nb_total = batch // block_size
  max_nb = max_blocks_per_call(window, refetch_every, block_size,
                               grid_bytes=data.size * 4,
                               emit_rows=emit_rows, sub_rows=sub_rows)
  if unroll is None:
    # Interpret mode keeps unroll=1: XLA CPU's fusion of the unrolled
    # body varies with the block count, breaking the bit-exact
    # whole-vs-split guarantee the VMEM-split path relies on.
    if interpret:
      unroll = 1
    elif _ENV_UNROLL:
      unroll = _ENV_UNROLL
    else:
      call_nb = min(nb_total, max_nb)
      fits_unrolled = call_nb <= max_blocks_per_call(
          window, refetch_every, block_size, grid_bytes=data.size * 4,
          unroll=refetch_every, so3=so3_inputs is not None,
          emit_rows=emit_rows, sub_rows=sub_rows)
      unroll = refetch_every if fits_unrolled else 1
  if nb_total <= max_nb:
    return _march_pallas_impl(
        spec, data, origins, directions, near, step_size, num_samples,
        so3_inputs, block_size, window, refetch_every, max_deg, unroll,
        interpret, normalize_dirs=normalize_dirs,
        interp_precision=interp_precision, emit=emit, jitter=jitter,
        skip_uniform=skip_uniform, skip_flags=skip_flags)

  parts = []
  raws = []
  oow_total = jnp.int32(0)
  rows = max_nb * block_size
  for start in range(0, batch, rows):
    end = min(start + rows, batch)
    pos, dirs, dist, nvals, g, sub, oow, raw = _march_pallas_impl(
        spec, data, origins[start:end], directions[start:end], near,
        step_size, num_samples, so3_inputs, block_size, window,
        refetch_every, max_deg, unroll, interpret,
        normalize_dirs=normalize_dirs, interp_precision=interp_precision,
        emit=emit, jitter=jitter, skip_uniform=skip_uniform,
        skip_flags=skip_flags)
    parts.append((pos, dirs, dist, nvals, g) + (sub if sub else ()))
    raws.append(raw)
    oow_total = oow_total + oow
  stacked = [None if cols[0] is None else jnp.concatenate(cols, axis=0)
             for cols in zip(*parts)]
  # Blocks are batch-major, so split raws concatenate on the block axis.
  raw_all = jnp.concatenate(raws, axis=0)
  if jitter is not None:
    return (*stacked[:5], tuple(stacked[5:8]), oow_total, raw_all)
  return (*stacked, None, oow_total, raw_all)
