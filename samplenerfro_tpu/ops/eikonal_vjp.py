"""Analytic reverse-mode for the tile-coherent 'all'-stage eikonal march.

XLA's autodiff of the windowed march (ops/eikonal_tiled.march_tiled with
the so3 refinement) costs ~62 ms at ship scale on one v5e — it must
rematerialize the 768-step forward chain inside the backward. But the
forward already EMITS its whole state trajectory (positions, raw
directions, interpolated n and grad-n per step), so an analytic reverse
sweep needs no recompute: it replays the windows in reverse order off the
stored path and applies hand-derived step adjoints.

Recurrence (ops/eikonal_tiled.py inner_step; reference
rnerf/eikonal_utils.py:29-49):
    (n_k, g_k) = trilinear(grid, p_k)            # window one-hot matmul
    u_k  = where(|g_k| > 1e-3, so3(p_k, g_k; theta, alpha), g_k)
    p_{k+1} = p_k + (h / n_k) d_k
    d_{k+1} = d_k + h u_k
    t_{k+1} = t_k + (h / n_k) |d_k|
Adjoints per reverse step (Pbar/Dbar = cotangents of p_{k+1}, d_{k+1}):
    ubar   = h Dbar
    dbar_k = Dbar + (h/n_k) Pbar + seg_k_bar (h/n_k) d_k/|d_k| + direct
    nbar_k = -(h/n_k^2) (Pbar . d_k) - seg_k_bar (h/n_k^2) |d_k| + direct
    (pbar_so3, gbar_so3, thetabar_k, alphabar_k) = vjp(so3)(ubar * mask)
    gbar_k = ubar (1-mask) + gbar_so3 + direct
    fracbar = sum_c [nbar|gbar]_c * d(trilinear)/d(frac)   # 3 window matmuls
    pbar_k = Pbar + pbar_so3 + vjp(frac_of)(fracbar) + direct
The d(trilinear)/d(frac) contractions reuse the exact forward machinery
(eikonal_tiled._axis_weights/_axis_dweights + the same HIGHEST-precision
einsum); frac_of's clip masks are reproduced by jax.vjp of the shared
cells_of, so the result matches jax.grad of the forward to fp32 tolerance
(tests/test_eikonal_vjp.py).

The grid itself receives ZERO cotangents (it lives in the non-trainable
'grid' collection — never differentiated in any stage); origins/directions
adjoints are returned exactly.

The forward runs the fused Pallas kernel when the configuration supports
it (the fwd-only restriction disappears — this module supplies the
backward), falling back to march_tiled.
"""

import functools

import jax
import jax.numpy as jnp

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_kernel

_HI = jax.lax.Precision.HIGHEST


def make_so3_apply(min_deg, max_deg, annealed, use_residual,
                   use_direct_output, normalized):
  """Pure (params, alpha, pos, g) -> refined gradient (so3 head)."""

  def embed(x, alpha):
    if annealed:
      return math_ops.annealed_pos_enc(x, min_deg, max_deg,
                                       alpha=alpha * max_deg)
    return math_ops.pos_enc(x, min_deg, max_deg, legacy_posenc_order=True)

  def head(raw, g):
    if use_residual:
      if normalized:
        raise NotImplementedError()
      if use_direct_output:
        return eik_ops.rodrigues_rotate(raw, g)
      return eik_ops.spherical_residual(raw, g)
    if normalized and use_direct_output:
      return (jnp.linalg.norm(g + 1e-6, axis=-1, keepdims=True)
              * math_ops.safe_l2_normalize(raw))
    raise NotImplementedError()

  def so3_apply(params, alpha, pos, g):
    return head(fmlp.mlp_apply(params, embed(pos, alpha)), g)

  return so3_apply


@functools.lru_cache(maxsize=None)
def make_march_allstage(spec, near, step_size, num_samples, block_size,
                        window, refetch_every, so3_key, fwd_mode):
  """Build the custom-vjp all-stage marcher for one static configuration.

  Args (all static/hashable):
    spec: grid_ops.GridSpec.
    near, step_size, num_samples, block_size, window, refetch_every: as
      march_tiled.
    so3_key: (min_deg, max_deg, annealed, use_residual, use_direct_output,
      normalized).
    fwd_mode: "pallas" (fused kernel when supported) or "tiled".

  Returns fn(data3d, origins, directions, alpha, so3_params) with the
  march_tiled return signature; differentiable in origins, directions,
  alpha, and so3_params (grid cotangent is zero by design).
  """
  so3_apply = make_so3_apply(*so3_key)
  n = spec.ndim[0]
  w = window
  h = step_size
  n_outer = num_samples // refetch_every
  min_deg, max_deg, annealed, use_residual, use_direct, normalized = so3_key
  pallas_so3_ok = (min_deg == 0 and annealed and use_residual
                   and use_direct and not normalized)

  def _run_fwd(data3d, origins, directions, alpha, so3_params):
    if (fwd_mode == "pallas" and pallas_so3_ok
        and jax.default_backend() == "tpu"
        and march_kernel.supports(spec, num_samples, origins.shape[0],
                                  block_size, window, refetch_every)):
      return march_kernel.march_tiled_pallas(
          spec, data3d, origins, directions, near, step_size, num_samples,
          block_size=block_size, window=window,
          refetch_every=refetch_every, so3_params=so3_params,
          annealed_alpha=alpha, max_deg=max_deg, normalize_dirs=False)
    pred = lambda rp, g: so3_apply(so3_params, alpha, rp, g)
    return eikt.march_tiled(
        spec, data3d, origins, directions, near, step_size, num_samples,
        block_size=block_size, window=window, refetch_every=refetch_every,
        pred_grad_fn=pred, use_pred_grad=True, normalize_dirs=False)

  @jax.custom_vjp
  def march(data3d, origins, directions, alpha, so3_params):
    pos, dirs_raw, dist, nvals, g, oow = _run_fwd(
        data3d, origins, directions, alpha, so3_params)
    return (pos, math_ops.safe_l2_normalize(dirs_raw), dist, nvals, g, oow)

  def fwd(data3d, origins, directions, alpha, so3_params):
    pos, dirs_raw, dist, nvals, g, oow = _run_fwd(
        data3d, origins, directions, alpha, so3_params)
    out = (pos, math_ops.safe_l2_normalize(dirs_raw), dist, nvals, g, oow)
    res = (data3d, alpha, so3_params, pos, dirs_raw, nvals, g)
    return out, res

  def bwd(res, cts):
    data3d, alpha, so3_params, pos, dirs_raw, nvals, g = res
    dpos, ddirs, ddist, dn, dg, _doow = cts
    batch = pos.shape[0]
    nb = batch // block_size

    # Cotangent of the raw (pre-normalization) directions, elementwise.
    _, norm_vjp = jax.vjp(math_ops.safe_l2_normalize, dirs_raw)
    ddirs_raw = norm_vjp(ddirs)[0]

    # dist[k] = near + sum_{j<k} seg_j  ->  segbar_j = sum_{k>j} ddist_k.
    revcum = jnp.cumsum(ddist[:, ::-1], axis=-1)[:, ::-1]
    segbar = jnp.concatenate(
        [revcum[:, 1:], jnp.zeros_like(revcum[:, :1])], axis=-1)

    # [batch, S, ...] -> [n_outer, refetch, nb, R, ...] (march layout).
    def reblock(a):
      a = a.reshape((nb, block_size) + a.shape[1:])   # [nb, R, S, ...]
      a = jnp.moveaxis(a, 2, 0)                        # [S, nb, R, ...]
      return a.reshape((n_outer, refetch_every) + a.shape[1:])

    pos_b = reblock(pos)
    dir_b = reblock(dirs_raw)
    n_b = reblock(nvals)
    g_b = reblock(g)
    dpos_b = reblock(dpos)
    ddir_b = reblock(ddirs_raw)
    dn_b = reblock(dn)
    dg_b = reblock(dg)
    seg_b = reblock(segbar)

    grid4d = data3d.reshape(n, n, n, 4) if w >= 12 else None
    cells_of = eikt.make_cells_of(spec, n, pos.dtype)
    slice_window = eikt.make_slice_window(data3d, grid4d, n, w)

    def frac_of(rp):
      return cells_of(rp)[1]

    theta0 = jax.tree_util.tree_map(jnp.zeros_like, so3_params)

    def inner_rev(carry, xs):
      pbar, dbar, thetabar, alphabar, worigin, bricks = carry
      (p_k, d_k, n_k, g_k, dp_k, dd_k, dn_k, dg_k, sb_k) = xs

      ubar = h * dbar                                        # [nb, R, 3]
      gnorm = jnp.linalg.norm(g_k, axis=-1, keepdims=True)
      mask = (gnorm > 1e-3).astype(ubar.dtype)

      flat = lambda x: x.reshape(-1, x.shape[-1])
      _, so3_vjp = jax.vjp(
          lambda th, al, rp, gg: so3_apply(th, al, rp, gg).reshape(
              g_k.shape),
          so3_params, alpha, flat(p_k), flat(g_k))
      thb, alb, p_so3, g_so3 = so3_vjp(ubar * mask)
      p_so3 = p_so3.reshape(p_k.shape)
      g_so3 = g_so3.reshape(g_k.shape)

      gbar = ubar * (1.0 - mask) + g_so3 + dg_k
      dlen = jnp.linalg.norm(d_k, axis=-1, keepdims=True)
      inv_n = 1.0 / n_k                                      # [nb, R, 1]
      pdotd = jnp.sum(pbar * d_k, axis=-1, keepdims=True)
      nbar = (-(h * inv_n**2) * pdotd + dn_k
              - sb_k[..., None] * (h * inv_n**2) * dlen)
      dbar_k = (dbar + (h * inv_n) * pbar + dd_k
                + sb_k[..., None] * (h * inv_n) * d_k / dlen)

      # Trilinear-interp adjoint wrt position via the weight derivatives.
      vbar = jnp.concatenate([nbar, gbar], axis=-1)          # [nb, R, 4]
      cell, frac = cells_of(p_k)
      rel = jnp.clip(cell - worigin[:, None, :], 0, w - 2)
      ux = eikt._axis_weights(rel[..., 0], frac[..., 0], w)
      uy = eikt._axis_weights(rel[..., 1], frac[..., 1], w)
      uz = eikt._axis_weights(rel[..., 2], frac[..., 2], w)
      dx = eikt._axis_dweights(rel[..., 0], w)
      dy = eikt._axis_dweights(rel[..., 1], w)
      dz = eikt._axis_dweights(rel[..., 2], w)
      # Two-stage contraction (xy one-hot matmul, then the tiny z reduce):
      # never materializes the [R, w^3] weight matrix whose HBM traffic
      # dominates the dense formulation (the same trick as the fused
      # Pallas forward). Association differs from the forward einsum only
      # in fp rounding (~1e-6), which the parity tests absorb.
      b2 = bricks.reshape(nb, w * w, w * 4)

      def dvals(ax, ay, az):
        wxy = (ax[..., :, None] * ay[..., None, :]).reshape(
            nb, block_size, w * w)
        t = jnp.einsum("brk,bkz->brz", wxy, b2, precision=_HI)
        t = t.reshape(nb, block_size, w, 4)
        return jnp.sum(az[..., None] * t, axis=2)          # [nb, R, 4]

      fx = jnp.sum(vbar * dvals(dx, uy, uz), axis=-1)
      fy = jnp.sum(vbar * dvals(ux, dy, uz), axis=-1)
      fz = jnp.sum(vbar * dvals(ux, uy, dz), axis=-1)
      fracbar = jnp.stack([fx, fy, fz], axis=-1)
      _, frac_vjp = jax.vjp(frac_of, p_k)
      p_interp = frac_vjp(fracbar)[0]

      pbar_k = pbar + p_so3 + p_interp + dp_k
      thetabar = jax.tree_util.tree_map(jnp.add, thetabar, thb)
      alphabar = alphabar + alb
      return (pbar_k, dbar_k, thetabar, alphabar, worigin, bricks), None

    def outer_rev(carry, xs):
      pbar, dbar, thetabar, alphabar = carry
      (pw, dw, nw, gw, dpw, ddw, dnw, dgw, sbw) = xs
      # Window origin exactly as the forward computed it (from the
      # window-START state).
      worigin = eikt.window_origin(cells_of, pw[0], dw[0], refetch_every,
                                   step_size, w, n)
      bricks = slice_window(worigin)
      (pbar, dbar, thetabar, alphabar, _, _), _ = jax.lax.scan(
          inner_rev, (pbar, dbar, thetabar, alphabar, worigin, bricks),
          (pw, dw, nw, gw, dpw, ddw, dnw, dgw, sbw),
          reverse=True)
      return (pbar, dbar, thetabar, alphabar), None

    zero3 = jnp.zeros((nb, block_size, 3), pos.dtype)
    (pbar, dbar, thetabar, alphabar), _ = jax.lax.scan(
        outer_rev,
        (zero3, zero3, theta0, jnp.zeros_like(alpha)),
        (pos_b, dir_b, n_b, g_b, dpos_b, ddir_b, dn_b, dg_b, seg_b),
        reverse=True)

    # p_0 = origins + near * directions; d_0 = directions.
    origins_bar = pbar.reshape(batch, 3)
    directions_bar = (near * pbar + dbar).reshape(batch, 3)
    return (jnp.zeros_like(data3d), origins_bar, directions_bar, alphabar,
            thetabar)

  march.defvjp(fwd, bwd)
  return march
