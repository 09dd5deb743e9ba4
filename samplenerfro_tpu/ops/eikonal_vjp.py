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
import os

import jax
import jax.numpy as jnp

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_bwd_kernel
from samplenerfro_tpu.ops.pallas import march_kernel

_HI = jax.lax.Precision.HIGHEST


def make_so3_parts(min_deg, max_deg, annealed, use_residual,
                   use_direct_output, normalized):
  """(embed(x, alpha), head(raw, g)) for one static so3 configuration."""

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

  return embed, head


def make_so3_apply(min_deg, max_deg, annealed, use_residual,
                   use_direct_output, normalized):
  """Pure (params, alpha, pos, g) -> refined gradient (so3 head)."""
  embed, head = make_so3_parts(min_deg, max_deg, annealed, use_residual,
                               use_direct_output, normalized)

  def so3_apply(params, alpha, pos, g):
    return head(fmlp.mlp_apply(params, embed(pos, alpha)), g)

  return so3_apply


def make_march_allstage(spec, near, step_size, num_samples, block_size,
                        window, refetch_every, so3_key, fwd_mode,
                        bwd_dtype="float32", bwd_impl=None,
                        fwd_interp="highest", fwd_skip=None):
  """Build the custom-vjp all-stage marcher (cached per configuration).

  bwd_impl selects the reverse-sweep implementation: "pallas" (the
  production default — one fused Mosaic kernel streaming the trajectory
  in reverse; measured 29.8k vs 15.4k rays/s on the 512^3 all stage, and
  it trace-time-falls-back to stepvjp for unsupported configurations),
  "stepvjp" (whole adjoint per step inside an XLA reverse scan — the
  fallback and A/B anchor), or "passes" (batched three-pass formulation;
  measured SLOWER on v5e, kept as a documented negative result). None
  reads $EIKVJP_IMPL.

  fwd_skip enables the fused forward kernel's uniform-window free-space
  skip (march_kernel.py; exact when oow == 0); None defers to $MARCH_SKIP.
  The reverse sweep is unchanged — it replays the stored trajectory and
  its uniform-window adjoints vanish identically (constant n, g == 0).
  """
  if bwd_impl is None:
    bwd_impl = os.environ.get("EIKVJP_IMPL", "pallas")
  if bwd_impl == "pallas" and march_kernel.mosaic_off():
    # Mosaic compiles unavailable (relay outage — utils/mosaic_probe.py):
    # the XLA analytic reverse sweep is the fallback production backward.
    bwd_impl = "stepvjp"
  return _make_march_allstage(spec, near, step_size, num_samples,
                              block_size, window, refetch_every, so3_key,
                              fwd_mode, bwd_dtype, bwd_impl, fwd_interp,
                              fwd_skip)


@functools.lru_cache(maxsize=None)
def _make_march_allstage(spec, near, step_size, num_samples, block_size,
                         window, refetch_every, so3_key, fwd_mode,
                         bwd_dtype="float32", bwd_impl="stepvjp",
                         fwd_interp="highest", fwd_skip=None):
  """Build the custom-vjp all-stage marcher for one static configuration.

  Args (all static/hashable):
    spec: grid_ops.GridSpec.
    near, step_size, num_samples, block_size, window, refetch_every: as
      march_tiled.
    so3_key: (min_deg, max_deg, annealed, use_residual, use_direct_output,
      normalized).
    fwd_mode: "pallas" (fused kernel when supported) or "tiled".
    bwd_dtype: compute dtype of the reverse sweep's batched Jacobian /
      parameter-cotangent passes ("float32" | "bfloat16"). The sweep is
      matmul-rate + HBM-bound on these passes; bfloat16 runs them at the
      fast MXU path with fp32 accumulation in the sequential recurrence
      (the same production-precision story as the bf16 radiance MLPs,
      whose backward is bf16 as well). float32 matches jax autodiff to
      fp32 round-off and is the default (parity tests, selfcheck gate).

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
  bdt = jnp.dtype(bwd_dtype)
  exact_bwd = bdt == jnp.float32

  def _run_fwd(data3d, origins, directions, alpha, so3_params,
               skip_flags=()):
    """Returns (pos, dirs_raw, dist, nvals, g, oow, raw_or_None).

    `raw` is the fused forward kernel's march-layout [nb, S, 11, R]
    trajectory, kept ONLY for the pallas reverse sweep (it is its exact
    streaming layout, so the backward skips the per-ray -> march-layout
    re-pack — one fewer full pass over the [batch, S, 11] arrays).
    """
    if (fwd_mode == "pallas" and pallas_so3_ok
        and jax.default_backend() == "tpu"
        and march_kernel.supports(spec, num_samples, origins.shape[0],
                                  block_size, window, refetch_every)):
      out = march_kernel.march_tiled_pallas(
          spec, data3d, origins, directions, near, step_size, num_samples,
          block_size=block_size, window=window,
          refetch_every=refetch_every, so3_params=so3_params,
          annealed_alpha=alpha, max_deg=max_deg, normalize_dirs=False,
          interp_precision=fwd_interp, with_raw=(bwd_impl == "pallas"),
          skip_uniform=(tuple(skip_flags) if skip_flags else fwd_skip))
      if bwd_impl == "pallas":
        return out
      return out + (None,)
    pred = lambda rp, g: so3_apply(so3_params, alpha, rp, g)
    return eikt.march_tiled(
        spec, data3d, origins, directions, near, step_size, num_samples,
        block_size=block_size, window=window, refetch_every=refetch_every,
        pred_grad_fn=pred, use_pred_grad=True,
        normalize_dirs=False) + (None,)

  @jax.custom_vjp
  def march(data3d, origins, directions, alpha, so3_params, skip_flags):
    pos, dirs_raw, dist, nvals, g, oow, _raw = _run_fwd(
        data3d, origins, directions, alpha, so3_params, skip_flags)
    return (pos, math_ops.safe_l2_normalize(dirs_raw), dist, nvals, g, oow)

  def fwd(data3d, origins, directions, alpha, so3_params, skip_flags):
    pos, dirs_raw, dist, nvals, g, oow, raw = _run_fwd(
        data3d, origins, directions, alpha, so3_params, skip_flags)
    out = (pos, math_ops.safe_l2_normalize(dirs_raw), dist, nvals, g, oow)
    res = (data3d, alpha, so3_params, pos, dirs_raw, nvals, g, raw,
           skip_flags)
    return out, res

  embed, head = make_so3_parts(*so3_key)

  def bwd(res, cts):
    """Three-pass reverse sweep; linear-in-cotangent formulation.

    The step adjoints are LINEAR in the state cotangents (pbar, dbar) with
    coefficients that depend only on stored forward values, so instead of
    running the so3 vjp + interp adjoint sequentially per step (768
    latency-bound small matmuls), the sweep splits into:

      pass 1 (parallel over steps, scanned per window): per-step Jacobian
        pieces — interp derivatives d(n,g)/dp via the window
        weight-derivative contractions, so3 head Jacobians du/dp, du/dg
        via vmapped jacfwd (3 tangents through the MLP, batched over the
        whole window), folded into a single [3,3] map K and affine terms;
      pass 2 (the only sequential part): the 6-dim linear cotangent
        recurrence  pbar_k = pbar + h K dbar + A nbar_dyn + c_p,
        dbar_k = dbar + (h/n) pbar + c_d  — pure VPU work, ~40 flops per
        ray-step, emitting the dbar trajectory;
      pass 3 (parallel): so3 parameter/alpha cotangents in ONE batched
        vjp over the full trajectory with cotangent h*mask*dbar_{k+1}.

    Identical math to the per-step formulation (the Jacobian contraction
    is reassociated), so it matches jax.grad of the tiled forward to fp32
    round-off (tests/test_eikonal_vjp.py, train/selfcheck.py on device).
    """
    data3d, alpha, so3_params, pos, dirs_raw, nvals, g, _raw, skip_flags = res
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

    so3_params_b = jax.tree_util.tree_map(lambda a: a.astype(bdt),
                                          so3_params)

    def raw_of(p):  # [M, 3] -> [M, 3] so3 MLP output (batched, bwd dtype)
      x = embed(p, alpha).astype(bdt)
      return fmlp.mlp_apply(so3_params_b, x).astype(pos.dtype)

    eye3 = jnp.eye(3, dtype=pos.dtype)
    interp_prec = _HI if exact_bwd else None

    # ---- pass 1: per-step Jacobian pieces, batched over window CHUNKS --
    # One reuse window is too little work per scan iteration (96 sequential
    # iterations of ~0.2 ms fixed overhead dominate); processing `chunk`
    # windows per iteration makes every contraction MXU-sized while keeping
    # the wxy transients bounded (~chunk * refetch * batch * w^2 floats).
    _ablate = set(os.environ.get("EIKVJP_ABLATE", "").split(","))
    chunk = 1
    for cand in range(min(int(os.environ.get("EIKVJP_CHUNK", "12")),
                          n_outer), 0, -1):
      if n_outer % cand == 0:
        chunk = cand
        break

    def window_pieces(_, xs):
      (pw, dw, nw, gw, dpw, ddw, dnw, dgw, sbw) = xs  # [c, s, nb, R, ...]
      c = chunk
      s = refetch_every
      worigin = jax.vmap(
          lambda p0, d0: eikt.window_origin(cells_of, p0, d0, refetch_every,
                                            step_size, w, n))(
              pw[:, 0], dw[:, 0])                       # [c, nb, 3]
      bricks = jax.vmap(slice_window)(worigin)          # [c, nb, w, w, w, 4]
      b2 = bricks.reshape(c, nb, w * w, w * 4).astype(bdt)

      cell, frac = cells_of(pw)
      rel = jnp.clip(cell - worigin[:, None, :, None, :], 0, w - 2)
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
      def dvals(ax, ay, az):
        wxy = (ax[..., :, None] * ay[..., None, :]).reshape(
            c, s, nb, block_size, w * w).astype(bdt)
        t = jnp.einsum("csbrk,cbkz->csbrz", wxy, b2, precision=interp_prec,
                       preferred_element_type=pos.dtype)
        t = t.reshape(c, s, nb, block_size, w, 4)
        return jnp.sum(az[..., None] * t, axis=4)       # [c, s, nb, R, 4]

      if "interp" in _ablate:
        vx = vy = vz = jnp.zeros((c, s, nb, block_size, 4), pos.dtype)
      else:
        vx = dvals(dx, uy, uz)
        vy = dvals(ux, dy, uz)
        vz = dvals(ux, uy, dz)
      # d(frac)/d(p) is DIAGONAL per axis (frac_a depends only on p_a
      # through the shared clipped cells_of), so one vjp with an all-ones
      # cotangent recovers the diagonal including all clip masks.
      _, frac_vjp = jax.vjp(frac_of, pw)
      dfdp = frac_vjp(jnp.ones_like(frac))[0]           # [c, s, nb, R, 3]
      stackv = jnp.stack([vx, vy, vz], axis=-1)         # [c, s, nb, R, 4, 3]
      dval_dp = stackv * dfdp[..., None, :]  # d[n,g]_c/dp_a
      a_vec = dval_dp[..., 0, :]                        # dn/dp
      b_mat = dval_dp[..., 1:, :]                       # dg_j/dp_a
      bt_mat = jnp.swapaxes(b_mat, -1, -2)              # [..., 3(a), 3(j)]

      # so3 head Jacobians at every window point: 3 basis tangents pushed
      # through jax.linearize over the FLAT batch, so every tangent pass
      # is a full-width [M, feat] matmul on the MXU (a per-sample
      # vmap(jacfwd) lowers to M tiny dots — measured 2x SLOWER than the
      # per-step vjp it replaced).
      shape6 = (c, s, nb, block_size, 3, 3)
      if "so3jac" in _ablate:
        jpt = jnp.zeros(shape6, pos.dtype)
        jgt = jnp.zeros(shape6, pos.dtype)
      else:
        p_flat = pw.reshape(-1, 3)
        g_flat = gw.reshape(-1, 3)
        raw_flat, raw_jvp = jax.linearize(raw_of, p_flat)
        basis = [jnp.broadcast_to(eye3[a], p_flat.shape) for a in range(3)]
        j_raw = jnp.stack([raw_jvp(b) for b in basis], axis=-1)  # [M,3,3in]
        _, head_jvp = jax.linearize(head, raw_flat, g_flat)
        zeros = jnp.zeros_like(g_flat)
        j_p = jnp.stack(  # d(head)/d(raw) @ d(raw)/d(p): chain the tangents
            [head_jvp(j_raw[..., a], zeros) for a in range(3)], axis=-1)
        j_g = jnp.stack([head_jvp(zeros, b) for b in basis], axis=-1)
        jpt = jnp.swapaxes(j_p, -1, -2).reshape(shape6)
        jgt = jnp.swapaxes(j_g, -1, -2).reshape(shape6)

      gnorm = jnp.linalg.norm(gw, axis=-1, keepdims=True)
      mask = (gnorm > 1e-3).astype(pos.dtype)           # [c, s, nb, R, 1]
      m5 = mask[..., None]
      # gbar = (1-mask) ubar + Jg^T (mask ubar) + dg; pbar gets Jp^T
      # (mask ubar) + B^T gbar; fold everything applied to ubar into K.
      inner = (1.0 - m5) * eye3 + m5 * jgt
      k_mat = m5 * jpt + jnp.einsum("...aj,...jk->...ak", bt_mat, inner,
                                    precision=_HI)

      dlen = jnp.linalg.norm(dw, axis=-1, keepdims=True)
      inv_n = 1.0 / nw                                  # [c, s, nb, R, 1]
      c_n = dnw - sbw[..., None] * (h * inv_n**2) * dlen
      c_p = (a_vec * c_n
             + jnp.einsum("...aj,...j->...a", bt_mat, dgw, precision=_HI)
             + dpw)
      c_d = ddw + sbw[..., None] * (h * inv_n) * dw / dlen
      return None, (k_mat, a_vec, inv_n, c_p, c_d, mask)

    def chunked(a):  # [n_outer, s, ...] -> [n_outer/chunk, chunk, s, ...]
      return a.reshape((n_outer // chunk, chunk) + a.shape[1:])

    _, pieces = jax.lax.scan(
        window_pieces, None,
        tuple(map(chunked, (pos_b, dir_b, n_b, g_b, dpos_b, ddir_b, dn_b,
                            dg_b, seg_b))))
    # [n_outer/chunk, chunk, refetch, ...] -> [S, nb, R, ...]
    flat_s = lambda a: a.reshape((num_samples,) + a.shape[3:])
    k_mat, a_vec, inv_n, c_p, c_d, mask = map(flat_s, pieces)
    d_flat = dir_b.reshape((num_samples,) + dir_b.shape[2:])

    # ---- pass 2: the sequential linear cotangent recurrence ----
    def rev_step(carry, xs):
      pbar, dbar = carry
      k_k, a_k, in_k, cp_k, cd_k, d_k = xs
      pdot = jnp.sum(pbar * d_k, axis=-1, keepdims=True)
      pbar_k = (pbar
                + h * jnp.einsum("...ak,...k->...a", k_k, dbar)
                + a_k * (-(h * in_k**2) * pdot)
                + cp_k)
      dbar_k = dbar + (h * in_k) * pbar + cd_k
      return (pbar_k, dbar_k), dbar

    zero3 = jnp.zeros((nb, block_size, 3), pos.dtype)
    if "pass2" in _ablate:
      pbar, dbar = zero3, zero3
      dbar_traj = jnp.zeros((num_samples, nb, block_size, 3), pos.dtype)
    else:
      (pbar, dbar), dbar_traj = jax.lax.scan(
          rev_step, (zero3, zero3),
          (k_mat, a_vec, inv_n, c_p, c_d, d_flat),
          reverse=True, unroll=8)

    # ---- pass 3: so3 parameter / alpha cotangents, one batched vjp ----
    if "pass3" in _ablate:
      thetabar = jax.tree_util.tree_map(jnp.zeros_like, so3_params)
      alphabar = jnp.zeros_like(alpha) + 1e-20 * jnp.sum(dbar_traj)
    else:
      ubar_all = (h * mask * dbar_traj).reshape(-1, 3)
      p_all = pos_b.reshape(-1, 3)
      g_all = g_b.reshape(-1, 3)

      def so3_all(th, al):
        thb = jax.tree_util.tree_map(lambda a: a.astype(bdt), th)
        x = embed(p_all, al).astype(bdt)
        return head(fmlp.mlp_apply(thb, x).astype(pos.dtype), g_all)

      _, so3_vjp = jax.vjp(so3_all, so3_params, alpha)
      thetabar, alphabar = so3_vjp(ubar_all)

    # p_0 = origins + near * directions; d_0 = directions.
    origins_bar = pbar.reshape(batch, 3)
    directions_bar = (near * pbar + dbar).reshape(batch, 3)
    return (jnp.zeros_like(data3d), origins_bar, directions_bar, alphabar,
            thetabar, jax.tree_util.tree_map(jnp.zeros_like, skip_flags))

  # Round-2 formulation kept as a selectable implementation: the whole
  # adjoint (so3 vjp + interp weight-derivative contractions) evaluated
  # per step inside the reverse scan. On this chip XLA schedules the
  # in-scan small matmuls well, so it is competitive with the batched
  # three-pass formulation; EIKVJP_IMPL picks at trace time.
  def bwd_stepvjp(res, cts):
    data3d, alpha, so3_params, pos, dirs_raw, nvals, g, _raw, skip_flags = res
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
            thetabar, jax.tree_util.tree_map(jnp.zeros_like, skip_flags))

  def bwd_pallas(res, cts):
    """Fused-kernel reverse sweep (ops/pallas/march_bwd_kernel.py).

    Same step adjoints as bwd_stepvjp, fused into one Mosaic kernel that
    streams the stored trajectory in reverse — no XLA pass ever walks the
    [batch, S, ...] arrays (their ~15-20 ms-per-pass relayout floor is
    what bounds both XLA formulations on v5e). Falls back to the stepvjp
    sweep when the configuration is outside the kernel's support.
    """
    data3d, alpha, so3_params, pos, dirs_raw, nvals, g, raw, skip_flags = res
    if not (pallas_so3_ok and march_bwd_kernel.supports(
        spec, num_samples, pos.shape[0], block_size, window,
        refetch_every)):
      return bwd_stepvjp(res, cts)
    dpos, ddirs, ddist, dn, dg, _doow = cts
    _, norm_vjp = jax.vjp(math_ops.safe_l2_normalize, dirs_raw)
    ddirs_raw = norm_vjp(ddirs)[0]
    revcum = jnp.cumsum(ddist[:, ::-1], axis=-1)[:, ::-1]
    segbar = jnp.concatenate(
        [revcum[:, 1:], jnp.zeros_like(revcum[:, :1])], axis=-1)
    origins_bar, directions_bar, alphabar, thetabar = (
        march_bwd_kernel.march_bwd_pallas(
            spec, data3d, pos, dirs_raw, nvals, g, dpos, ddirs_raw, dn, dg,
            segbar, so3_params, alpha, near, h, block_size, w,
            refetch_every, max_deg,
            interp_precision=("highest" if exact_bwd else "default"),
            traj_raw=raw))
    # The kernel wrapper returns a plain dict; the custom_vjp contract
    # requires the PRIMAL's container (a flax FrozenDict when called from
    # the model). Both containers order Dense_0..Dense_out identically,
    # so re-hanging the leaves on the primal's treedef is exact.
    thetabar = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(so3_params),
        jax.tree_util.tree_leaves(thetabar))
    return (jnp.zeros_like(data3d), origins_bar, directions_bar, alphabar,
            thetabar, jax.tree_util.tree_map(jnp.zeros_like, skip_flags))

  march.defvjp(fwd, {"stepvjp": bwd_stepvjp, "passes": bwd,
                     "pallas": bwd_pallas}[bwd_impl])

  def march_api(data3d, origins, directions, alpha, so3_params,
                skip_flags=()):
    """skip_flags: optional host-precomputed (uni, namb) free-space-skip
    pair (march_kernel.host_skip_flags) — threaded as explicit custom_vjp
    arguments (zero cotangent) because the lru-cached builder only takes
    hashable statics. Empty = derive in-jit when fwd_skip is set."""
    return march(data3d, origins, directions, alpha, so3_params,
                 tuple(skip_flags))

  return march_api
