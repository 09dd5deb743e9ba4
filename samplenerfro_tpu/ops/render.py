"""Volume rendering and hierarchical sampling along curved ray paths.

Behavioral parity targets (reference SampleNeRFRO):
  - volumetric_rendering: rnerf/model_utils.py:247-309
  - sorted_piecewise_constant_pdf: rnerf/model_utils.py:312-374
  - sample_pdf (curved-path re-anchoring): rnerf/model_utils.py:377-435

TPU notes: the reference re-anchors fine samples on the curved path with a
jax.lax.fori_loop over rays (one sequential iteration per ray). Here the
re-anchor is fully vectorized: a batched searchsorted over [batch, S]
followed by take_along_axis gathers — one data-parallel XLA op instead of a
1024-iteration sequential loop.
"""

import jax
import jax.numpy as jnp
from jax import lax


def volumetric_rendering(rgb, density, t_vals, dirs, white_bkgd, rgb_bkgd,
                         mask_bbox=None):
  """Exponential-transmittance compositing along (possibly curved) rays.

  Args:
    rgb: [batch, S, 3] sample colors.
    density: [batch, S, 1] sample densities.
    t_vals: [batch, S] arclength parameters along the path.
    dirs: [batch, S, 3] per-sample ray directions (eikonal paths are
      non-unit-speed, so deltas are scaled by ||dirs||).
    white_bkgd: bool, composite white behind everything.
    rgb_bkgd: [batch, 3] learned background color or None.
    mask_bbox: optional [batch, S] multiplicative density mask.

  Returns:
    (comp_rgb, distance, acc, weights, alpha, trans_last, trans_last*bkgd)
    matching rnerf/model_utils.py:247-309 (including the 1e-3 boundary delta
    appended as the final interval and nan_to_num-clipped distance).
  """
  t_dists = jnp.concatenate([
      t_vals[..., 1:] - t_vals[..., :-1],
      jnp.broadcast_to(jnp.asarray([1e-3], dtype=t_vals.dtype),
                       t_vals[..., :1].shape),
  ], axis=-1)
  delta = t_dists * jnp.linalg.norm(dirs, axis=-1)
  density_delta = density[..., 0] * delta
  if mask_bbox is not None:
    density_delta = density_delta * mask_bbox

  alpha = 1 - jnp.exp(-density_delta)
  trans = jnp.exp(-jnp.concatenate([
      jnp.zeros_like(density_delta[..., :1]),
      jnp.cumsum(density_delta, axis=-1),
  ], axis=-1))
  weights = alpha * trans[..., :-1]

  if rgb_bkgd is not None:
    comp_rgb = (weights[..., None] * rgb).sum(axis=-2) + trans[..., -1:] * rgb_bkgd
  else:
    comp_rgb = (weights[..., None] * rgb).sum(axis=-2)
    rgb_bkgd = jnp.ones(list(trans[..., -1:].shape[:-1]) + [3], dtype=rgb.dtype)
  acc = weights.sum(axis=-1)
  distance = (weights * t_vals).sum(axis=-1) / acc
  distance = jnp.clip(jnp.nan_to_num(distance, nan=jnp.inf),
                      t_vals[:, 0], t_vals[:, -1])
  if white_bkgd:
    comp_rgb = comp_rgb + (1.0 - acc[..., None])
  return (comp_rgb, distance, acc, weights, alpha, trans[..., -1:],
          trans[..., -1:] * lax.stop_gradient(rgb_bkgd))


def sorted_piecewise_constant_pdf(key, bins, weights, num_samples, randomized):
  """Inverse-CDF sampling from a piecewise-constant PDF over sorted bins.

  Parity: rnerf/model_utils.py:312-374 (mip-NeRF stratified CDF sampling,
  including the eps-padding of degenerate weight vectors).
  """
  eps = 1e-5
  weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
  padding = jnp.maximum(0, eps - weight_sum)
  weights = weights + padding / weights.shape[-1]
  weight_sum = weight_sum + padding

  pdf = weights / weight_sum
  cdf = jnp.minimum(1, jnp.cumsum(pdf[..., :-1], axis=-1))
  cdf = jnp.concatenate([
      jnp.zeros(list(cdf.shape[:-1]) + [1]), cdf,
      jnp.ones(list(cdf.shape[:-1]) + [1]),
  ], axis=-1)

  if randomized:
    s = 1 / num_samples
    u = jnp.arange(num_samples) * s
    u = u + jax.random.uniform(
        key, list(cdf.shape[:-1]) + [num_samples],
        maxval=s - jnp.finfo("float32").eps)
    u = jnp.minimum(u, 1.0 - jnp.finfo("float32").eps)
  else:
    u = jnp.linspace(0.0, 1.0 - jnp.finfo("float32").eps, num_samples)
    u = jnp.broadcast_to(u, list(cdf.shape[:-1]) + [num_samples])

  mask = u[..., None, :] >= cdf[..., :, None]

  def find_interval(x):
    x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), -2)
    x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), -2)
    return x0, x1

  bins_g0, bins_g1 = find_interval(bins)
  cdf_g0, cdf_g1 = find_interval(cdf)

  t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0, 1)
  return bins_g0 + t * (bins_g1 - bins_g0)


def reanchor_on_path(z_samples, path_pos, path_dir, path_dist, path_grad,
                     method="two_level", bucket=8):
  """Re-anchor arclength samples onto a densely marched curved path.

  For each sample arclength s, find the nearest path vertex at arclength
  <= s (left floor via searchsorted) and extrapolate linearly along that
  vertex's direction: pos = path_pos[k] + path_dir[k] * (s - path_dist[k]).

  Fully vectorized equivalent of the reference's per-ray fori_loop
  (rnerf/model_utils.py:413-429; `sorted_find_nearest` there is a left-floor
  lookup with head padding, i.e. idx = clip(searchsorted(x, s, 'left')-1, 0)).

  method="two_level" (default, bit-exact with "gather", scan-measured
  6.0 -> ~1 ms at ship scale on one v5e): the flat searchsorted touches all
  S=768 vertices per sample and the row gather serializes on the TPU copy
  engine, so instead (1) a coarse floor over the S/bucket bucket-start
  arclengths picks each sample's bucket, (2) ONE one-hot contraction on the
  MXU (Precision.HIGHEST — exact fp32 selection) pulls the bucket's
  [bucket, 10] payload window per sample, and (3) the within-bucket floor
  + payload select run on the VPU over the small window. Sortedness makes
  the two-level count exact: every vertex in an earlier bucket is <= its
  bucket start < z, every vertex in a later bucket is >= a start >= z.

  method="gather": flat compare_all searchsorted + take_along_axis.

  Args:
    z_samples: [batch, M] sorted arclengths to place samples at.
    path_pos: [batch, S, 3] dense path vertices.
    path_dir: [batch, S, 3] per-vertex (normalized) directions.
    path_dist: [batch, S] per-vertex cumulative arclength.
    path_grad: [batch, S, 3] per-vertex IOR gradients.
    method: "two_level" | "gather".
    bucket: two_level bucket width (any value; S is padded to a multiple).

  Returns:
    (pos, dirs, grads): [batch, M, 3] each.
  """
  s = path_dist.shape[-1]
  # path_grad=None (lean march emit, models/nerf.py) drops the gradient
  # columns from the payload: the radiance path only consumes grads for
  # the online-sparsity masks, which force the full emit.
  cols = [path_pos, path_dir] + ([path_grad] if path_grad is not None else [])
  payload = jnp.concatenate(cols + [path_dist[..., None]], axis=-1)
  nc = payload.shape[-1]

  if method == "two_level":
    b, m = z_samples.shape
    g = int(bucket)
    pad = (-s) % g
    if pad:
      # Pad with +inf arclengths (never counted as < z) and edge payload.
      payload = jnp.concatenate(
          [payload, jnp.broadcast_to(payload[:, -1:], (b, pad, nc))], axis=1)
      path_dist = jnp.concatenate(
          [path_dist, jnp.full((b, pad), jnp.inf, path_dist.dtype)], axis=-1)
    c = path_dist.shape[-1] // g
    starts = path_dist[:, ::g]  # [B, C]
    # Coarse floor: number of bucket starts strictly below z, minus one.
    cnt_c = jnp.sum(
        (starts[:, None, :] < z_samples[..., None]).astype(jnp.int32),
        axis=-1)
    idx_c = jnp.clip(cnt_c - 1, 0, c - 1)  # [B, M]
    onehot_c = (jax.lax.broadcasted_iota(jnp.int32, (b, m, c), 2)
                == idx_c[..., None]).astype(payload.dtype)
    # One-hot bucket-window pull on the MXU; HIGHEST => exact selection.
    win = jnp.einsum("bmc,bck->bmk", onehot_c,
                     payload.reshape(b, c, g * nc),
                     precision=jax.lax.Precision.HIGHEST)
    win = win.reshape(b, m, g, nc)
    local_d = win[..., nc - 1]  # [B, M, G]
    cnt_l = jnp.sum((local_d < z_samples[..., None]).astype(jnp.int32),
                    axis=-1)
    # Global floor k = idx_c*g + cnt_l - 1, clipped to [0, S-1]; expressed
    # locally: within-bucket index clipped to the bucket (idx_c already
    # saturates at the ends).
    within = jnp.clip(cnt_l - 1, 0, g - 1)
    onehot_l = (jax.lax.broadcasted_iota(jnp.int32, (b, m, g), 2)
                == within[..., None]).astype(payload.dtype)
    anchors = jnp.sum(onehot_l[..., None] * win, axis=2)  # [B, M, nc]
  else:
    # side='left' searchsorted == count of path_dist[k] < z. 'compare_all'
    # evaluates the [S, M] comparison mask on the VPU instead of a
    # sequential binary-search loop (the 'scan' method serializes on TPU).
    idx = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="left",
                                      method="compare_all"))(
            path_dist, z_samples)
    idx = jnp.clip(idx - 1, 0, s - 1)
    anchors = jnp.take_along_axis(payload, idx[..., None], axis=1)

  anchor, rd, anchor_t = (anchors[..., 0:3], anchors[..., 3:6],
                          anchors[..., nc - 1])
  grads = anchors[..., 6:9] if path_grad is not None else None
  pos = anchor + rd * (z_samples - anchor_t)[..., None]
  return pos, rd, grads


def sample_pdf(key, bins, weights, path_pos, path_dir, path_dist, path_grad,
               num_samples, randomized, jitter, near, stop_grad=True,
               z_coarse=None):
  """Hierarchical sampling along a curved path.

  Draws `num_samples` fine arclengths from the coarse weight PDF, merges them
  with the jittered coarse arclengths, sorts, and re-anchors every sample on
  the dense eikonal path. Parity: rnerf/model_utils.py:377-435 with the
  fori_loop replaced by `reanchor_on_path`.

  Args:
    key: PRNG key.
    bins: [batch, Nc-1] midpoints of coarse arclengths.
    weights: [batch, Nc-2] coarse compositing weights (interior).
    path_pos/path_dir/path_dist/path_grad: dense path, [batch, S, ...].
    num_samples: int, number of fine samples.
    randomized: bool.
    jitter: [Nc] int indices of the coarse subsample into the dense path.
    near: float near plane (unused, kept for signature parity).

  Returns:
    (z_vals, pos, dirs, grads): [batch, Nc+num_samples(, 3)].
  """
  del near
  z_samples = sorted_piecewise_constant_pdf(key, bins, weights, num_samples,
                                            randomized)
  if z_coarse is None:
    z_coarse = path_dist[:, jitter]
  z_samples = jnp.sort(jnp.concatenate([z_coarse, z_samples], axis=-1), axis=-1)
  if stop_grad:
    path_pos = lax.stop_gradient(path_pos)
    path_dir = lax.stop_gradient(path_dir)
    z_samples = lax.stop_gradient(z_samples)
    path_dist = lax.stop_gradient(path_dist)
    if path_grad is not None:
      path_grad = lax.stop_gradient(path_grad)
  pos, dirs, grads = reanchor_on_path(z_samples, path_pos, path_dir, path_dist,
                                      path_grad)
  return z_samples, pos, dirs, grads


def add_gaussian_noise(key, raw, noise_std, randomized):
  """Optional density-noise regularizer (rnerf/model_utils.py:438-453)."""
  if (noise_std is not None) and randomized:
    return raw + jax.random.normal(key, raw.shape, dtype=raw.dtype) * noise_std
  return raw
