"""Depth/normal false-color visualization suite.

Provenance: visualize_depth/sinebow and the weighted-percentile depth
normalization transcribe the mip-NeRF-lineage visualization utilities the
reference vendors at rnerf/vis.py (Apache-2.0); the false-color encodings
are part of the output-format parity surface (eval writes the same
depth/disp/normal PNG suite).
"""

import jax
import jax.numpy as jnp
import jax.scipy as jsp
import matplotlib


def sinebow(h):
  """Cyclic uniform colormap (rnerf/vis.py:23-26)."""
  f = lambda x: jnp.sin(jnp.pi * x)**2
  return jnp.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def _convolve2d(z, f):
  return jsp.signal.convolve2d(
      z, f, mode="same", precision=jax.lax.Precision.HIGHEST)


def depth_to_normals(depth):
  """Linearize an orthographic depth map into normals (rnerf/vis.py:34-42)."""
  f_blur = jnp.array([1, 2, 1]) / 4
  f_edge = jnp.array([-1, 0, 1]) / 2
  dy = _convolve2d(depth, f_blur[None, :] * f_edge[:, None])
  dx = _convolve2d(depth, f_blur[:, None] * f_edge[None, :])
  inv_denom = 1 / jnp.sqrt(1 + dx**2 + dy**2)
  return jnp.stack([dx * inv_denom, dy * inv_denom, inv_denom], -1)


def visualize_depth(depth, acc=None, near=None, far=None, ignore_frac=0,
                    curve_fn=lambda x: -jnp.log(x + jnp.finfo(jnp.float32).eps),
                    modulus=0, colormap=None):
  """False-color a depth map (rnerf/vis.py:45-111)."""
  if acc is None:
    acc = jnp.ones_like(depth)
  acc = jnp.where(jnp.isnan(depth), jnp.zeros_like(acc), acc)

  sortidx = jnp.argsort(depth.reshape([-1]))
  depth_sorted = depth.reshape([-1])[sortidx]
  acc_sorted = acc.reshape([-1])[sortidx]
  cum_acc_sorted = jnp.cumsum(acc_sorted)
  mask = ((cum_acc_sorted >= cum_acc_sorted[-1] * ignore_frac) &
          (cum_acc_sorted <= cum_acc_sorted[-1] * (1 - ignore_frac)))
  depth_keep = depth_sorted[mask]

  eps = jnp.finfo(jnp.float32).eps
  near = near or depth_keep[0] - eps
  far = far or depth_keep[-1] + eps

  depth, near, far = [curve_fn(x) for x in [depth, near, far]]

  if modulus > 0:
    value = jnp.mod(depth, modulus) / modulus
    colormap = colormap or sinebow
  else:
    value = jnp.nan_to_num(
        jnp.clip((depth - jnp.minimum(near, far)) / jnp.abs(far - near), 0, 1))
    colormap = colormap or matplotlib.colormaps["turbo"]

  vis = colormap(value)[:, :, :3]
  return vis * acc[:, :, None] + (1 - acc)[:, :, None]


def visualize_normals(depth, acc, scaling=None):
  """Fake normals of a depth map (rnerf/vis.py:114-132)."""
  if scaling is None:
    mask = ~jnp.isnan(depth)
    x, y = jnp.meshgrid(
        jnp.arange(depth.shape[1]), jnp.arange(depth.shape[0]), indexing="xy")
    xy_var = (jnp.var(x[mask]) + jnp.var(y[mask])) / 2
    z_var = jnp.var(depth[mask])
    scaling = jnp.sqrt(xy_var / z_var)

  normals = depth_to_normals(scaling * depth)
  vis = jnp.isnan(normals) + jnp.nan_to_num((normals + 1) / 2, 0)
  if acc is not None:
    vis = vis * acc[:, :, None] + (1 - acc)[:, :, None]
  return vis


def visualize_suite(depth, acc):
  """Standard eval visualization bundle (rnerf/vis.py:135-142)."""
  return {
      "depth": visualize_depth(depth, acc),
      "depth_mod": visualize_depth(depth, acc, modulus=0.1),
      "depth_normals": visualize_normals(depth, acc),
  }
