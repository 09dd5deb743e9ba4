"""Voxel-grid primitives: trilinear interpolation, gradients, prefiltering.

Behavioral parity targets (reference SampleNeRFRO):
  - trilinear interp with clamp-to-edge: rnerf/ior_utils.py:188-223 (_linear3)
  - nearest-neighbor interp: rnerf/ior_utils.py:174-186 (_nn3)
  - central-difference gradient grid: rnerf/ior_utils.py:165-172
  - 3D Gaussian prefilter: rnerf/ior_utils.py:327-363 (conv3d_normal)

TPU notes: interpolation is expressed as ONE fused gather of the 8 corner
values from a flattened [N^3, C] array (flat integer indices), rather than 8
separate advanced-indexing gathers — XLA lowers it to a single gather HLO
with a [batch, 8] index tensor, which tiles far better on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


class GridSpec:
  """Static description of a voxel grid's domain (hashable, jit-friendly)."""

  __slots__ = ("ndim", "nmin", "nmax", "ndelta")

  def __init__(self, ndim, nmin, nmax):
    self.ndim = tuple(int(n) for n in ndim)
    self.nmin = tuple(float(v) for v in nmin)
    self.nmax = tuple(float(v) for v in nmax)
    self.ndelta = tuple(
        (self.nmax[i] - self.nmin[i]) / (self.ndim[i] - 1.0) for i in range(3))

  def __hash__(self):
    return hash((self.ndim, self.nmin, self.nmax))

  def __eq__(self, other):
    return (isinstance(other, GridSpec) and self.ndim == other.ndim
            and self.nmin == other.nmin and self.nmax == other.nmax)


def _normalized_coords(spec, pts):
  """World points -> continuous voxel coordinates (no clamping)."""
  coords = []
  for i in range(3):
    coords.append((pts[..., i] - spec.nmin[i]) / spec.ndelta[i])
  return coords


def trilinear(spec, data, pts):
  """Clamp-to-edge trilinear interpolation.

  Args:
    spec: GridSpec.
    data: [Nx*Ny*Nz, C] flattened grid values (x-major: idx = (x*Ny + y)*Nz + z).
    pts: [..., 3] world-space query points.

  Returns:
    [..., C] interpolated values. Parity: rnerf/ior_utils.py:188-223.
  """
  nx, ny, nz = spec.ndim
  x, y, z = _normalized_coords(spec, pts)

  x0f = jnp.floor(x)
  y0f = jnp.floor(y)
  z0f = jnp.floor(z)
  xd = (x - x0f)[..., None]
  yd = (y - y0f)[..., None]
  zd = (z - z0f)[..., None]

  x0 = jnp.clip(x0f.astype(jnp.int32), 0, nx - 1)
  x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, nx - 1)
  y0 = jnp.clip(y0f.astype(jnp.int32), 0, ny - 1)
  y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, ny - 1)
  z0 = jnp.clip(z0f.astype(jnp.int32), 0, nz - 1)
  z1 = jnp.clip(z0f.astype(jnp.int32) + 1, 0, nz - 1)

  # One fused gather for all 8 corners: [..., 8] flat indices.
  sy, sx = nz, ny * nz
  base00 = sx * x0
  base01 = sx * x1
  idx = jnp.stack([
      base00 + sy * y0 + z0,  # c000
      base01 + sy * y0 + z0,  # c100
      base00 + sy * y0 + z1,  # c001
      base01 + sy * y0 + z1,  # c101
      base00 + sy * y1 + z0,  # c010
      base01 + sy * y1 + z0,  # c110
      base00 + sy * y1 + z1,  # c011
      base01 + sy * y1 + z1,  # c111
  ], axis=-1)
  corners = jnp.take(data, idx, axis=0)  # [..., 8, C]

  c000, c100, c001, c101, c010, c110, c011, c111 = [
      corners[..., i, :] for i in range(8)]
  c00 = c000 * (1 - xd) + c100 * xd
  c01 = c001 * (1 - xd) + c101 * xd
  c10 = c010 * (1 - xd) + c110 * xd
  c11 = c011 * (1 - xd) + c111 * xd
  c0 = c00 * (1 - yd) + c10 * yd
  c1 = c01 * (1 - yd) + c11 * yd
  return c0 * (1 - zd) + c1 * zd


def nearest(spec, data, pts):
  """Nearest-neighbor lookup (rnerf/ior_utils.py:174-186)."""
  nx, ny, nz = spec.ndim
  x, y, z = _normalized_coords(spec, pts)
  x0 = jnp.clip(jnp.round(x).astype(jnp.int32), 0, nx - 1)
  y0 = jnp.clip(jnp.round(y).astype(jnp.int32), 0, ny - 1)
  z0 = jnp.clip(jnp.round(z).astype(jnp.int32), 0, nz - 1)
  return jnp.take(data, (ny * nz) * x0 + nz * y0 + z0, axis=0)


def central_difference_grad(spec, values):
  """Precompute the gradient grid with edge-replicated central differences.

  Args:
    spec: GridSpec.
    values: [Nx*Ny*Nz, 1] (or [Nx*Ny*Nz]) scalar field.

  Returns:
    [Nx*Ny*Nz, 3] gradient vectors. Parity: rnerf/ior_utils.py:165-172.
  """
  nx, ny, nz = spec.ndim
  v = jnp.reshape(jnp.asarray(values), (nx, ny, nz))
  padded = jnp.pad(v, ((1, 1), (1, 1), (1, 1)), mode="edge")
  dx = (padded[2:, 1:-1, 1:-1] - padded[:-2, 1:-1, 1:-1]) / (2 * spec.ndelta[0])
  dy = (padded[1:-1, 2:, 1:-1] - padded[1:-1, :-2, 1:-1]) / (2 * spec.ndelta[1])
  dz = (padded[1:-1, 1:-1, 2:] - padded[1:-1, 1:-1, :-2]) / (2 * spec.ndelta[2])
  return jnp.stack([dx, dy, dz], axis=-1).reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("ndim", "ws"))
def gaussian_prefilter(grid, ndim, ws, sigma):
  """Blur a scalar voxel grid with an isotropic 3D Gaussian, edge-padded.

  Args:
    grid: [N^3, 1] (or broadcastable) refractive-index values.
    ndim: (Nx, Ny, Nz) tuple.
    ws: int kernel size (odd).
    sigma: float std of the Gaussian.

  Returns:
    [N^3, 1] blurred values. Parity: rnerf/ior_utils.py:327-363.
  """
  hws = ws // 2
  data = jnp.asarray(grid).reshape(ndim[0], ndim[1], ndim[2])
  data = jnp.pad(data, ((hws, hws), (hws, hws), (hws, hws)), "edge")
  data = data[None, ..., None]  # NHWDC

  a = jnp.linspace(-hws, hws, ws)
  xx, yy, zz = jnp.meshgrid(a, a, a)
  kernel = jnp.exp(-(xx**2 + yy**2 + zz**2) / (2.0 * sigma**2))
  kernel = (kernel / jnp.sum(kernel))[..., None, None]  # HWDIO

  dn = jax.lax.conv_dimension_numbers(data.shape, kernel.shape,
                                      ("NHWDC", "HWDIO", "NHWDC"))
  out = jax.lax.conv_general_dilated(data, kernel, (1, 1, 1), "VALID",
                                     (1, 1, 1), (1, 1, 1), dn,
                                     precision=jax.lax.Precision.HIGHEST)
  return out[0].reshape(-1, 1)


def central_difference_grad_numpy(spec, values):
  """NumPy twin of central_difference_grad for host-side preprocessing.

  Flagship grids (384^3/512^3) must be prepared on the host: [N^3, C]
  op outputs on TPU are laid out with (8, 128) tiling, padding the minor
  dim 32x (a 512^3 gradient intermediate would be ~86 GB of HBM).
  """
  nx, ny, nz = spec.ndim
  v = np.asarray(values, np.float32).reshape(nx, ny, nz)
  padded = np.pad(v, ((1, 1), (1, 1), (1, 1)), mode="edge")
  dx = (padded[2:, 1:-1, 1:-1] - padded[:-2, 1:-1, 1:-1]) / (2 * spec.ndelta[0])
  dy = (padded[1:-1, 2:, 1:-1] - padded[1:-1, :-2, 1:-1]) / (2 * spec.ndelta[1])
  dz = (padded[1:-1, 1:-1, 2:] - padded[1:-1, 1:-1, :-2]) / (2 * spec.ndelta[2])
  return np.stack([dx, dy, dz], axis=-1).reshape(-1, 3)


def trilinear_numpy(spec, data, pts):
  """NumPy twin of `trilinear` for host-side dataset code.

  Parity: rnerf/datasets.py:278-313 (Grid._linear3).
  """
  nx, ny, nz = spec.ndim
  data = np.asarray(data)
  pts = np.asarray(pts)
  x = (pts[..., 0] - spec.nmin[0]) / spec.ndelta[0]
  y = (pts[..., 1] - spec.nmin[1]) / spec.ndelta[1]
  z = (pts[..., 2] - spec.nmin[2]) / spec.ndelta[2]
  x0f, y0f, z0f = np.floor(x), np.floor(y), np.floor(z)
  xd, yd, zd = (x - x0f)[..., None], (y - y0f)[..., None], (z - z0f)[..., None]
  x0 = np.clip(x0f.astype(int), 0, nx - 1)
  x1 = np.clip(x0f.astype(int) + 1, 0, nx - 1)
  y0 = np.clip(y0f.astype(int), 0, ny - 1)
  y1 = np.clip(y0f.astype(int) + 1, 0, ny - 1)
  z0 = np.clip(z0f.astype(int), 0, nz - 1)
  z1 = np.clip(z0f.astype(int) + 1, 0, nz - 1)
  sy, sx = nz, ny * nz
  c000 = data[sx * x0 + sy * y0 + z0]
  c100 = data[sx * x1 + sy * y0 + z0]
  c001 = data[sx * x0 + sy * y0 + z1]
  c101 = data[sx * x1 + sy * y0 + z1]
  c010 = data[sx * x0 + sy * y1 + z0]
  c110 = data[sx * x1 + sy * y1 + z0]
  c011 = data[sx * x0 + sy * y1 + z1]
  c111 = data[sx * x1 + sy * y1 + z1]
  c00 = c000 * (1 - xd) + c100 * xd
  c01 = c001 * (1 - xd) + c101 * xd
  c10 = c010 * (1 - xd) + c110 * xd
  c11 = c011 * (1 - xd) + c111 * xd
  c0 = c00 * (1 - yd) + c10 * yd
  c1 = c01 * (1 - yd) + c11 * yd
  return c0 * (1 - zd) + c1 * zd
