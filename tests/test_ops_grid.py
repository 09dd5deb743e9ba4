"""Unit tests for voxel-grid interpolation, gradients, and prefiltering."""

import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import grid as grid_ops


def _spec(n=9, lo=-1.0, hi=1.0):
  return grid_ops.GridSpec([n] * 3, [lo] * 3, [hi] * 3)


def _linear_field(spec, a=(0.5, -0.25, 1.5), b=2.0):
  """f(x) = a.x + b sampled on the grid — trilinear interp is exact on it."""
  n = spec.ndim[0]
  axes = [np.linspace(spec.nmin[i], spec.nmax[i], spec.ndim[i]) for i in range(3)]
  xx, yy, zz = np.meshgrid(*axes, indexing="ij")
  f = a[0] * xx + a[1] * yy + a[2] * zz + b
  return jnp.asarray(f.reshape(-1, 1), jnp.float32)


def test_trilinear_exact_on_linear_field():
  spec = _spec()
  a, b = (0.5, -0.25, 1.5), 2.0
  data = _linear_field(spec, a, b)
  rng = np.random.RandomState(0)
  pts = rng.uniform(-0.95, 0.95, size=(128, 3)).astype(np.float32)
  out = np.array(grid_ops.trilinear(spec, data, jnp.asarray(pts)))
  expected = pts @ np.asarray(a) + b
  np.testing.assert_allclose(out[:, 0], expected, atol=1e-5)


def test_trilinear_clamps_to_edge():
  spec = _spec()
  data = _linear_field(spec)
  far_out = jnp.asarray([[50.0, 50.0, 50.0]])
  corner = jnp.asarray([[1.0, 1.0, 1.0]])
  np.testing.assert_allclose(
      np.array(grid_ops.trilinear(spec, data, far_out)),
      np.array(grid_ops.trilinear(spec, data, corner)), atol=1e-5)


def test_trilinear_at_vertices_matches_data():
  spec = _spec(5)
  rng = np.random.RandomState(1)
  data = jnp.asarray(rng.randn(125, 2), jnp.float32)
  # Query exactly at grid vertices.
  idx = rng.randint(0, 5, size=(32, 3))
  pts = spec.nmin[0] + idx * spec.ndelta[0]
  out = np.array(grid_ops.trilinear(spec, data, jnp.asarray(pts, jnp.float32)))
  flat = idx[:, 0] * 25 + idx[:, 1] * 5 + idx[:, 2]
  np.testing.assert_allclose(out, np.array(data)[flat], atol=1e-4)


def test_nearest_matches_vertices():
  spec = _spec(5)
  rng = np.random.RandomState(2)
  data = jnp.asarray(rng.randn(125, 1), jnp.float32)
  idx = rng.randint(0, 5, size=(16, 3))
  pts = spec.nmin[0] + (idx + 0.2) * spec.ndelta[0]  # rounds to idx
  out = np.array(grid_ops.nearest(spec, data, jnp.asarray(pts, jnp.float32)))
  flat = idx[:, 0] * 25 + idx[:, 1] * 5 + idx[:, 2]
  np.testing.assert_allclose(out, np.array(data)[flat], atol=1e-6)


def test_central_difference_grad_linear_field():
  spec = _spec()
  a = (0.5, -0.25, 1.5)
  data = _linear_field(spec, a)
  g = np.array(grid_ops.central_difference_grad(spec, data)).reshape(9, 9, 9, 3)
  # Interior voxels see the exact gradient; edges see half (edge padding).
  np.testing.assert_allclose(g[1:-1, 1:-1, 1:-1], np.broadcast_to(
      np.asarray(a), g[1:-1, 1:-1, 1:-1].shape), atol=1e-5)
  np.testing.assert_allclose(g[0, 4, 4, 0], a[0] / 2, atol=1e-5)


def test_gaussian_prefilter_preserves_constant_and_mass():
  spec = _spec(9)
  const = jnp.ones((9**3, 1), jnp.float32) * 1.33
  out = np.array(grid_ops.gaussian_prefilter(const, (9, 9, 9), 3, 1.0))
  np.testing.assert_allclose(out, 1.33, atol=1e-5)
  # A delta is smeared but stays non-negative and peaked at the center.
  delta = np.zeros((9, 9, 9), np.float32)
  delta[4, 4, 4] = 1.0
  blurred = np.array(grid_ops.gaussian_prefilter(
      jnp.asarray(delta.reshape(-1, 1)), (9, 9, 9), 3, 1.0)).reshape(9, 9, 9)
  assert blurred[4, 4, 4] == blurred.max()
  assert blurred.min() >= 0
  assert 0 < blurred[4, 4, 4] < 1


def test_trilinear_numpy_matches_jax():
  spec = _spec(7)
  rng = np.random.RandomState(3)
  data = rng.randn(343, 3).astype(np.float32)
  pts = rng.uniform(-1.3, 1.3, size=(64, 3)).astype(np.float32)
  a = grid_ops.trilinear_numpy(spec, data, pts)
  b = np.array(grid_ops.trilinear(spec, jnp.asarray(data), jnp.asarray(pts)))
  np.testing.assert_allclose(a, b, atol=1e-5)
