"""Unit tests for the eikonal marcher and residual-gradient rotation."""

import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import grid as grid_ops


def _uniform_grid(n=9, lo=-2.0, hi=2.0, ior=1.0):
  spec = grid_ops.GridSpec([n] * 3, [lo] * 3, [hi] * 3)
  values = jnp.full((n**3, 1), ior, jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  return spec, jnp.concatenate([values, grad], axis=-1)


def test_march_straight_when_ior_constant():
  """n == 1 everywhere: Euler integration degenerates to a straight ray."""
  spec, data = _uniform_grid(ior=1.0)
  B, S, near, far = 4, 32, 0.5, 3.5
  h = (far - near) / (S - 1)
  rng = np.random.RandomState(0)
  o = jnp.asarray(rng.randn(B, 3) * 0.1, jnp.float32)
  d = rng.randn(B, 3)
  d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
  pos, dirs, dist, n, g = eik_ops.march(spec, data, o, d, near, h, S)
  t = near + h * np.arange(S)
  expected = np.array(o)[:, None] + t[None, :, None] * np.array(d)[:, None]
  np.testing.assert_allclose(np.array(pos), expected, atol=1e-5)
  np.testing.assert_allclose(np.array(dist), np.broadcast_to(t, (B, S)), atol=1e-5)
  np.testing.assert_allclose(
      np.array(dirs), np.broadcast_to(np.array(d)[:, None], (B, S, 3)), atol=1e-5)
  np.testing.assert_allclose(np.array(n), 1.0, atol=1e-5)
  np.testing.assert_allclose(np.array(g), 0.0, atol=1e-5)


def test_march_slows_in_dense_medium():
  """n == 1.5 uniform: positions advance at speed h/n but arclength matches."""
  spec, data = _uniform_grid(ior=1.5)
  B, S, near = 2, 16, 0.2
  h = 0.1
  o = jnp.zeros((B, 3))
  d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
  pos, dirs, dist, n, _ = eik_ops.march(spec, data, o, d, near, h, S)
  # Per-step spatial advance = h / 1.5.
  step_len = np.diff(np.array(pos)[0, :, 2])
  np.testing.assert_allclose(step_len, h / 1.5, atol=1e-5)
  np.testing.assert_allclose(np.diff(np.array(dist)[0]), h / 1.5, atol=1e-5)
  np.testing.assert_allclose(np.array(n), 1.5, atol=1e-4)


def test_march_bends_toward_gradient():
  """A lateral IOR gradient bends the ray toward increasing n."""
  n_res = 17
  spec = grid_ops.GridSpec([n_res] * 3, [-2.0] * 3, [2.0] * 3)
  axes = np.linspace(-2, 2, n_res)
  xx, _, _ = np.meshgrid(axes, axes, axes, indexing="ij")
  values = jnp.asarray((1.0 + 0.2 * xx).reshape(-1, 1), jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  data = jnp.concatenate([values, grad], axis=-1)
  o = jnp.asarray([[0.0, 0.0, -1.5]])
  d = jnp.asarray([[0.0, 0.0, 1.0]])
  pos, dirs, *_ = eik_ops.march(spec, data, o, d, 0.0, 0.05, 40)
  # d' += h * grad n with grad n = +0.2 x-hat -> ray curves toward +x.
  assert float(pos[0, -1, 0]) > 1e-3
  assert float(dirs[0, -1, 0]) > 1e-3


def test_march_unroll_invariance():
  spec, data = _uniform_grid(ior=1.2)
  o = jnp.asarray([[0.1, -0.2, 0.0]])
  d = jnp.asarray([[0.0, 1.0, 0.0]])
  outs1 = eik_ops.march(spec, data, o, d, 0.1, 0.05, 24, unroll=1)
  outs8 = eik_ops.march(spec, data, o, d, 0.1, 0.05, 24, unroll=8)
  for a, b in zip(outs1, outs8):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_march_pred_grad_override():
  """In 'all' mode the refined gradient is used where ||grid grad|| > 1e-3."""
  n_res = 17
  spec = grid_ops.GridSpec([n_res] * 3, [-2.0] * 3, [2.0] * 3)
  axes = np.linspace(-2, 2, n_res)
  xx, _, _ = np.meshgrid(axes, axes, axes, indexing="ij")
  values = jnp.asarray((1.0 + 0.2 * xx).reshape(-1, 1), jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  data = jnp.concatenate([values, grad], axis=-1)
  o = jnp.asarray([[0.0, 0.0, -1.5]])
  d = jnp.asarray([[0.0, 0.0, 1.0]])

  # Refined gradient points along -x instead of +x: the ray must bend -x.
  pred_fn = lambda rp, g: jnp.broadcast_to(jnp.asarray([-0.2, 0.0, 0.0]), rp.shape)
  pos, *_ = eik_ops.march(spec, data, o, d, 0.0, 0.05, 40,
                          pred_grad_fn=pred_fn, use_pred_grad=True)
  assert float(pos[0, -1, 0]) < -1e-3


def test_rodrigues_identity_and_rotation():
  cond = jnp.asarray([[1.0, 0.0, 0.0]])
  # Tiny axis-angle: output ~ condition (residual init is ~0).
  out = np.array(eik_ops.rodrigues_rotate(jnp.full((1, 3), 1e-8), cond))
  np.testing.assert_allclose(out, [[1.0, 0.0, 0.0]], atol=1e-5)
  # 90 degrees about +z maps x-hat to y-hat, preserving magnitude.
  axis = jnp.asarray([[0.0, 0.0, np.pi / 2]])
  out = np.array(eik_ops.rodrigues_rotate(axis, 2.0 * cond))
  np.testing.assert_allclose(out, [[0.0, 2.0, 0.0]], atol=1e-5)


def test_spherical_residual_adds_offset():
  raw = jnp.zeros((4, 3))
  cond = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
  out = np.array(eik_ops.spherical_residual(raw, cond))
  # raw=0 -> offset = softplus(-1) * z-hat.
  offset = np.log1p(np.exp(-1.0))
  np.testing.assert_allclose(out, np.array(cond) + [0, 0, offset], atol=1e-5)
