"""Unit tests for spherical harmonics basis, decode, and direction encoding."""

import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import sh as sh_ops


def _unit_dirs(n, seed=0):
  rng = np.random.RandomState(seed)
  d = rng.randn(n, 3)
  return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)


def test_dir_enc_golden_low_bands():
  """Golden values against the tiny-cuda-nn constants (rnerf/sh.py:112-161)."""
  d = _unit_dirs(32)
  x, y, z = [np.array(d[..., i]) for i in range(3)]
  enc = np.array(sh_ops.dir_enc(d, 3))
  np.testing.assert_allclose(enc[:, 0], 0.28209479177387814, atol=1e-6)
  np.testing.assert_allclose(enc[:, 1], -0.48860251190291987 * y, atol=1e-6)
  np.testing.assert_allclose(enc[:, 2], 0.48860251190291987 * z, atol=1e-6)
  np.testing.assert_allclose(enc[:, 3], -0.48860251190291987 * x, atol=1e-6)
  np.testing.assert_allclose(enc[:, 4], 1.0925484305920792 * x * y, atol=1e-6)
  np.testing.assert_allclose(enc[:, 5], -1.0925484305920792 * y * z, atol=1e-6)
  np.testing.assert_allclose(
      enc[:, 6], 0.94617469575755997 * z**2 - 0.31539156525251999, atol=1e-6)
  np.testing.assert_allclose(enc[:, 7], -1.0925484305920792 * x * z, atol=1e-6)
  np.testing.assert_allclose(
      enc[:, 8], 0.54627421529603959 * (x**2 - y**2), atol=1e-6)


def test_dir_enc_golden_band3():
  d = _unit_dirs(32, seed=1)
  x, y, z = [np.array(d[..., i]) for i in range(3)]
  enc = np.array(sh_ops.dir_enc(d, 4))
  np.testing.assert_allclose(
      enc[:, 9], 0.59004358992664352 * y * (-3.0 * x**2 + y**2), atol=1e-5)
  np.testing.assert_allclose(
      enc[:, 12], 0.3731763325901154 * z * (5.0 * z**2 - 3.0), atol=1e-5)
  np.testing.assert_allclose(
      enc[:, 15], 0.59004358992664352 * x * (-x**2 + 3.0 * y**2), atol=1e-5)


def test_sh_basis_orthonormal():
  """Monte-Carlo check: E[Y_i Y_j] over the uniform sphere = delta_ij/(4pi)."""
  d = _unit_dirs(200000, seed=2)
  basis = np.array(sh_ops.sh_basis(5, d), np.float64)
  gram = basis.T @ basis / basis.shape[0] * (4 * np.pi)
  np.testing.assert_allclose(gram, np.eye(25), atol=0.15)


def test_eval_sh_deg0_is_constant_scaling():
  d = _unit_dirs(8)
  coeffs = jnp.asarray(np.random.RandomState(3).randn(8, 3, 1), jnp.float32)
  out = np.array(sh_ops.eval_sh(0, coeffs, d))
  np.testing.assert_allclose(
      out, 0.28209479177387814 * np.array(coeffs)[..., 0], atol=1e-6)


def test_eval_sh_matches_basis_contraction():
  d = _unit_dirs(16, seed=4)
  coeffs = jnp.asarray(np.random.RandomState(5).randn(16, 3, 16), jnp.float32)
  out = np.array(sh_ops.eval_sh(3, coeffs, d))
  basis = np.array(sh_ops.sh_basis(4, d))
  expected = np.einsum("bck,bk->bc", np.array(coeffs), basis)
  np.testing.assert_allclose(out, expected, atol=1e-5)


def test_annealed_dir_enc_limits():
  d = _unit_dirs(16, seed=6)
  full = np.array(sh_ops.annealed_dir_enc(d, 4, alpha=100.0))
  plain = np.array(sh_ops.dir_enc(d, 4))
  np.testing.assert_allclose(full, plain, atol=1e-6)
  zero = np.array(sh_ops.annealed_dir_enc(d, 4, alpha=0.0))
  np.testing.assert_allclose(zero, 0.0, atol=1e-6)
