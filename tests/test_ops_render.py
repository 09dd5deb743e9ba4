"""Unit tests for volume rendering and hierarchical curved-path sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import render as render_ops


def test_volumetric_rendering_opaque_first_sample():
  """A very dense first sample dominates: rgb -> its color, acc -> 1."""
  B, S = 4, 16
  rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]), (B, S, 3))
  density = jnp.zeros((B, S, 1)).at[:, 0].set(1e5)
  t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
  dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, S, 3))
  comp, dist, acc, weights, alpha, trans, _ = render_ops.volumetric_rendering(
      rgb, density, t_vals, dirs, False, None)
  np.testing.assert_allclose(np.array(comp), [[1.0, 0.5, 0.25]] * B, atol=1e-4)
  np.testing.assert_allclose(np.array(acc), 1.0, atol=1e-4)
  np.testing.assert_allclose(np.array(dist), 2.0, atol=1e-4)
  np.testing.assert_allclose(np.array(trans), 0.0, atol=1e-6)


def test_volumetric_rendering_empty_space():
  """Zero density: weights 0, learned background shines through fully."""
  B, S = 3, 8
  rgb = jnp.zeros((B, S, 3))
  density = jnp.zeros((B, S, 1))
  t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
  dirs = jnp.ones((B, S, 3))
  bkgd = jnp.asarray([[0.2, 0.4, 0.6]] * B)
  comp, _, acc, _, _, trans, trans_bkgd = render_ops.volumetric_rendering(
      rgb, density, t_vals, dirs, False, bkgd)
  np.testing.assert_allclose(np.array(comp), np.array(bkgd), atol=1e-6)
  np.testing.assert_allclose(np.array(acc), 0.0, atol=1e-6)
  np.testing.assert_allclose(np.array(trans), 1.0, atol=1e-6)
  np.testing.assert_allclose(np.array(trans_bkgd), np.array(bkgd), atol=1e-6)


def test_volumetric_rendering_white_bkgd():
  B, S = 2, 8
  comp, *_ = render_ops.volumetric_rendering(
      jnp.zeros((B, S, 3)), jnp.zeros((B, S, 1)),
      jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S)),
      jnp.ones((B, S, 3)), True, None)
  np.testing.assert_allclose(np.array(comp), 1.0, atol=1e-6)


def test_volumetric_rendering_direction_norm_scales_delta():
  """Doubling ||dirs|| doubles optical depth (eikonal non-unit speed)."""
  B, S = 2, 16
  rgb = jnp.ones((B, S, 3)) * 0.5
  density = jnp.ones((B, S, 1)) * 0.3
  t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
  d1 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, S, 3))
  _, _, acc1, *_ = render_ops.volumetric_rendering(rgb, density, t_vals, d1, False, None)
  _, _, acc2, *_ = render_ops.volumetric_rendering(rgb, density, t_vals, 2 * d1, False, None)
  a1, a2 = float(acc1[0]), float(acc2[0])
  np.testing.assert_allclose(1 - a2, (1 - a1) ** 2, atol=1e-4)


def test_mask_bbox_zeroes_density():
  B, S = 2, 8
  rgb = jnp.ones((B, S, 3))
  density = jnp.ones((B, S, 1)) * 10.0
  t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
  dirs = jnp.ones((B, S, 3))
  mask = jnp.zeros((B, S))
  _, _, acc, *_ = render_ops.volumetric_rendering(
      rgb, density, t_vals, dirs, False, None, mask_bbox=mask)
  np.testing.assert_allclose(np.array(acc), 0.0, atol=1e-6)


def test_sorted_pdf_uniform_weights_cover_range():
  key = jax.random.PRNGKey(0)
  B, N = 8, 32
  bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N + 1), (B, N + 1))
  weights = jnp.ones((B, N))
  s = np.array(render_ops.sorted_piecewise_constant_pdf(key, bins, weights, 64, False))
  assert s.min() >= 2.0 - 1e-5 and s.max() <= 6.0 + 1e-5
  np.testing.assert_allclose(s[0], np.linspace(2.0, 6.0, 64), atol=0.1)


def test_sorted_pdf_concentrates_on_heavy_bin():
  key = jax.random.PRNGKey(1)
  B, N = 4, 32
  bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N + 1), (B, N + 1))
  weights = jnp.zeros((B, N)).at[:, 10].set(1.0)
  s = np.array(render_ops.sorted_piecewise_constant_pdf(key, bins, weights, 64, True))
  lo, hi = 2.0 + 10 * 4.0 / N, 2.0 + 11 * 4.0 / N
  frac_inside = np.mean((s >= lo - 1e-3) & (s <= hi + 1e-3))
  assert frac_inside > 0.95


def test_sorted_pdf_degenerate_weights_no_nan():
  key = jax.random.PRNGKey(2)
  bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 9), (2, 9))
  s = np.array(render_ops.sorted_piecewise_constant_pdf(
      key, bins, jnp.zeros((2, 8)), 16, True))
  assert np.all(np.isfinite(s))


def test_reanchor_on_straight_path_is_exact():
  """On a straight path, re-anchoring reproduces origin + t*dir exactly."""
  B, S, M = 4, 64, 48
  o = np.random.RandomState(0).randn(B, 3).astype(np.float32)
  d = np.asarray([[0.0, 0.0, 1.0]] * B, np.float32)
  t = np.linspace(2.0, 6.0, S, dtype=np.float32)
  path_pos = jnp.asarray(o[:, None] + t[None, :, None] * d[:, None])
  path_dir = jnp.broadcast_to(jnp.asarray(d)[:, None], (B, S, 3))
  path_dist = jnp.broadcast_to(jnp.asarray(t), (B, S))
  path_grad = jnp.zeros((B, S, 3))
  z = jnp.sort(jnp.asarray(
      np.random.RandomState(1).uniform(2.0, 6.0, (B, M)).astype(np.float32)), axis=-1)
  pos, dirs, grads = render_ops.reanchor_on_path(
      z, path_pos, path_dir, path_dist, path_grad)
  expected = o[:, None] + np.array(z)[..., None] * d[:, None]
  np.testing.assert_allclose(np.array(pos), expected, atol=1e-4)
  np.testing.assert_allclose(np.array(dirs), np.broadcast_to(d[:, None], (B, M, 3)))


def test_reanchor_left_floor_indexing():
  """Sample between vertices k and k+1 anchors on vertex k (left floor)."""
  path_dist = jnp.asarray([[1.0, 2.0, 3.0]])
  path_pos = jnp.asarray([[[0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0]]])
  path_dir = jnp.asarray([[[0, 0, 1.0], [1, 0, 0.0], [0, 1, 0.0]]])
  path_grad = jnp.zeros((1, 3, 3))
  z = jnp.asarray([[2.5]])
  pos, dirs, _ = render_ops.reanchor_on_path(z, path_pos, path_dir, path_dist, path_grad)
  # anchor = vertex 1 (dist 2.0), extrapolate 0.5 along its dir (x axis).
  np.testing.assert_allclose(np.array(pos[0, 0]), [0.5, 0.0, 2.0], atol=1e-6)
  np.testing.assert_allclose(np.array(dirs[0, 0]), [1.0, 0.0, 0.0], atol=1e-6)


def test_sample_pdf_output_shape_and_sorted():
  key = jax.random.PRNGKey(3)
  B, Nc, S, Nf = 4, 16, 64, 32
  rng = np.random.RandomState(2)
  path_dist = jnp.sort(jnp.asarray(rng.uniform(2, 6, (B, S)), jnp.float32), axis=-1)
  path_pos = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  path_dir = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  path_grad = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  jitter = jnp.asarray(np.arange(0, S, S // Nc))
  zc = path_dist[:, jitter]
  mid = 0.5 * (zc[..., 1:] + zc[..., :-1])
  weights = jnp.asarray(rng.rand(B, Nc - 2), jnp.float32)
  z, pos, dirs, grads = render_ops.sample_pdf(
      key, mid, weights, path_pos, path_dir, path_dist, path_grad,
      Nf, True, jitter, 2.0)
  assert z.shape == (B, Nc + Nf)
  assert pos.shape == (B, Nc + Nf, 3)
  assert np.all(np.diff(np.array(z), axis=-1) >= 0)


def test_add_gaussian_noise_gating():
  key = jax.random.PRNGKey(4)
  x = jnp.zeros((4, 4))
  assert np.allclose(np.array(render_ops.add_gaussian_noise(key, x, None, True)), 0)
  assert np.allclose(np.array(render_ops.add_gaussian_noise(key, x, 1.0, False)), 0)
  noisy = np.array(render_ops.add_gaussian_noise(key, x, 1.0, True))
  assert np.std(noisy) > 0.1


def test_reanchor_two_level_matches_gather():
  """The MXU two-level re-anchor is bit-exact vs flat search + gather."""
  import numpy as np
  rng = np.random.RandomState(3)
  B, S, M = 8, 50, 23  # S=50 not a multiple of the bucket -> exercises pad
  path_dist = jnp.asarray(np.sort(rng.rand(B, S) * 5, axis=-1) + 2)
  path_pos = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  path_dir = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  path_grad = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
  # Samples spanning below/inside/above the path range, plus exact ties.
  z = np.sort(rng.rand(B, M) * 9, axis=-1).astype(np.float32)
  z[:, 0] = 0.5              # below every vertex
  z[:, -1] = 50.0            # above every vertex
  z[:, 5] = np.asarray(path_dist)[:, 7]  # exact tie with a vertex
  z = jnp.asarray(z)

  for bucket in (4, 8, 16, 64):
    out_two = render_ops.reanchor_on_path(z, path_pos, path_dir, path_dist,
                                          path_grad, method="two_level",
                                          bucket=bucket)
    out_ref = render_ops.reanchor_on_path(z, path_pos, path_dir, path_dist,
                                          path_grad, method="gather")
    for name, a, b in zip(("pos", "dir", "grad"), out_two, out_ref):
      np.testing.assert_array_equal(np.array(a), np.array(b),
                                    err_msg=f"{name} bucket={bucket}")
