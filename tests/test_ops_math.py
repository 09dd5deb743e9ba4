"""Unit tests for safe math, positional encodings, and the LR schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenerfro_tpu.ops import math as math_ops


def test_safe_l2_norm_zero_gradient():
  g = jax.grad(lambda x: math_ops.safe_l2_norm(x)[0])(jnp.zeros(3))
  assert np.all(np.isfinite(np.array(g)))


def test_safe_log_clamps():
  assert np.isfinite(float(math_ops.safe_log(jnp.asarray(0.0))))
  np.testing.assert_allclose(
      float(math_ops.safe_log(jnp.asarray(2.0))), np.log(2.0), rtol=1e-6)


def test_safe_trig_large_args():
  x = jnp.asarray([1e8, -1e8, 3.0])
  assert np.all(np.isfinite(np.array(math_ops.safe_sin(x))))
  assert np.all(np.isfinite(np.array(math_ops.safe_cos(x))))
  np.testing.assert_allclose(
      float(math_ops.safe_sin(jnp.asarray(0.5))), np.sin(0.5), atol=1e-6)


def test_pos_enc_analytic():
  """PE of a scalar x at degs [0,2): [x, sin(x), sin(2x), cos(x), cos(2x)]."""
  x = jnp.asarray([[0.3]])
  enc = np.array(math_ops.pos_enc(x, 0, 2))
  expected = [0.3, np.sin(0.3), np.sin(0.6), np.cos(0.3), np.cos(0.6)]
  np.testing.assert_allclose(enc[0], expected, atol=1e-6)


def test_pos_enc_legacy_order():
  """Legacy ordering interleaves sin/cos per degree."""
  x = jnp.asarray([[0.3]])
  enc = np.array(math_ops.pos_enc(x, 0, 2, legacy_posenc_order=True))
  expected = [0.3, np.sin(0.3), np.cos(0.3), np.sin(0.6), np.cos(0.6)]
  np.testing.assert_allclose(enc[0], expected, atol=1e-6)


def test_pos_enc_degenerate_degrees_returns_x():
  x = jnp.ones((4, 3))
  assert math_ops.pos_enc(x, 3, 3).shape == (4, 3)


def test_annealed_pos_enc_no_raw_x_prefix():
  """annealed_pos_enc returns only windowed sinusoids (2*3*deg features)."""
  x = jnp.ones((4, 1, 3))
  enc = math_ops.annealed_pos_enc(x, 0, 10, alpha=10.0)
  assert enc.shape == (4, 1, 60)


def test_annealed_pos_enc_window_limits():
  x = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
  full = np.array(math_ops.annealed_pos_enc(x, 0, 4, alpha=100.0))
  plain = np.array(math_ops.pos_enc(x, 0, 4))[..., 3:]
  # alpha >> num_bands: window = 1 everywhere -> matches plain sinusoids.
  # Feature orders differ (annealed groups [sin*w, cos*w] per degree), so
  # compare sorted values.
  np.testing.assert_allclose(np.sort(full, -1), np.sort(plain, -1), atol=1e-5)
  zero = np.array(math_ops.annealed_pos_enc(x, 0, 4, alpha=0.0))
  np.testing.assert_allclose(zero, 0.0, atol=1e-6)


def test_cosine_easing_window_monotone():
  w0 = np.array(math_ops.cosine_easing_window(0, 9, 10, 0.0))
  w5 = np.array(math_ops.cosine_easing_window(0, 9, 10, 5.0))
  w10 = np.array(math_ops.cosine_easing_window(0, 9, 10, 10.0))
  assert np.all(w0 <= w5 + 1e-6) and np.all(w5 <= w10 + 1e-6)
  np.testing.assert_allclose(w10, 1.0, atol=1e-6)


def test_learning_rate_decay_endpoints():
  # step 0 is always 0 (start_rate clips to 0); training starts at step 1.
  lr0 = float(math_ops.learning_rate_decay(
      0, 5e-4, 5e-6, 200000, lr_delay_steps=2500, lr_delay_mult=0.01))
  assert lr0 == 0.0
  lr1 = float(math_ops.learning_rate_decay(
      1, 5e-4, 5e-6, 200000, lr_delay_steps=2500, lr_delay_mult=0.01))
  np.testing.assert_allclose(lr1, 5e-4 * 0.01, rtol=0.1)
  lr_end = float(math_ops.learning_rate_decay(
      200000, 5e-4, 5e-6, 200000, lr_delay_steps=2500, lr_delay_mult=0.01))
  np.testing.assert_allclose(lr_end, 5e-6, rtol=1e-3)


def test_learning_rate_decay_delayed_start():
  lr = float(math_ops.learning_rate_decay(
      10, 5e-4, 5e-6, 1000, lr_delay_steps=0, lr_start_steps=50))
  assert lr == 0.0
  lr2 = float(math_ops.learning_rate_decay(
      51, 5e-4, 5e-6, 1000, lr_delay_steps=0, lr_start_steps=50))
  assert lr2 > 0.0
