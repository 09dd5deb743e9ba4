"""Fused NerfMLP kernel vs the flax module (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from samplenerfro_tpu.models import mlp as mlp_modules
from samplenerfro_tpu.ops.pallas import mlp_kernel


def _setup(n=70, feat=63, cond_dim=27, depth=8, width=256):
  key = random.PRNGKey(0)
  mlp = mlp_modules.NerfMLP(net_depth=depth, net_width=width,
                            net_depth_condition=1, net_width_condition=128,
                            skip_layer=4)
  x = random.normal(key, (1, n, feat))
  c = random.normal(random.PRNGKey(1), (1, n, cond_dim))
  variables = mlp.init(random.PRNGKey(2), x, c)
  return mlp, variables["params"], x, c


def test_fused_forward_matches_flax_fp32():
  mlp, params, x, c = _setup()
  rgb_ref, sigma_ref = mlp.apply({"params": params}, x, c)
  rgb, sigma = mlp_kernel.fused_nerf_mlp(
      params, x.reshape(-1, x.shape[-1]), c.reshape(-1, c.shape[-1]),
      dtype="float32", block_m=32, interpret=True)
  np.testing.assert_allclose(np.asarray(rgb),
                             np.asarray(rgb_ref).reshape(-1, 3),
                             atol=2e-5, rtol=2e-5)
  np.testing.assert_allclose(np.asarray(sigma),
                             np.asarray(sigma_ref).reshape(-1, 1),
                             atol=2e-5, rtol=2e-5)


def test_fused_forward_bf16_close_to_fp32():
  mlp, params, x, c = _setup(n=64)
  rgb_ref, _ = mlp.apply({"params": params}, x, c)
  rgb, sigma = mlp_kernel.fused_nerf_mlp(
      params, x.reshape(-1, x.shape[-1]), c.reshape(-1, c.shape[-1]),
      dtype="bfloat16", block_m=32, interpret=True)
  assert rgb.dtype == jnp.float32
  assert np.all(np.isfinite(np.asarray(rgb)))
  np.testing.assert_allclose(np.asarray(rgb),
                             np.asarray(rgb_ref).reshape(-1, 3),
                             atol=0.15)


def test_fused_grads_match_flax_fp32():
  mlp, params, x, c = _setup(n=48)
  xf = x.reshape(-1, x.shape[-1])
  cf = c.reshape(-1, c.shape[-1])
  tgt = random.normal(random.PRNGKey(3), (48, 3))
  tgt_s = random.normal(random.PRNGKey(4), (48, 1))

  def loss_ref(p):
    rgb, sigma = mlp.apply({"params": p}, x, c)
    return (jnp.sum((rgb.reshape(-1, 3) - tgt) ** 2)
            + jnp.sum((sigma.reshape(-1, 1) - tgt_s) ** 2))

  def loss_fused(p):
    rgb, sigma = mlp_kernel.fused_nerf_mlp(
        p, xf, cf, dtype="float32", block_m=16, interpret=True)
    return jnp.sum((rgb - tgt) ** 2) + jnp.sum((sigma - tgt_s) ** 2)

  l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
  l_fused, g_fused = jax.value_and_grad(loss_fused)(params)
  np.testing.assert_allclose(float(l_ref), float(l_fused), rtol=1e-5)
  flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused))
  assert len(flat_ref) == len(flat_fused)
  for path, val in flat_ref:
    got = flat_fused[path]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(val), atol=5e-4, rtol=5e-4,
        err_msg=jax.tree_util.keystr(path))


def test_fused_row_padding_is_inert():
  """N not a multiple of block_m: padded rows do not pollute outputs/grads."""
  mlp, params, x, c = _setup(n=70)
  xf = x.reshape(-1, x.shape[-1])
  cf = c.reshape(-1, c.shape[-1])

  def gsum(p):
    rgb, sigma = mlp_kernel.fused_nerf_mlp(
        p, xf, cf, dtype="float32", block_m=64, interpret=True)
    return jnp.sum(rgb) + jnp.sum(sigma)

  def gsum_ref(p):
    rgb, sigma = mlp.apply({"params": p}, x, c)
    return jnp.sum(rgb) + jnp.sum(sigma)

  g = jax.grad(gsum)(params)
  g_ref = jax.grad(gsum_ref)(params)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              atol=5e-4, rtol=5e-4),
      g, g_ref)


def test_supports_gate():
  assert mlp_kernel.supports(63, 27, 8, 256, 4, 1, 128, 3, 1)
  assert not mlp_kernel.supports(63, 27, 8, 256, 4, 2, 128, 3, 1)
  assert not mlp_kernel.supports(63, 27, 8, 200, 4, 1, 128, 3, 1)
  assert not mlp_kernel.supports(200, 27, 8, 256, 4, 1, 128, 3, 1)


def test_fused_pe_forward_matches_feature_fed_fp32():
  """In-kernel featurization == XLA pos_enc -> feature-fed kernel."""
  from samplenerfro_tpu.ops import math as math_ops
  key = random.PRNGKey(5)
  n, pts_deg, dirs_deg = 70, 10, 4
  pts = random.uniform(key, (n, 3), minval=-1.5, maxval=1.5)
  dirs = random.normal(random.PRNGKey(6), (n, 3))
  dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
  x = math_ops.pos_enc(pts, 0, pts_deg)
  c = math_ops.pos_enc(dirs, 0, dirs_deg)
  mlp = mlp_modules.NerfMLP(net_depth=8, net_width=256,
                            net_depth_condition=1, net_width_condition=128,
                            skip_layer=4)
  params = mlp.init(random.PRNGKey(2), x[None], c[None])["params"]

  rgb_ref, sigma_ref = mlp_kernel.fused_nerf_mlp(
      params, x, c, dtype="float32", block_m=32, interpret=True)
  rgb, sigma = mlp_kernel.fused_nerf_mlp(
      params, pts, dirs, dtype="float32", block_m=32, interpret=True,
      pe=(pts_deg, dirs_deg))
  np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                             atol=1e-6, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref),
                             atol=1e-6, rtol=1e-6)


def test_fused_pe_grads_match_flax_fp32():
  """d/dparams through the featurized kernel == flax pos_enc + NerfMLP."""
  from samplenerfro_tpu.ops import math as math_ops
  n, pts_deg, dirs_deg = 48, 10, 4
  pts = random.uniform(random.PRNGKey(7), (n, 3), minval=-1.5, maxval=1.5)
  dirs = random.normal(random.PRNGKey(8), (n, 3))
  dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
  x = math_ops.pos_enc(pts, 0, pts_deg)[None]
  c = math_ops.pos_enc(dirs, 0, dirs_deg)[None]
  mlp = mlp_modules.NerfMLP(net_depth=8, net_width=256,
                            net_depth_condition=1, net_width_condition=128,
                            skip_layer=4)
  params = mlp.init(random.PRNGKey(2), x, c)["params"]
  tgt = random.normal(random.PRNGKey(3), (n, 3))
  tgt_s = random.normal(random.PRNGKey(4), (n, 1))

  def loss_ref(p):
    rgb, sigma = mlp.apply({"params": p}, x, c)
    return (jnp.sum((rgb.reshape(-1, 3) - tgt) ** 2)
            + jnp.sum((sigma.reshape(-1, 1) - tgt_s) ** 2))

  def loss_pe(p):
    rgb, sigma = mlp_kernel.fused_nerf_mlp(
        p, pts, dirs, dtype="float32", block_m=16, interpret=True,
        pe=(pts_deg, dirs_deg))
    return jnp.sum((rgb - tgt) ** 2) + jnp.sum((sigma - tgt_s) ** 2)

  l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
  l_pe, g_pe = jax.value_and_grad(loss_pe)(params)
  np.testing.assert_allclose(float(l_ref), float(l_pe), rtol=1e-5)
  flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_pe = dict(jax.tree_util.tree_leaves_with_path(g_pe))
  for path, val in flat_ref:
    np.testing.assert_allclose(
        np.asarray(flat_pe[path]), np.asarray(val), atol=5e-4, rtol=5e-4,
        err_msg=jax.tree_util.keystr(path))


def test_fused_pe_row_padding_and_supports():
  from samplenerfro_tpu.ops import math as math_ops
  n, pts_deg, dirs_deg = 70, 10, 4
  pts = random.uniform(random.PRNGKey(9), (n, 3), minval=-1.5, maxval=1.5)
  dirs = random.normal(random.PRNGKey(10), (n, 3))
  x = math_ops.pos_enc(pts, 0, pts_deg)
  c = math_ops.pos_enc(dirs, 0, dirs_deg)
  mlp = mlp_modules.NerfMLP(net_depth=8, net_width=256,
                            net_depth_condition=1, net_width_condition=128,
                            skip_layer=4)
  params = mlp.init(random.PRNGKey(2), x[None], c[None])["params"]
  rgb_ref, _ = mlp_kernel.fused_nerf_mlp(
      params, x, c, dtype="float32", block_m=64, interpret=True)
  rgb, _ = mlp_kernel.fused_nerf_mlp(
      params, pts, dirs, dtype="float32", block_m=64, interpret=True,
      pe=(pts_deg, dirs_deg))
  np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                             atol=1e-6, rtol=1e-6)
  assert mlp_kernel.supports(63, 27, 8, 256, 4, 1, 128, 3, 1, pe=(10, 4))
  assert not mlp_kernel.supports(63, 27, 8, 256, 4, 1, 128, 3, 1, pe=(9, 4))
