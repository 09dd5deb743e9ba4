"""Shared test fixtures: tiny model args, rays, and batches."""

import types

import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.data.rays import Rays


def tiny_args(**overrides):
  args = types.SimpleNamespace(
      model="nerf", net_activation="relu", rgb_activation="sigmoid",
      sigma_activation="softplus",
      min_deg_point=0, max_deg_point=10, deg_view=4,
      num_coarse_samples=8, num_fine_samples=16, scan_unroll=1,
      use_viewdirs=True, sh_deg=-1, sh_direnc_deg=-1,
      near=2.0, far=6.0, noise_std=None, white_bkgd=False,
      net_depth=2, net_width=32, net_depth_condition=1, net_width_condition=16,
      skip_layer=4, num_rgb_channels=3, num_sigma_channels=1, lindisp=False,
      legacy_posenc_order=False, randomized=True,
      stage="radiance_test", num_path_samples=4,
      use_fine_sparsity=False, use_online_sparsity=False, config="example",
      bg_weight=0.025, bg_smooth_weight=1.0, bg_patch_size=4, beta_weight=0.0,
      sparsity_weight=0.0, normal_loss_weight=0.0, normal_smooth_weight=0.0,
      weight_decay_mult=0.0, grad_max_val=0.0, grad_max_norm=0.1,
      lr_init=5e-4, lr_final=5e-6, max_steps=1000, lr_delay_steps=10,
      lr_delay_mult=0.01, anneal_delay_steps=10, anneal_max_steps=100,
      batch_size=32, extra_batch_size=16, dataset="blender",
      batching="single_image", factor=2, use_pixel_centers=True,
      precrop_iters=0, precrop_frac=0.5, render_path=False, skip_frames=1,
      eval_train=False, spherify=False, llffhold=8, chunk=512,
      eval_once=True, save_output=False,
      save_every=10, print_every=5, render_every=0, gc_every=100,
  )
  for k, v in overrides.items():
    setattr(args, k, v)
  return args


def make_rays(batch=32, seed=0):
  rng = np.random.RandomState(seed)
  d = rng.randn(batch, 3)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  return Rays(
      origins=jnp.asarray(rng.randn(batch, 3) * 0.1, jnp.float32),
      directions=jnp.asarray(d, jnp.float32),
      viewdirs=jnp.asarray(d, jnp.float32),
      radii=jnp.full((batch, 1), 0.001, jnp.float32))


def make_grid(n=9, lo=-1.5, hi=1.5, ior=1.1):
  return [n] * 3, [lo] * 3, [hi] * 3, np.full((n**3, 1), ior, np.float32)


def make_blob_grid(n=9, lo=-4.0, hi=4.0, peak=0.33):
  """Gaussian IOR blob centered on the ray near/far segment (non-zero grad)."""
  axes = np.linspace(lo, hi, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  # Blob centered at distance ~4 along +z-ish ray paths.
  vals = 1.0 + peak * np.exp(-((xx)**2 + (yy)**2 + (zz)**2) / 4.0)
  return [n] * 3, [lo] * 3, [hi] * 3, vals.reshape(-1, 1).astype(np.float32)


def make_batch(rays, seed=0, patch=4):
  rng = np.random.RandomState(seed)
  batch = rays.origins.shape[0]
  env = Rays(*[jnp.asarray(rng.randn(patch, patch, 3), jnp.float32)
               for _ in range(4)])
  return {
      "pixels": jnp.asarray(rng.rand(batch, 3), jnp.float32),
      "rays": rays,
      "env_rays": env,
      "pts": jnp.asarray(rng.randn(8, 1, 3), jnp.float32),
      "grads": jnp.asarray(rng.randn(8, 1, 3), jnp.float32),
      "annealed_alpha": jnp.asarray(0.5, jnp.float32),
      "coarse_alpha_target": jnp.asarray(0.0, jnp.float32),
      "fine_alpha_target": jnp.asarray(0.0, jnp.float32),
  }
