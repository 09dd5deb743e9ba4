"""Flax radiance MLPs (coarse/fine trunk and the generic conditioned MLP).

Behavioral parity targets (reference SampleNeRFRO):
  - NerfMLP: rnerf/model_utils.py:30-90 (8x256 ReLU trunk, skip at layer 4,
    sigma head off the trunk, bottleneck + viewdir-conditioned RGB head)
  - MLP: rnerf/model_utils.py:93-140 (used for the background envmap head)

TPU notes: inputs are flattened to [batch*num_samples, feature] so every
layer is one large [M, K] x [K, N] matmul on the MXU. Param names follow
linen's Dense_i auto-naming. `dtype=jnp.bfloat16` runs the matmul stack in
bf16 (params stay fp32; raw outputs are cast back to fp32 before the
activation/compositing math) — an opt-in fast path, quality-gated on the
synthetic benchmark (scripts/validate_quality.py).
"""

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import functools


class NerfMLP(nn.Module):
  """JaxNeRF trunk with density and view-conditioned RGB heads."""
  net_depth: int = 8
  net_width: int = 256
  net_depth_condition: int = 1
  net_width_condition: int = 128
  net_activation: Callable[..., Any] = nn.relu
  skip_layer: int = 4
  num_rgb_channels: int = 3
  num_sigma_channels: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, condition=None):
    """Returns (raw_rgb [B, S, Crgb], raw_sigma [B, S, Csigma]) in fp32."""
    feature_dim = x.shape[-1]
    num_samples = x.shape[1]
    x = x.reshape([-1, feature_dim]).astype(self.dtype)
    if condition is not None:
      condition = condition.astype(self.dtype)
    dense_layer = functools.partial(
        nn.Dense, kernel_init=jax.nn.initializers.glorot_uniform(),
        dtype=self.dtype, param_dtype=jnp.float32)
    inputs = x
    for i in range(self.net_depth):
      x = dense_layer(self.net_width)(x)
      x = self.net_activation(x)
      if i % self.skip_layer == 0 and i > 0:
        x = jnp.concatenate([x, inputs], axis=-1)
    raw_sigma = dense_layer(self.num_sigma_channels)(x).reshape(
        [-1, num_samples, self.num_sigma_channels]).astype(jnp.float32)

    if condition is not None:
      bottleneck = dense_layer(self.net_width)(x)
      condition = condition.reshape([-1, condition.shape[-1]])
      x = jnp.concatenate([bottleneck, condition], axis=-1)
      for _ in range(self.net_depth_condition):
        x = dense_layer(self.net_width_condition)(x)
        x = self.net_activation(x)
    raw_rgb = dense_layer(self.num_rgb_channels)(x).reshape(
        [-1, num_samples, self.num_rgb_channels]).astype(jnp.float32)
    return raw_rgb, raw_sigma


class MLP(nn.Module):
  """Generic skip-MLP with optional condition tail (background envmap head)."""
  net_depth: int = 8
  net_width: int = 256
  net_depth_condition: int = 1
  net_width_condition: int = 128
  net_activation: Callable[..., Any] = nn.relu
  skip_layer: int = 4
  num_out_channels: int = 1
  output_init: Callable = jax.nn.initializers.xavier_uniform()

  @nn.compact
  def __call__(self, x, condition=None):
    feature_dim = x.shape[-1]
    num_samples = x.shape[1]
    x = x.reshape([-1, feature_dim])
    dense_layer = functools.partial(
        nn.Dense, kernel_init=jax.nn.initializers.xavier_uniform())
    inputs = x
    for i in range(self.net_depth):
      x = dense_layer(self.net_width)(x)
      x = self.net_activation(x)
      if i % self.skip_layer == 0 and i > 0:
        x = jnp.concatenate([x, inputs], axis=-1)
    if condition is not None:
      condition = condition.reshape([-1, condition.shape[-1]])
      x = jnp.concatenate([x, condition], axis=-1)
      for _ in range(self.net_depth_condition):
        x = dense_layer(self.net_width_condition)(x)
        x = self.net_activation(x)
    raw_out = nn.Dense(self.num_out_channels, kernel_init=self.output_init)(
        x).reshape([-1, num_samples, self.num_out_channels])
    return raw_out
