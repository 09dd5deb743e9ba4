"""Pure-functional skip-MLP used inside scanned/fused code paths.

The radiance MLPs are flax modules (samplenerfro_tpu/models/mlp.py); this
functional twin exists so the IOR residual-gradient MLP can be evaluated
inside jax.lax.scan / Pallas kernels without flax scope machinery. Param
layout mirrors model_utils.MLP (rnerf/model_utils.py:93-140): xavier-uniform
hidden kernels, zero biases, configurable output init, ReLU, skip-concat of
the inputs after every `skip_layer`-th hidden layer.

Params are nested dicts {"Dense_i": {"kernel", "bias"}, "Dense_out": ...}
(no tuples/lists) so flax msgpack checkpoints round-trip the structure
exactly even when restored with target=None (checkpoint surgery).
"""

import jax
import jax.numpy as jnp


def mlp_init(rng, in_dim, net_depth=4, net_width=128, skip_layer=2,
             num_out_channels=3, output_init_std=1e-5, dtype=jnp.float32):
  """Initialize params for a skip-MLP.

  output_init_std: if None use xavier uniform for the output layer, else
  normal(stddev=output_init_std) — the reference uses normal(1e-5) for the
  residual so3 head (rnerf/ior_utils.py:148-152).
  """
  xavier = jax.nn.initializers.xavier_uniform()
  params = {}
  dim = in_dim
  for i in range(net_depth):
    rng, key = jax.random.split(rng)
    params[f"Dense_{i}"] = {
        "kernel": xavier(key, (dim, net_width), dtype),
        "bias": jnp.zeros((net_width,), dtype),
    }
    dim = net_width
    if i % skip_layer == 0 and i > 0:
      dim += in_dim
  rng, key = jax.random.split(rng)
  if output_init_std is None:
    out_kernel = xavier(key, (dim, num_out_channels), dtype)
  else:
    out_kernel = jax.nn.initializers.normal(stddev=output_init_std)(
        key, (dim, num_out_channels), dtype)
  params["Dense_out"] = {
      "kernel": out_kernel,
      "bias": jnp.zeros((num_out_channels,), dtype),
  }
  return params


def mlp_apply(params, x, skip_layer=2, activation=jax.nn.relu,
              precision=None):
  """Apply the skip-MLP to [..., in_dim] inputs."""
  shape = x.shape
  x = x.reshape(-1, shape[-1])
  inputs = x
  i = 0
  while f"Dense_{i}" in params:
    layer = params[f"Dense_{i}"]
    x = jnp.dot(x, layer["kernel"], precision=precision) + layer["bias"]
    x = activation(x)
    if i % skip_layer == 0 and i > 0:
      x = jnp.concatenate([x, inputs], axis=-1)
    i += 1
  out = params["Dense_out"]
  x = jnp.dot(x, out["kernel"], precision=precision) + out["bias"]
  return x.reshape(*shape[:-1], x.shape[-1])
