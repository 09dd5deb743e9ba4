"""Tests for the experimental Pallas fused march kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops.pallas import march_kernel


def test_pallas_march_matches_xla_tiled():
  n = 64
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  axes = np.linspace(-1.5, 1.5, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = (1.0 + 0.3 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)).reshape(-1, 1)
  values = jnp.asarray(vals, jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  data = jnp.concatenate([values, grad], axis=-1)

  # One coherent pencil of 16 rays.
  rng = np.random.RandomState(0)
  d = np.array([[0.002 * i, 0.001 * j, 1.0]
                for i in range(4) for j in range(4)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  o, d = jnp.asarray(o), jnp.asarray(d)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)

  # The Pallas kernel's alignment-forced window is 8x16x64, so give the XLA
  # reference a window that also covers the bundle without clamping.
  ref = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=16, refetch_every=4)
  assert int(ref[5]) == 0, "reference clamped; enlarge its window"
  out = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=8,
      refetch_every=8, interpret=True)
  assert int(out[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref[:5], out[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4,
                               err_msg=name)
