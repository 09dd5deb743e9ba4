"""Eikonal curved-ray marching through a voxelized IOR field.

Behavioral parity targets (reference SampleNeRFRO):
  - Euler step x' += (h/n) d, d' += h grad(n): rnerf/eikonal_utils.py:29-49
  - path assembly (init prepend, normalize dirs): rnerf/eikonal_utils.py:100-124
  - residual gradient rotation (Rodrigues): rnerf/ior_utils.py:245-259,301-316

TPU notes: the march is a plain jax.lax.scan over steps with the whole ray
batch vectorized per step (one fused 8-corner gather of the [n, grad n] grid
per step). The residual so3 MLP is only evaluated inside the scan when the
stage actually uses its output ("all"); the reference evaluates it every step
in every stage and discards the result. `unroll` amortizes loop overhead.
"""

import jax
import jax.numpy as jnp

from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import math as math_ops


def rodrigues_rotate(raw_out, condition):
  """Rotate `condition` by the axis-angle vector `raw_out`.

  theta = ||raw_out||, axis e = raw_out/theta; returns |condition| *
  R(e, theta) @ condition_hat. Parity: rnerf/ior_utils.py:249-256 (the
  use_direct_output=True, use_residual=True branch used by all shipped
  configs).
  """
  theta = math_ops.safe_l2_norm(raw_out)
  e = raw_out / theta
  a = math_ops.safe_l2_norm(condition)
  v = condition / a
  return a * (jnp.cos(theta) * v + jnp.sin(theta) * jnp.cross(e, v)
              + (1 - jnp.cos(theta)) * jnp.sum(e * v, axis=-1, keepdims=True) * e)


def spherical_residual(raw_out, condition):
  """Alternative residual head (use_direct_output=False branch).

  Parity: rnerf/ior_utils.py:258-259.
  """
  theta = jnp.tanh(raw_out[..., 0:1]) * jnp.pi
  phi = jnp.tanh(raw_out[..., 1:2]) * jnp.pi
  r = jax.nn.softplus(raw_out[..., 2:3] - 1.0)
  offset = jnp.concatenate([
      jnp.sin(phi) * jnp.cos(theta),
      jnp.sin(phi) * jnp.sin(theta),
      jnp.cos(phi),
  ], axis=-1) * r
  return offset + condition


def march(spec, data, origins, directions, near, step_size, num_samples,
          pred_grad_fn=None, use_pred_grad=False, unroll=8):
  """March curved eikonal paths for a batch of rays.

  Args:
    spec: grid_ops.GridSpec for the IOR grid.
    data: [N^3, 4] flattened grid holding [n, grad n] per voxel.
    origins: [batch, 3] ray origins.
    directions: [batch, 3] ray directions (unnormalized ok; the reference
      passes unit viewdirs).
    near: float, distance to start marching at.
    step_size: float h = (far - near) / (num_samples - 1).
    num_samples: int S, number of path vertices.
    pred_grad_fn: callable (pos [batch, 3], grid_grad [batch, 3]) ->
      [batch, 3] giving the refined gradient (so3-rotated grid gradient);
      required when use_pred_grad.
    use_pred_grad: bool; if True (stage "all") use the refined gradient
      wherever ||grid grad|| > 1e-3 (rnerf/eikonal_utils.py:34-39).
    unroll: lax.scan unroll factor.

  Returns:
    ray_pos: [batch, S, 3] path vertices (first = origin + near*dir).
    ray_dir: [batch, S, 3] unit directions at each vertex.
    ray_dist: [batch, S] cumulative arclength (first = near).
    idx_data: [batch, S, 1] interpolated n at each vertex.
    idx_grad: [batch, S, 3] interpolated grid gradient at each vertex.
  """
  init_pos = origins + near * directions
  init_dist = jnp.full(origins.shape[:-1], near, dtype=origins.dtype)

  def step(carry, _):
    rp, rd, rt = carry
    interp = grid_ops.trilinear(spec, data, rp)
    n = interp[..., :1]
    g = interp[..., 1:]
    if use_pred_grad:
      refined = pred_grad_fn(rp, g)
      grad = jnp.where(
          jnp.linalg.norm(g, axis=-1, keepdims=True) > 1e-3, refined, g)
    else:
      grad = g
    next_rp = rp + step_size / n * rd
    next_rd = rd + step_size * grad
    next_rt = rt + jnp.linalg.norm(rp - next_rp, axis=-1)
    out = (rp, math_ops.safe_l2_normalize(rd), rt, n, g)
    return (next_rp, next_rd, next_rt), out

  carry = (init_pos, directions, init_dist)
  _, (pos, dirs, dist, n, g) = jax.lax.scan(
      step, carry, None, length=num_samples, unroll=unroll)

  # scan stacks on axis 0: [S, batch, ...] -> [batch, S, ...].
  swap = lambda a: jnp.moveaxis(a, 0, 1)
  return swap(pos), swap(dirs), swap(dist), swap(n), swap(g)
