"""Tests for the fused Pallas march kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_kernel


def _setup(n=64):
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  axes = np.linspace(-1.5, 1.5, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = (1.0 + 0.3 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)).reshape(-1, 1)
  values = jnp.asarray(vals, jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  data = jnp.concatenate([values, grad], axis=-1)
  return spec, data


def _pencil(nrays=16, spread=0.002):
  d = np.array([[spread * (i % 4), spread / 2 * (i // 4), 1.0]
                for i in range(nrays)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("window", [8, 16, 32])
def test_pallas_march_matches_xla_tiled(window):
  spec, data = _setup()
  o, d = _pencil()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)

  ref = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=16, refetch_every=4)
  assert int(ref[5]) == 0, "reference clamped; enlarge its window"
  out = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=window,
      refetch_every=8, interpret=True)
  assert int(out[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref[:5], out[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4,
                               err_msg=name)


def test_pallas_march_multiblock():
  """Two blocks with different window origins advance in one kernel."""
  spec, data = _setup()
  o1, d1 = _pencil(16)
  # Second pencil offset sideways (different grid windows).
  o2 = o1 + jnp.asarray([0.8, -0.5, 0.0])
  o = jnp.concatenate([o1, o2], axis=0)
  d = jnp.concatenate([d1, d1], axis=0)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)

  ref = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=16, refetch_every=4)
  assert int(ref[5]) == 0
  out = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=8,
      refetch_every=8, interpret=True)
  assert int(out[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref[:5], out[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4,
                               err_msg=name)


def test_pallas_march_so3_path():
  """In-kernel so3 refinement (PE + skip-MLP + Rodrigues) vs the XLA path."""
  from samplenerfro_tpu.ops import math as math_ops
  from samplenerfro_tpu.ops import eikonal as eik_ops

  spec, data = _setup()
  o, d = _pencil()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  max_deg = 10
  alpha = 0.6

  so3 = fmlp.mlp_init(random.PRNGKey(3), 2 * 3 * max_deg,
                      output_init_std=5e-3)

  def pred_grad_fn(rp, g):
    raw = fmlp.mlp_apply(
        so3, math_ops.annealed_pos_enc(rp, 0, max_deg,
                                       alpha=alpha * max_deg))
    return eik_ops.rodrigues_rotate(raw, g)

  ref = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=16, refetch_every=4,
                         pred_grad_fn=pred_grad_fn, use_pred_grad=True)
  assert int(ref[5]) == 0
  out = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=8,
      refetch_every=8, so3_params=so3, annealed_alpha=alpha,
      max_deg=max_deg, interpret=True)
  assert int(out[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref[:5], out[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                               err_msg=name)


def test_pallas_march_counts_violations():
  """An incoherent 'block' must report clamps, like the XLA marcher."""
  spec, data = _setup()
  rng = np.random.RandomState(0)
  d = rng.randn(16, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = (rng.randn(16, 3) * 1.0).astype(np.float32)
  out = march_kernel.march_tiled_pallas(
      spec, jnp.asarray(data), jnp.asarray(o), jnp.asarray(d), 2.0,
      4.0 / 31, 32, block_size=16, window=8, refetch_every=8,
      interpret=True)
  assert int(out[5]) > 0


def test_supports_predicate():
  spec, _ = _setup(64)
  assert march_kernel.supports(spec, 32, 1024, block_size=256, window=8,
                               refetch_every=8)
  small = grid_ops.GridSpec([33] * 3, [-1] * 3, [1] * 3)
  assert not march_kernel.supports(small, 32, 1024, block_size=256, window=8)
  assert not march_kernel.supports(spec, 30, 1024, block_size=256, window=8,
                                   refetch_every=8)  # S % refetch != 0
  # Lane-packed layout wants full 128-lane blocks in production.
  assert not march_kernel.supports(spec, 32, 1024, block_size=16, window=8)


def test_pallas_march_vmem_split_exact(monkeypatch):
  """Batches above the VMEM block budget split into identical sub-calls."""
  spec, data = _setup()
  o1, d1 = _pencil(16)
  o = jnp.concatenate([o1, o1 + jnp.asarray([0.8, -0.5, 0.0]),
                       o1 + jnp.asarray([-0.6, 0.4, 0.0]),
                       o1 + jnp.asarray([0.0, 0.9, 0.0])], axis=0)
  d = jnp.concatenate([d1] * 4, axis=0)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)

  kwargs = dict(block_size=16, window=16, refetch_every=8, interpret=True)
  whole = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                          **kwargs)
  # Budget for ~1.5 blocks -> 4 blocks split into ceil(4/1) or 2-block calls.
  monkeypatch.setattr(
      march_kernel, "_VMEM_BUDGET_BYTES",
      int(1.5 * march_kernel._per_block_vmem_bytes(16, 8, 16)))
  assert march_kernel.max_blocks_per_call(16, 8, 16) == 1
  split = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                          **kwargs)
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), whole[:5],
                        split[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=0,
                               err_msg=name)
  assert int(whole[5]) == int(split[5])


def test_unroll_vmem_model_ground_truth():
  """The unroll-aware VMEM model reproduces compile-probe ground truth.

  Measured on one v5e at 512^3 (grid not VMEM-resident), nb=4, R=256:
  w8/w16 compile at full unroll; w24 exceeds the 16 MB Mosaic stack at
  both r8 (17.99 MB) and r4. The auto policy takes full unroll only when
  it is free at the block count chosen at unroll=1.
  """
  gb = 512 * 512 * 2048 * 4
  for w, r, fits_full in ((8, 8, True), (8, 4, True), (16, 8, True),
                          (16, 4, True), (24, 8, False), (24, 4, False)):
    cap = march_kernel.max_blocks_per_call(w, r, 256, gb, unroll=r)
    assert (4 <= cap) == fits_full, (w, r, cap)
  # Eval-sized calls (block count chosen at unroll=1) never take full
  # unroll at w16: the u1 split admits 12 blocks, full unroll only 4.
  assert march_kernel.max_blocks_per_call(16, 8, 256, gb) >= 12
  # The so3 (all-stage) path is charged extra per unrolled step.
  assert march_kernel.max_blocks_per_call(8, 8, 256, gb, unroll=8,
                                          so3=True) < 4


def test_pallas_march_interp_precision_plumbing():
  """march_interp="high" runs the kernel (CPU interpret: same numerics)."""
  spec, data = _setup()
  o, d = _pencil()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  exact = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=16,
      refetch_every=8, interpret=True)
  fast = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=16,
      refetch_every=8, interpret=True, interp_precision="high")
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), exact[:5],
                        fast[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3,
                               err_msg=name)


def _jitter(S, num_path, seed=1):
  rng = np.random.RandomState(seed)
  return jnp.asarray(
      np.arange(0, S, num_path) + rng.randint(0, num_path, S // num_path),
      jnp.int32)


def test_pallas_march_lean_subsample_bit_exact():
  """Lean emit + in-kernel jitter subsample == full emit + XLA gather."""
  spec, data = _setup()
  o1, d1 = _pencil(16)
  o = jnp.concatenate([o1, o1 + jnp.asarray([0.8, -0.5, 0.0])], axis=0)
  d = jnp.concatenate([d1, d1], axis=0)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  jitter = _jitter(S, num_path=4)

  full = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=16,
      refetch_every=8, interpret=True)
  lean = march_kernel.march_tiled_pallas_lean(
      spec, data, o, d, near, h, S, jitter, block_size=16, window=16,
      refetch_every=8, interpret=True)
  pos, dirs, dist, _n, _g, oow = full
  lpos, ldirs, ldist, spos, sdirs, sdist, loow = lean
  np.testing.assert_array_equal(np.array(pos), np.array(lpos))
  np.testing.assert_array_equal(np.array(dirs), np.array(ldirs))
  np.testing.assert_array_equal(np.array(dist), np.array(ldist))
  np.testing.assert_array_equal(np.array(pos[:, jitter]), np.array(spos))
  np.testing.assert_array_equal(np.array(dirs[:, jitter]), np.array(sdirs))
  np.testing.assert_array_equal(np.array(dist[:, jitter]), np.array(sdist))
  assert int(oow) == int(loow) == 0


def test_pallas_march_lean_vmem_split_exact(monkeypatch):
  """Lean-emit batches above the block budget split bit-exactly."""
  spec, data = _setup()
  o1, d1 = _pencil(16)
  o = jnp.concatenate([o1, o1 + jnp.asarray([0.8, -0.5, 0.0]),
                       o1 + jnp.asarray([-0.6, 0.4, 0.0]),
                       o1 + jnp.asarray([0.0, 0.9, 0.0])], axis=0)
  d = jnp.concatenate([d1] * 4, axis=0)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  jitter = _jitter(S, num_path=4)

  kwargs = dict(block_size=16, window=16, refetch_every=8, interpret=True)
  whole = march_kernel.march_tiled_pallas_lean(spec, data, o, d, near, h, S,
                                               jitter, **kwargs)
  monkeypatch.setattr(
      march_kernel, "_VMEM_BUDGET_BYTES",
      int(1.5 * march_kernel._per_block_vmem_bytes(
          16, 8, 16, emit_rows=7, sub_rows=8)))
  split = march_kernel.march_tiled_pallas_lean(spec, data, o, d, near, h, S,
                                               jitter, **kwargs)
  names = ("pos", "dir", "dist", "sub_pos", "sub_dir", "sub_dist")
  for name, a, b in zip(names, whole[:6], split[:6]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=0,
                               err_msg=name)
  assert int(whole[6]) == int(split[6])


def test_mxu_epilogue_bit_exact(monkeypatch):
  """MARCH_EPILOGUE=mxu (identity-contraction relayout) == plain transpose.

  The lanes->sublanes epilogue expressed as an einsum against a constant
  identity selects single addends with 0/1 coefficients, so it must be a
  BIT-exact relayout of the kernel's march-layout outputs (full and lean
  emits both).
  """
  spec, data = _setup()
  o1, d1 = _pencil(16)
  o = jnp.concatenate([o1, o1 + jnp.asarray([0.8, -0.5, 0.0])], axis=0)
  d = jnp.concatenate([d1, d1], axis=0)
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  jitter = _jitter(S, num_path=4)

  def run_both(fn, *a, **kw):
    monkeypatch.setenv("MARCH_EPILOGUE", "xla")
    ref = fn(*a, **kw)
    monkeypatch.setenv("MARCH_EPILOGUE", "mxu")
    got = fn(*a, **kw)
    for i, (x, y) in enumerate(zip(ref, got)):
      np.testing.assert_array_equal(np.array(x), np.array(y),
                                    err_msg=f"output {i}")

  run_both(march_kernel.march_tiled_pallas, spec, data, o, d, near, h, S,
           block_size=16, window=16, refetch_every=8, interpret=True)
  run_both(march_kernel.march_tiled_pallas_lean, spec, data, o, d, near,
           h, S, jitter, block_size=16, window=16, refetch_every=8,
           interpret=True)
