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


# ---------------------------------------------------------------------------
# Uniform-window free-space skip (MARCH_SKIP=uniform / skip_uniform=True).
# ---------------------------------------------------------------------------


def _compact_bump_setup(n=64):
  """Grid that is EXACTLY 1.0 (grad exactly 0) outside one 32^3 brick.

  A C1 compactly-supported bump lives strictly inside the (+,+,+) octant
  (brick (1,1,1) at n=64, _SKIP_BRICK=32) with >=2 voxels of margin, so
  every other brick is uniform: value bit-equal to the ambient corner
  value and central-difference gradient identically zero.
  """
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  axes = np.linspace(-1.5, 1.5, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  r2 = (xx - 0.75)**2 + (yy - 0.75)**2 + (zz - 0.75)**2
  bump = np.maximum(0.0, 1.0 - r2 / 0.09)**2
  vals = (1.0 + 0.3 * bump).reshape(-1, 1).astype(np.float32)
  values = jnp.asarray(vals)
  grad = grid_ops.central_difference_grad(spec, values)
  data = jnp.concatenate([values, grad], axis=-1)
  return spec, data


def test_uniformity_flags():
  spec, data = _compact_bump_setup()
  n = 64
  grid3d = data.reshape(n, n, n * 4)
  uni, namb = march_kernel.uniformity_flags(grid3d, n, 32)
  assert float(namb) == 1.0
  uni = np.array(uni)
  assert uni.shape == (2, 2, 2)
  assert not uni[1, 1, 1]          # the bump brick
  assert uni.sum() == 7            # every other octant is uniform
  # An all-ambient grid is uniform everywhere.
  ones = jnp.concatenate([jnp.ones((n**3, 1)), jnp.zeros((n**3, 3))],
                         axis=-1).reshape(n, n, n * 4)
  uni2, namb2 = march_kernel.uniformity_flags(ones, n, 32)
  assert bool(np.array(uni2).all()) and float(namb2) == 1.0


def test_pallas_march_skip_fully_uniform_exact():
  """On an all-ambient grid the skipped march is EXACTLY the Euler line."""
  n = 64
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  namb = np.float32(1.2)
  data = jnp.concatenate(
      [jnp.full((n**3, 1), namb), jnp.zeros((n**3, 3))], axis=-1)
  o, d = _pencil()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  out = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S, block_size=16, window=16,
      refetch_every=8, interpret=True, skip_uniform=True,
      normalize_dirs=False)
  pos, dirs, dist, nv, g, oow = out
  assert int(oow) == 0
  # Bit-exact float32 Euler replay: p += f32(h)/namb * d, d constant.
  p = (np.array(o) + np.float32(near) * np.array(d)).astype(np.float32)
  dnp = np.array(d)
  step = np.float32(np.float32(h) / namb)
  want_pos = []
  for _ in range(S):
    want_pos.append(p.copy())
    p = (p + step * dnp).astype(np.float32)
  want_pos = np.stack(want_pos, axis=1)
  # The backend may fuse the Euler mul+add into an FMA; positions match
  # the separate-rounding numpy replay to one rounding step.
  np.testing.assert_allclose(np.array(pos), want_pos, atol=1e-6)
  # Direction never bends in free space (g == 0 exactly).
  np.testing.assert_array_equal(
      np.array(dirs), np.broadcast_to(dnp[:, None], (16, S, 3)))
  np.testing.assert_array_equal(np.array(nv), np.full((16, S, 1), namb))
  np.testing.assert_array_equal(np.array(g), np.zeros((16, S, 3)))


def _skip_rays():
  """Two 16-ray blocks: one in pure free space, one crossing the bump."""
  o_free, d_free = _pencil(16)
  o_free = o_free + jnp.asarray([-0.75, -0.75, 0.0])   # uniform octant
  o_bump, d_bump = _pencil(16)
  o_bump = o_bump + jnp.asarray([0.75, 0.75, 0.0])     # through the bump
  o = jnp.concatenate([o_free, o_bump], axis=0)
  d = jnp.concatenate([d_free, d_bump], axis=0)
  return o, d


@pytest.mark.parametrize("window", [16, 24])
def test_pallas_march_skip_mixed_blocks(window):
  """Skip on a mixed batch: free-space block skips, bump block marches.

  The skipped block's trajectory may differ from the unskipped one only
  by the interp matmul's ~1-ulp weight-sum reassociation per step; the
  bump block (never skipped: its z window covers the bump brick) must be
  bit-identical.
  """
  spec, data = _compact_bump_setup()
  o, d = _skip_rays()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  kwargs = dict(block_size=16, window=window, refetch_every=8,
                interpret=True)
  base = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         **kwargs)
  skip = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         skip_uniform=True, **kwargs)
  assert int(base[5]) == 0 and int(skip[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), base[:5],
                        skip[:5]):
    a, b = np.array(a), np.array(b)
    np.testing.assert_allclose(a[:16], b[:16], atol=1e-5,
                               err_msg=f"free {name}")
    np.testing.assert_array_equal(a[16:], b[16:], err_msg=f"bump {name}")
  # The free-space block really is exact ambient free space.
  np.testing.assert_array_equal(np.array(skip[3][:16]),
                                np.ones((16, S, 1), np.float32))


def test_pallas_march_skip_so3_path():
  """Skip with the in-kernel so3 head: skipped windows bypass the MLP."""
  spec, data = _compact_bump_setup()
  o, d = _skip_rays()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  max_deg = 10
  so3 = fmlp.mlp_init(random.PRNGKey(3), 2 * 3 * max_deg, net_depth=4,
                      net_width=128, skip_layer=2, num_out_channels=3,
                      output_init_std=1e-2)
  kwargs = dict(block_size=16, window=16, refetch_every=8,
                so3_params=so3, annealed_alpha=0.7, max_deg=max_deg,
                interpret=True)
  base = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         **kwargs)
  skip = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         skip_uniform=True, **kwargs)
  assert int(base[5]) == 0 and int(skip[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), base[:5],
                        skip[:5]):
    a, b = np.array(a), np.array(b)
    np.testing.assert_allclose(a[:16], b[:16], atol=1e-5,
                               err_msg=f"free {name}")
    # The cond wrapper around the so3 MLP moves fusion/FMA boundaries;
    # the never-skipped block matches to one rounding step.
    np.testing.assert_allclose(a[16:], b[16:], atol=1e-6,
                               err_msg=f"bump {name}")


def test_pallas_march_skip_lean():
  """Skip composes with lean emit + in-kernel subsample."""
  spec, data = _compact_bump_setup()
  o, d = _skip_rays()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  jitter = _jitter(S, num_path=4)
  kwargs = dict(block_size=16, window=16, refetch_every=8, interpret=True)
  base = march_kernel.march_tiled_pallas_lean(
      spec, data, o, d, near, h, S, jitter, **kwargs)
  skip = march_kernel.march_tiled_pallas_lean(
      spec, data, o, d, near, h, S, jitter, skip_uniform=True, **kwargs)
  assert int(base[6]) == 0 and int(skip[6]) == 0
  names = ("pos", "dir", "dist", "sub_pos", "sub_dir", "sub_dist")
  for name, a, b in zip(names, base[:6], skip[:6]):
    a, b = np.array(a), np.array(b)
    np.testing.assert_allclose(a[:16], b[:16], atol=1e-5,
                               err_msg=f"free {name}")
    np.testing.assert_array_equal(a[16:], b[16:], err_msg=f"bump {name}")


def test_pallas_march_skip_still_counts_violations():
  """oow accounting is unchanged by the skip (exactness gate semantics).

  A spread-out block violates its window whether or not the window is
  uniform; the skip must not silence the count (positions outside the
  window may lie in non-uniform bricks the flags never checked).
  """
  n = 64
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  data = jnp.concatenate(
      [jnp.ones((n**3, 1)), jnp.zeros((n**3, 3))], axis=-1)
  rng = np.random.RandomState(0)
  d = rng.randn(16, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = (rng.randn(16, 3) * 1.0).astype(np.float32)
  args = (spec, data, jnp.asarray(o), jnp.asarray(d), 2.0, 4.0 / 31, 32)
  kwargs = dict(block_size=16, window=8, refetch_every=8, interpret=True)
  base = march_kernel.march_tiled_pallas(*args, **kwargs)
  skip = march_kernel.march_tiled_pallas(*args, skip_uniform=True, **kwargs)
  assert int(base[5]) > 0
  assert int(skip[5]) == int(base[5])


def test_host_skip_flags_matches_in_jit():
  """Host (numpy) flag precompute == the in-jit derivation, kernel layout."""
  spec, data = _compact_bump_setup()
  n = 64
  flags = march_kernel.host_skip_flags(np.array(data), n)
  assert flags is not None
  uni_h, namb_h = flags
  assert uni_h.shape == (4, 2) and uni_h.dtype == np.float32
  uni_j, namb_j = march_kernel.uniformity_flags(
      data.reshape(n, n, n * 4), n, march_kernel.SKIP_BRICK)
  np.testing.assert_array_equal(
      uni_h, np.array(uni_j, np.float32).reshape(4, 2))
  assert float(namb_h[0, 0]) == float(namb_j)
  # Unsupported shapes decline (not divisible / fewer than 2 bricks).
  assert march_kernel.host_skip_flags(
      np.ones((48**3, 4), np.float32), 48) is None
  assert march_kernel.host_skip_flags(
      np.ones((32**3, 4), np.float32), 32) is None


def test_construct_nerf_installs_skip_flags():
  """march_skip=uniform models carry host-precomputed flags in 'grid'.

  construct_nerf (models/nerf.py) must fill the PathSampler's skip_uni /
  skip_namb variables with march_kernel.host_skip_flags of the installed
  grid — recomputing them inside the jitted step costs a full grid pass
  per call (the round-4 scene_skip bench regression).
  """
  from jax import random as jrandom
  from samplenerfro_tpu.models import construct_nerf
  from tests import helpers

  n = 64
  spec, data = _compact_bump_setup(n)
  rays = helpers.make_rays(8)
  args = helpers.tiny_args(march_mode="pallas", march_skip="uniform",
                           tile_size=4, march_window=16, march_refetch=8,
                           num_coarse_samples=4, num_path_samples=2)
  values = np.array(data[:, :1])  # construct_nerf derives the gradient
  _, variables = construct_nerf(
      jrandom.PRNGKey(0), {"rays": rays}, args, [n] * 3, [-1.5] * 3,
      [1.5] * 3, values)
  gcol = variables["grid"]["path_sampler"]
  assert "skip_uni" in gcol and "skip_namb" in gcol
  installed = np.array(gcol["data"])  # [N^3, 4] values + derived grad
  want_uni, want_namb = march_kernel.host_skip_flags(installed, n)
  np.testing.assert_array_equal(np.array(gcol["skip_uni"]), want_uni)
  np.testing.assert_array_equal(np.array(gcol["skip_namb"]), want_namb)
  assert np.array(gcol["skip_uni"]).sum() == 7.0  # 7 of 8 octants uniform

  # march_skip=off creates no flag variables.
  args_off = helpers.tiny_args(march_mode="pallas", tile_size=4,
                               num_coarse_samples=4, num_path_samples=2)
  _, v_off = construct_nerf(
      jrandom.PRNGKey(0), {"rays": rays}, args_off, [n] * 3, [-1.5] * 3,
      [1.5] * 3, values)
  assert "skip_uni" not in v_off["grid"]["path_sampler"]


def test_pallas_march_skip_precomputed_flags_bitexact():
  """skip_uniform=(uni, namb) precomputed == skip_uniform=True, bit-for-bit."""
  spec, data = _compact_bump_setup()
  o, d = _skip_rays()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  kwargs = dict(block_size=16, window=16, refetch_every=8, interpret=True)
  injit = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                          skip_uniform=True, **kwargs)
  flags = march_kernel.host_skip_flags(np.array(data), 64)
  pre = march_kernel.march_tiled_pallas(
      spec, data, o, d, near, h, S,
      skip_uniform=(jnp.asarray(flags[0]), jnp.asarray(flags[1])), **kwargs)
  for name, a, b in zip(("pos", "dir", "dist", "n", "g", "oow"), injit, pre):
    np.testing.assert_array_equal(np.array(a), np.array(b), err_msg=name)


def test_skip_guard_wide_window():
  """Windows whose y extent can span 3 bricks silently disable the skip.

  window=32 -> yext=40 > _SKIP_BRICK+1: the 8-corner uniformity test
  would miss a middle brick, so the skip must turn itself off (results
  equal the unskipped kernel bit-for-bit, uniform windows included).
  """
  spec, data = _compact_bump_setup()
  o, d = _skip_rays()
  S, near = 32, 2.0
  h = 4.0 / (S - 1)
  kwargs = dict(block_size=16, window=32, refetch_every=8, interpret=True)
  base = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         **kwargs)
  skip = march_kernel.march_tiled_pallas(spec, data, o, d, near, h, S,
                                         skip_uniform=True, **kwargs)
  for i, (a, b) in enumerate(zip(base, skip)):
    np.testing.assert_array_equal(np.array(a), np.array(b),
                                  err_msg=f"output {i}")
