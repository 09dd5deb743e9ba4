"""Analytic all-stage march VJP vs jax autodiff of the tiled marcher."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp

SO3_KEY = (0, 6, True, True, True, False)  # shipped VoxMLP branch


def _setup(n=64, nrays=32, block=16, S=32, refetch=4, window=16):
  spec = grid_ops.GridSpec([n] * 3, [-1.5] * 3, [1.5] * 3)
  axes = np.linspace(-1.5, 1.5, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = (1.0 + 0.3 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)).reshape(-1, 1)
  values = jnp.asarray(vals, jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  data3d = jnp.concatenate([values, grad], axis=-1).reshape(n, n, n * 4)

  d = np.array([[0.002 * (i % 4), 0.001 * (i // 4), 1.0]
                for i in range(nrays)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  # Two blocks at different window origins.
  o[block:] += np.array([0.7, -0.4, 0.0], np.float32)

  in_dim = 2 * 3 * (SO3_KEY[1] - SO3_KEY[0])
  so3 = fmlp.mlp_init(random.PRNGKey(7), in_dim, net_depth=4, net_width=32,
                      skip_layer=2, num_out_channels=3,
                      output_init_std=1e-2)
  near, h = 2.0, 4.0 / (S - 1)
  cfg = dict(near=near, step_size=h, num_samples=S, block_size=block,
             window=window, refetch_every=refetch)
  return spec, data3d, jnp.asarray(o), jnp.asarray(d), so3, cfg


def _autodiff_march(spec, cfg, data3d, o, d, alpha, so3):
  so3_apply = eikonal_vjp.make_so3_apply(*SO3_KEY)
  pred = lambda rp, g: so3_apply(so3, alpha, rp, g)
  pos, dirs, dist, nv, g, oow = eikt.march_tiled(
      spec, data3d, o, d, cfg["near"], cfg["step_size"],
      cfg["num_samples"], block_size=cfg["block_size"],
      window=cfg["window"], refetch_every=cfg["refetch_every"],
      pred_grad_fn=pred, use_pred_grad=True)
  return pos, dirs, dist, nv, g, oow


def _loss_of(outs, weights):
  pos, dirs, dist, nv, g, _ = outs
  wp, wd, wt, wn, wg = weights
  return (jnp.sum(jnp.sin(pos) * wp) + jnp.sum(dirs * wd)
          + jnp.sum(dist * wt) + jnp.sum(nv * wn) + jnp.sum(g * wg))


import pytest


@pytest.mark.parametrize("bwd_impl", ["stepvjp", "passes"])
def test_allstage_march_vjp_matches_autodiff(bwd_impl):
  spec, data3d, o, d, so3, cfg = _setup()
  march = eikonal_vjp.make_march_allstage(
      spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
      cfg["block_size"], cfg["window"], cfg["refetch_every"],
      SO3_KEY, "tiled", bwd_impl=bwd_impl)
  alpha = jnp.float32(0.6)
  rng = np.random.RandomState(0)
  S = cfg["num_samples"]
  nrays = o.shape[0]
  weights = (jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
             jnp.asarray(rng.randn(nrays, S), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 1), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 3), jnp.float32))

  # Forward agreement first.
  out_ref = _autodiff_march(spec, cfg, data3d, o, d, alpha, so3)
  out_new = march(data3d, o, d, alpha, so3)
  assert int(out_ref[5]) == 0, "window violations in the test setup"
  for name, a, b in zip(("pos", "dirs", "dist", "n", "g"),
                        out_ref[:5], out_new[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6,
                               err_msg=name)

  def loss_ref(o_, d_, al_, th_):
    return _loss_of(_autodiff_march(spec, cfg, data3d, o_, d_, al_, th_),
                    weights)

  def loss_new(o_, d_, al_, th_):
    return _loss_of(march(data3d, o_, d_, al_, th_), weights)

  val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
      o, d, alpha, so3)
  val_new, grads_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2, 3))(
      o, d, alpha, so3)
  np.testing.assert_allclose(float(val_ref), float(val_new), rtol=1e-6)

  names = ("origins", "directions", "alpha", "so3")
  for name, gr, gn in zip(names, grads_ref, grads_new):
    ref_leaves = jax.tree_util.tree_leaves_with_path(gr)
    new_leaves = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, leaf in ref_leaves:
      got = new_leaves[path]
      scale = np.maximum(np.abs(np.asarray(leaf)).max(), 1e-3)
      np.testing.assert_allclose(
          np.asarray(got), np.asarray(leaf), atol=2e-4 * scale, rtol=2e-3,
          err_msg=f"{name}{jax.tree_util.keystr(path)}")


def test_allstage_march_vjp_zero_cotangent_paths():
  """dist-only and n-only losses exercise the seg / interp-only adjoints."""
  spec, data3d, o, d, so3, cfg = _setup(nrays=16, block=16)
  march = eikonal_vjp.make_march_allstage(
      spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
      cfg["block_size"], cfg["window"], cfg["refetch_every"],
      SO3_KEY, "tiled")
  alpha = jnp.float32(0.4)

  for sel in (2, 3):  # dist, nvals
    def loss_ref(th):
      outs = _autodiff_march(spec, cfg, data3d, o, d, alpha, th)
      return jnp.sum(outs[sel] ** 2)

    def loss_new(th):
      return jnp.sum(march(data3d, o, d, alpha, th)[sel] ** 2)

    g_ref = jax.grad(loss_ref)(so3)
    g_new = jax.grad(loss_new)(so3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-3),
        g_ref, g_new)


def test_allstage_march_vjp_skip_flags_plumbing():
  """Precomputed skip flags thread through the custom_vjp under grad.

  The flags are explicit custom_vjp arguments with zero cotangents
  (models/path_sampler.py passes them from the 'grid' collection), so a
  grad through a march called WITH flags must equal one called without.
  """
  spec, data3d, o, d, so3, cfg = _setup(nrays=16, block=16)
  march = eikonal_vjp.make_march_allstage(
      spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
      cfg["block_size"], cfg["window"], cfg["refetch_every"],
      SO3_KEY, "pallas", fwd_skip=True)
  alpha = jnp.float32(0.4)
  n = spec.ndim[0]
  from samplenerfro_tpu.ops.pallas import march_kernel
  flags = march_kernel.host_skip_flags(np.array(data3d).reshape(-1, 4), n)
  if flags is None:  # grid too small for the brick size: dummy layout
    flags = (np.zeros((4, 2), np.float32), np.ones((1, 1), np.float32))
  flags = (jnp.asarray(flags[0]), jnp.asarray(flags[1]))

  def loss_plain(th):
    return jnp.sum(march(data3d, o, d, alpha, th)[0] ** 2)

  def loss_flags(th):
    return jnp.sum(march(data3d, o, d, alpha, th, skip_flags=flags)[0] ** 2)

  v0, g0 = jax.value_and_grad(loss_plain)(so3)
  v1, g1 = jax.value_and_grad(loss_flags)(so3)
  np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                              atol=1e-6),
      g0, g1)


def test_allstage_march_vjp_bf16_mode():
  """bfloat16 reverse-sweep passes: same structure, looser tolerance.

  The production TPU configs run the batched Jacobian/parameter passes in
  bf16 (ops/eikonal_vjp.py bwd_dtype); this checks the mode traces/runs
  and stays within bf16-grade agreement of the exact fp32 sweep.
  """
  spec, data3d, o, d, so3, cfg = _setup(nrays=16, block=16)
  alpha = jnp.float32(0.5)
  # bwd_dtype only affects the batched "passes" implementation; pin it
  # so the fp32-vs-bf16 comparison stays meaningful under any default.
  marches = {
      dt: eikonal_vjp.make_march_allstage(
          spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
          cfg["block_size"], cfg["window"], cfg["refetch_every"],
          SO3_KEY, "tiled", bwd_dtype=dt, bwd_impl="passes")
      for dt in ("float32", "bfloat16")
  }

  def loss_fn(march):
    def loss(o_, th_):
      pos, dirs, dist, nv, g, _ = march(data3d, o_, d, alpha, th_)
      return (jnp.sum(jnp.sin(pos)) + jnp.sum(dirs) + jnp.sum(dist)
              + jnp.sum(nv) + jnp.sum(g))
    return loss

  g32 = jax.grad(loss_fn(marches["float32"]), argnums=(0, 1))(o, so3)
  g16 = jax.grad(loss_fn(marches["bfloat16"]), argnums=(0, 1))(o, so3)
  # The trained quantity in the "all" stage is the so3 PARAMETER gradient
  # (rays are data); require percent-level L2 agreement and near-perfect
  # direction of the full parameter-gradient vector (tiny individual
  # leaves — 3-element biases — are relL2-noisy on their own). Ray-input
  # cotangents amplify bf16 round-off through the sequential recurrence,
  # so they only get a direction check.
  def flat(tree):
    return np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree_util.tree_leaves(tree)])

  a, b = flat(g32[1]), flat(g16[1])
  rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
  assert rel <= 2e-2, f"so3 grad: relative L2 {rel:.3e}"
  a, b = flat(g32[0]), flat(g16[0])
  cos = (a @ b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
  assert cos >= 0.999, f"origins grad direction: cos {cos:.6f}"


@pytest.mark.parametrize("nblocks", [1, 2])
def test_allstage_march_vjp_pallas_kernel(nblocks):
  """Fused Pallas reverse sweep (interpret mode) vs jax autodiff.

  The kernel needs full 128-lane blocks (march_bwd_kernel.supports);
  bwd_impl="pallas" silently falls back to stepvjp otherwise, so this
  test uses a kernel-shaped configuration. nblocks=2 exercises the
  lane-concatenated so3 passes and per-block windows.
  """
  spec, data3d, _, _, so3, cfg = _setup(
      n=64, nrays=32, block=16, S=16, refetch=4, window=16)
  cfg["block_size"] = 128
  # _setup scales h to cover [near, far] in S steps; at S=16 that drifts
  # ~22 z-cells per reuse period, past the reference cube window's w-2
  # coverage. Pin the S=32 step size instead (the march just ends sooner).
  cfg["step_size"] = 4.0 / 31
  # One coherent 128-ray pencil (kernel-shaped block).
  d = np.array([[0.0008 * (i % 16), 0.0005 * (i // 16), 1.0]
                for i in range(128)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  if nblocks == 2:
    o2 = o + np.array([0.6, -0.35, 0.0], np.float32)
    o = np.concatenate([o, o2], axis=0)
    d = np.concatenate([d, d], axis=0)
  o, d = jnp.asarray(o), jnp.asarray(d)
  nrays = o.shape[0]

  alpha = jnp.float32(0.6)
  rng = np.random.RandomState(1)
  S = cfg["num_samples"]
  weights = (jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
             jnp.asarray(rng.randn(nrays, S), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 1), jnp.float32),
             jnp.asarray(rng.randn(nrays, S, 3), jnp.float32))

  march = eikonal_vjp.make_march_allstage(
      spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
      cfg["block_size"], cfg["window"], cfg["refetch_every"],
      SO3_KEY, "tiled", bwd_impl="pallas")
  from samplenerfro_tpu.ops.pallas import march_bwd_kernel
  assert march_bwd_kernel.supports(
      spec, cfg["num_samples"], nrays, cfg["block_size"], cfg["window"],
      cfg["refetch_every"])

  def loss_ref(o_, d_, al_, th_):
    return _loss_of(_autodiff_march(spec, cfg, data3d, o_, d_, al_, th_),
                    weights)

  def loss_new(o_, d_, al_, th_):
    return _loss_of(march(data3d, o_, d_, al_, th_), weights)

  out_ref = _autodiff_march(spec, cfg, data3d, o, d, alpha, so3)
  assert int(out_ref[5]) == 0, "window violations in the test setup"

  val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
      o, d, alpha, so3)
  val_new, grads_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2, 3))(
      o, d, alpha, so3)
  np.testing.assert_allclose(float(val_ref), float(val_new), rtol=1e-6)

  names = ("origins", "directions", "alpha", "so3")
  for name, gr, gn in zip(names, grads_ref, grads_new):
    ref_leaves = jax.tree_util.tree_leaves_with_path(gr)
    new_leaves = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, leaf in ref_leaves:
      got = new_leaves[path]
      scale = np.maximum(np.abs(np.asarray(leaf)).max(), 1e-3)
      np.testing.assert_allclose(
          np.asarray(got), np.asarray(leaf), atol=2e-4 * scale, rtol=2e-3,
          err_msg=f"{name}{jax.tree_util.keystr(path)}")


def test_allstage_march_vjp_pallas_frozen_dict():
  """The pallas bwd must return the PRIMAL's so3 container (FrozenDict).

  The model passes flax FrozenDict params; the fused reverse sweep's
  wrapper builds a plain dict, and jax's custom_vjp rejects the container
  mismatch (round-4 regression caught only on-device: the CPU tests all
  passed plain dicts).
  """
  import flax
  spec, data3d, _, _, so3, cfg = _setup(
      n=64, nrays=32, block=16, S=16, refetch=4, window=16)
  cfg["block_size"] = 128
  cfg["step_size"] = 4.0 / 31
  d = np.array([[0.0008 * (i % 16), 0.0005 * (i // 16), 1.0]
                for i in range(128)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  o, d = jnp.asarray(o), jnp.asarray(d)

  march = eikonal_vjp.make_march_allstage(
      spec, cfg["near"], cfg["step_size"], cfg["num_samples"],
      cfg["block_size"], cfg["window"], cfg["refetch_every"],
      SO3_KEY, "tiled", bwd_impl="pallas")
  frozen = flax.core.freeze(so3)

  def loss(th_):
    return jnp.sum(march(data3d, o, d, jnp.float32(0.6), th_)[0])

  g = jax.grad(loss)(frozen)
  assert isinstance(g, flax.core.FrozenDict)
  assert all(np.isfinite(np.asarray(leaf)).all()
             for leaf in jax.tree_util.tree_leaves(g))


def test_bwd_pallas_traj_raw_matches_pack():
  """Feeding the forward kernel's raw trajectory == re-packing per-ray arrays.

  On TPU the all-stage vjp stores the fused forward's [nb, S, 11, R]
  output as a residual and hands it straight to the reverse kernel
  (skipping one full relayout pass); this asserts the two input paths are
  bit-identical in interpret mode (raw row 6 carries real arclength where
  pack writes zeros — the kernel must not read it). Two ray blocks with
  different window origins cover the multi-block (nb > 1) layout.
  """
  from samplenerfro_tpu.ops.pallas import march_bwd_kernel
  from samplenerfro_tpu.ops.pallas import march_kernel

  spec, data3d, _, _, so3, cfg = _setup(
      n=64, nrays=32, block=16, S=16, refetch=4, window=16)
  cfg["block_size"] = 128
  cfg["step_size"] = 4.0 / 31
  d = np.array([[0.0008 * (i % 16), 0.0005 * (i // 16), 1.0]
                for i in range(256)], np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  o[128:] += np.array([0.6, -0.3, 0.0], np.float32)  # second block offset
  o, d = jnp.asarray(o), jnp.asarray(d)
  alpha = jnp.float32(0.6)

  pos, dirs_raw, dist, nv, g, oow, raw = march_kernel.march_tiled_pallas(
      spec, data3d, o, d, cfg["near"], cfg["step_size"],
      cfg["num_samples"], block_size=cfg["block_size"],
      window=cfg["window"], refetch_every=cfg["refetch_every"],
      so3_params=so3, annealed_alpha=alpha, max_deg=SO3_KEY[1],
      normalize_dirs=False, with_raw=True)
  assert int(oow) == 0
  assert raw.shape == (2, cfg["num_samples"], 11, cfg["block_size"])

  rng = np.random.RandomState(3)
  S, nrays = cfg["num_samples"], 256
  cts = dict(
      dpos=jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
      ddirs_raw=jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
      dn=jnp.asarray(rng.randn(nrays, S, 1), jnp.float32),
      dg=jnp.asarray(rng.randn(nrays, S, 3), jnp.float32),
      segbar=jnp.asarray(rng.randn(nrays, S), jnp.float32))

  def run(traj_raw):
    return march_bwd_kernel.march_bwd_pallas(
        spec, data3d, pos, dirs_raw, nv, g, cts["dpos"], cts["ddirs_raw"],
        cts["dn"], cts["dg"], cts["segbar"], so3, alpha, cfg["near"],
        cfg["step_size"], cfg["block_size"], cfg["window"],
        cfg["refetch_every"], SO3_KEY[1], traj_raw=traj_raw)

  out_pack = run(None)
  out_raw = run(raw)
  for a, b in zip(jax.tree_util.tree_leaves(out_pack),
                  jax.tree_util.tree_leaves(out_raw)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  # The MXU identity-contraction pack (MARCH_BWD_PACK default) must be
  # BIT-identical to the plain-transpose pack: 0/1 coefficients select
  # single addends, so the einsum is an exact relayout, not an
  # approximation.
  import os
  old = os.environ.get("MARCH_BWD_PACK")
  try:
    os.environ["MARCH_BWD_PACK"] = "xla"
    out_xla = run(None)
    os.environ["MARCH_BWD_PACK"] = "mxu"
    out_mxu = run(None)
  finally:
    if old is None:
      os.environ.pop("MARCH_BWD_PACK", None)
    else:
      os.environ["MARCH_BWD_PACK"] = old
  for a, b in zip(jax.tree_util.tree_leaves(out_xla),
                  jax.tree_util.tree_leaves(out_mxu)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
