"""Integration tests for the NerfModel forward pass and aux methods."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from samplenerfro_tpu.models import construct_nerf
from tests import helpers


def _build(args=None, **grid_kw):
  args = args or helpers.tiny_args()
  ndim, nmin, nmax, grid = helpers.make_grid(**grid_kw)
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  return model, variables, rays, args


def test_param_tree_layout():
  """Top-level param keys must match the reference for ckpt surgery."""
  _, variables, _, _ = _build()
  assert set(variables["params"].keys()) == {
      "path_sampler", "bkgd_mlp", "coarse_mlp", "fine_mlp"}
  assert set(variables.keys()) == {"params", "grid"}
  assert "so3_mlp" in variables["params"]["path_sampler"]


def test_march_bwd_impl_threads_to_path_sampler():
  """--march_bwd_impl reaches the model and its path sampler config."""
  model, _, _, _ = _build(helpers.tiny_args(march_bwd_impl="pallas"))
  assert model.march_bwd_impl == "pallas"
  # Default ("auto") defers to $EIKVJP_IMPL inside make_march_allstage.
  model_d, _, _, _ = _build()
  assert model_d.march_bwd_impl == "auto"


def test_march_interp_all_stage_override():
  """--march_interp_all promotes ONLY 'all'-stage models (inherit = no-op)."""
  from samplenerfro_tpu.models import nerf as nerf_lib

  base = dict(march_interp="default")
  cases = [
      # (stage, march_interp_all, expected effective interp)
      ("radiance", "inherit", "default"),
      ("radiance", "highest", "default"),   # radiance never promoted
      ("all", "inherit", "default"),
      ("all", "highest", "highest"),
      ("all_quality", "highest", "highest"),  # stage-prefix semantics
      ("ior", "highest", "default"),
  ]
  for stage, allv, want in cases:
    args = helpers.tiny_args(stage=stage, march_interp_all=allv, **base)
    got = nerf_lib.effective_march_interp(args)
    assert got == want, (stage, allv, got)
  # And it reaches the constructed model's path-sampler config.
  model, _, _, _ = _build(helpers.tiny_args(
      stage="all", march_interp="default", march_interp_all="highest"))
  assert model.march_interp == "highest"


def test_forward_shapes_and_finite():
  model, variables, rays, _ = _build()
  ret, loss_sp = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert len(ret) == 2
  for level in ret:
    comp_rgb, dist, acc, trans, trans_rgb_bkgd = level
    assert comp_rgb.shape == (32, 3)
    assert dist.shape == (32,)
    assert acc.shape == (32,)
    assert trans.shape == (32, 1)
    assert trans_rgb_bkgd.shape == (32, 3)
    for x in level:
      assert np.all(np.isfinite(np.array(x)))
  assert loss_sp == 0.0


def test_forward_coarse_only():
  args = helpers.tiny_args(num_fine_samples=0)
  model, variables, rays, _ = _build(args)
  assert "fine_mlp" not in variables["params"]
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert len(ret) == 1


def test_deterministic_render_reproducible():
  model, variables, rays, _ = _build()
  r1, _ = model.apply(variables, random.PRNGKey(1), random.PRNGKey(2), rays,
                      False)
  r2, _ = model.apply(variables, random.PRNGKey(7), random.PRNGKey(9), rays,
                      False)
  # randomized=False still uses rng for the coarse-bin jitter; disable that
  # via use_random_choice? The reference keeps jitter random — so only same
  # keys reproduce exactly.
  r3, _ = model.apply(variables, random.PRNGKey(1), random.PRNGKey(2), rays,
                      False)
  np.testing.assert_allclose(np.array(r1[-1][0]), np.array(r3[-1][0]),
                             atol=1e-6)
  del r2


def test_forward_envmap_range():
  model, variables, _, _ = _build()
  dirs = helpers.make_rays(8).viewdirs
  out = np.array(model.apply(variables, dirs, method=model.forward_envmap))
  assert out.shape == (8, 3)
  assert np.all(out >= -0.001 - 1e-6) and np.all(out <= 1.001 + 1e-6)


def test_sample_points_probe():
  model, variables, _, _ = _build()
  pts = jnp.asarray(np.random.RandomState(0).randn(4, 8, 3), jnp.float32)
  dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 8, 3))
  rgb, alpha = model.apply(variables, pts, dirs, method=model.sample_points)
  assert rgb.shape == (4, 8, 3)
  assert alpha.shape == (4, 8, 1)
  assert np.all(np.array(alpha) >= 0) and np.all(np.array(alpha) <= 1)


def test_compute_sparsity_loss():
  args = helpers.tiny_args(use_fine_sparsity=True)
  model, variables, _, _ = _build(args)
  pts = jnp.asarray(np.random.RandomState(0).randn(8, 1, 3), jnp.float32)
  loss_sp, cat, fat = model.apply(
      variables, pts, 0.0, 0.0, method=model.compute_sparsity_loss)
  assert np.isfinite(float(loss_sp))
  assert 0 <= float(cat) <= 1 and 0 <= float(fat) <= 1


def test_normal_loss_and_smooth():
  model, variables, _, _ = _build()
  rng = np.random.RandomState(0)
  pts = jnp.asarray(rng.randn(8, 1, 3), jnp.float32)
  grads = jnp.asarray(rng.randn(8, 1, 3), jnp.float32)
  nl, sm = model.apply(
      variables, pts, grads, 1.0, random.PRNGKey(5),
      method=model.wrapper_compute_normal_loss_and_smooth)
  assert nl == 0.0
  assert np.isfinite(float(sm))


def test_mask_bbox_kills_outside_density():
  """With use_mask_bbox, samples outside the grid bbox contribute nothing."""
  args = helpers.tiny_args()
  ndim, nmin, nmax, grid = helpers.make_grid(n=9, lo=-0.01, hi=0.01)
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid,
      gin_overrides={"NerfModel.use_mask_bbox": True})
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, False, 0.5)
  # Rays start at near=2 along unit dirs from origins near 0 — everything is
  # outside the tiny bbox, so acc ~ 0 for both levels.
  for level in ret:
    np.testing.assert_allclose(np.array(level[2]), 0.0, atol=1e-5)


def test_use_ipe_featurization_runs():
  args = helpers.tiny_args()
  ndim, nmin, nmax, grid = helpers.make_grid()
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid,
      gin_overrides={"NerfModel.use_ipe": True})
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert np.all(np.isfinite(np.array(ret[-1][0])))


def test_sh_decode_model():
  args = helpers.tiny_args(sh_deg=2, use_viewdirs=False)
  model, variables, rays, _ = _build(args)
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert ret[-1][0].shape == (32, 3)
  assert np.all(np.isfinite(np.array(ret[-1][0])))


def test_sh_direnc_model():
  args = helpers.tiny_args(sh_direnc_deg=4)
  model, variables, rays, _ = _build(args)
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert np.all(np.isfinite(np.array(ret[-1][0])))


def test_bd_cut_dist_real_scene_branch():
  args = helpers.tiny_args(config="glass")
  ndim, nmin, nmax, grid = helpers.make_grid()
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid,
      gin_overrides={"NerfModel.bd_cut_dist": 6.0})
  ret, _ = model.apply(
      variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  assert np.all(np.isfinite(np.array(ret[-1][3])))


def test_all_stage_uses_so3_gradients():
  """In the 'all' stage, gradients flow into the path_sampler so3 params."""
  args = helpers.tiny_args(stage="all_test")
  ndim, nmin, nmax, grid = helpers.make_blob_grid()
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)

  def loss(params):
    ret, _ = model.apply({"params": params, "grid": variables["grid"]},
                         random.PRNGKey(1), random.PRNGKey(2), rays, False, 1.0)
    return jnp.sum(ret[-1][0])

  grads = jax.grad(loss)(variables["params"])
  g_norm = jax.tree_util.tree_reduce(
      lambda a, b: a + float(jnp.sum(jnp.abs(b))),
      grads["path_sampler"], 0.0)
  assert g_norm > 0.0


def test_bfloat16_mlp_path():
  """Opt-in bf16 radiance MLPs: fp32 outputs, close to the fp32 model."""
  from samplenerfro_tpu.models import construct_nerf
  from jax import random
  args = helpers.tiny_args()
  ndim, nmin, nmax, grid = helpers.make_blob_grid()
  rays = helpers.make_rays(batch=16)
  model32, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  args16 = helpers.tiny_args(mlp_dtype="bfloat16")
  model16, _ = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args16, ndim, nmin, nmax, grid)

  k0, k1 = random.PRNGKey(1), random.PRNGKey(2)
  ret32, _ = model32.apply(variables, k0, k1, rays, False, 0.7)
  ret16, _ = model16.apply(variables, k0, k1, rays, False, 0.7)
  rgb32 = np.asarray(ret32[-1][0])
  rgb16 = np.asarray(ret16[-1][0])
  assert rgb16.dtype == np.float32
  assert np.all(np.isfinite(rgb16))
  # bf16 matmuls: ~1e-2 agreement is expected and sufficient.
  assert np.max(np.abs(rgb16 - rgb32)) < 5e-2


def test_mlp_remat_identical_forward_and_grads():
  """nn.remat MLPs: same param tree, same outputs, same gradients."""
  from samplenerfro_tpu.models import construct_nerf
  from jax import random
  args = helpers.tiny_args()
  ndim, nmin, nmax, grid = helpers.make_blob_grid()
  rays = helpers.make_rays(batch=16)
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  args_r = helpers.tiny_args(mlp_remat=True)
  model_r, variables_r = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args_r, ndim, nmin, nmax, grid)
  assert (jax.tree_util.tree_structure(variables["params"])
          == jax.tree_util.tree_structure(variables_r["params"]))

  k0, k1 = random.PRNGKey(1), random.PRNGKey(2)

  def loss(m):
    def fn(params):
      ret, _ = m.apply({"params": params,
                        "grid": variables["grid"]}, k0, k1, rays, False, 0.7)
      return jnp.sum(ret[-1][0] ** 2)
    return fn

  l0, g0 = jax.value_and_grad(loss(model))(variables["params"])
  l1, g1 = jax.value_and_grad(loss(model_r))(variables["params"])
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              atol=1e-6),
      g0["coarse_mlp"], g1["coarse_mlp"])


def test_march_emit_lean_matches_full():
  """march_emit=lean (in-kernel subsample) renders bit-identically to full.

  Production support predicates require 128-lane ray blocks; relax them so
  the tiny CPU-interpret configuration exercises both kernel paths.
  """
  from samplenerfro_tpu.ops.pallas import march_kernel
  from tests import helpers
  import numpy as np

  orig_supports = march_kernel._supports

  def relaxed(spec, num_samples, batch, block_size, window, refetch_every):
    n = spec.ndim[0]
    return (n % 32 == 0 and n >= 64 and batch % block_size == 0
            and num_samples % refetch_every == 0)

  calls = {"lean": 0}
  orig_lean = march_kernel.march_tiled_pallas_lean

  def counting_lean(*a, **kw):
    calls["lean"] += 1
    return orig_lean(*a, **kw)

  # Coherent pencil rays (one 16-ray tile => one kernel block).
  d = np.array([[0.002 * (i % 4), 0.001 * (i // 4), 1.0] for i in range(16)],
               np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  from samplenerfro_tpu.data.rays import Rays
  rays = Rays(origins=jnp.broadcast_to(
                  jnp.asarray([0, 0, -4.0], jnp.float32), d.shape),
              directions=jnp.asarray(d), viewdirs=jnp.asarray(d),
              radii=jnp.full((16, 1), 0.001, jnp.float32))

  march_kernel._supports = relaxed
  march_kernel.march_tiled_pallas_lean = counting_lean
  try:
    outs = {}
    for emit in ("full", "lean"):
      args = helpers.tiny_args(march_mode="pallas", tile_size=4,
                               march_window=16, march_refetch=8,
                               march_emit=emit)
      ndim, nmin, nmax, grid = helpers.make_grid(n=64)
      model, variables = construct_nerf(
          random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
      outs[emit], _ = model.apply(
          variables, random.PRNGKey(1), random.PRNGKey(2), rays, True, 0.5)
  finally:
    march_kernel._supports = orig_supports
    march_kernel.march_tiled_pallas_lean = orig_lean

  assert calls["lean"] >= 1, "lean kernel path never activated"
  for lf, ll in zip(outs["full"], outs["lean"]):
    for a, b in zip(lf, ll):
      np.testing.assert_array_equal(np.array(a), np.array(b))
