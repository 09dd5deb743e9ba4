"""Tests for chunked full-image rendering (plain and tile-reordered)."""

import functools

import jax
import numpy as np
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import render as render_lib
from tests import fixtures, helpers


def test_tiled_render_matches_plain(tmp_path):
  """Tile reordering is a pure execution-order change for scan marching."""
  data_dir = fixtures.make_scene(str(tmp_path / "scene"), res=16)
  args = helpers.tiny_args(data_dir=data_dir, factor=0, white_bkgd=False,
                           chunk=64, num_coarse_samples=4,
                           num_fine_samples=8, num_path_samples=2)
  ds = datasets.Blender("val", args)
  example = ds.peek()

  ndim, nmin, nmax, grid = helpers.make_grid()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": example["rays"]}, args,
      ndim, nmin, nmax, grid)
  grid_vars = {"grid": variables["grid"]}
  render_fn = step_lib.make_render_fn(model, args, grid_vars)
  fn = functools.partial(render_fn, variables["params"])

  rng = random.PRNGKey(1)
  plain = render_lib.render_image(fn, example["rays"], rng, False, chunk=64)
  tiled = render_lib.render_image(fn, example["rays"], rng, False, chunk=64,
                                  tile=4)
  for a, b in zip(plain, tiled):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5)
  assert plain[0].shape == (16, 16, 3)


def test_render_image_pads_ragged_chunks(tmp_path):
  data_dir = fixtures.make_scene(str(tmp_path / "scene2"), res=10)
  args = helpers.tiny_args(data_dir=data_dir, factor=0, white_bkgd=False,
                           chunk=48, num_coarse_samples=4,
                           num_fine_samples=0, num_path_samples=2)
  ds = datasets.Blender("val", args)
  example = ds.peek()
  ndim, nmin, nmax, grid = helpers.make_grid()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": example["rays"]}, args,
      ndim, nmin, nmax, grid)
  render_fn = step_lib.make_render_fn(model, args,
                                      {"grid": variables["grid"]})
  out = render_lib.render_image(
      functools.partial(render_fn, variables["params"]),
      example["rays"], random.PRNGKey(1), False, chunk=48, tile=4)
  assert out[0].shape == (10, 10, 3)
  assert np.all(np.isfinite(np.array(out[0])))


def test_render_fn_forces_fp32_mlps(tmp_path):
  """make_render_fn renders bf16-configured models with fp32 MLPs."""
  data_dir = fixtures.make_scene(str(tmp_path / "scene"), res=16)
  args = helpers.tiny_args(data_dir=data_dir, factor=0, white_bkgd=False,
                           chunk=64, num_coarse_samples=4,
                           num_fine_samples=8, num_path_samples=2)
  ds = datasets.Blender("val", args)
  example = ds.peek()
  ndim, nmin, nmax, grid = helpers.make_grid()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": example["rays"]}, args,
      ndim, nmin, nmax, grid)
  grid_vars = {"grid": variables["grid"]}
  bf16_model = model.clone(mlp_dtype="bfloat16")

  rays = jax.tree_util.tree_map(
      lambda x: np.asarray(x).reshape(-1, x.shape[-1])[:64], example["rays"])
  key = random.PRNGKey(2)
  out_fp32 = step_lib.make_render_fn(model, args, grid_vars)(
      variables["params"], key, key, rays)
  out_bf16cfg = step_lib.make_render_fn(bf16_model, args, grid_vars)(
      variables["params"], key, key, rays)
  for a, b in zip(out_fp32, out_bf16cfg):
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_multi_chunk_dispatch_bit_exact(tmp_path):
  """K-chunks-per-dispatch rendering == per-chunk rendering, bitwise.

  The lax.map grouping (step_lib.make_render_fn_multi +
  render_image(chunks_per_dispatch=K)) is an execution grouping only:
  same keys, same per-chunk core. 16x16 image at chunk=48 -> 5 full
  chunks + a ragged tail, so one K=2 group boundary AND the single-chunk
  fallback path are both exercised.
  """
  data_dir = fixtures.make_scene(str(tmp_path / "scene"), res=16)
  args = helpers.tiny_args(data_dir=data_dir, factor=0, white_bkgd=False,
                           chunk=48, num_coarse_samples=4,
                           num_fine_samples=8, num_path_samples=2)
  ds = datasets.Blender("val", args)
  example = ds.peek()
  ndim, nmin, nmax, grid = helpers.make_grid()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": example["rays"]}, args,
      ndim, nmin, nmax, grid)
  grid_vars = {"grid": variables["grid"]}
  render_fn = step_lib.make_render_fn(model, args, grid_vars)
  render_multi = step_lib.make_render_fn_multi(model, args, grid_vars)
  fn = functools.partial(render_fn, variables["params"])
  fn_multi = functools.partial(render_multi, variables["params"])

  rng = random.PRNGKey(1)
  plain = render_lib.render_image(fn, example["rays"], rng, False, chunk=48)
  grouped = render_lib.render_image(
      fn, example["rays"], rng, False, chunk=48,
      chunks_per_dispatch=2, render_multi_fn=fn_multi)
  for a, b in zip(plain, grouped):
    np.testing.assert_array_equal(np.array(a), np.array(b))
  assert grouped[0].shape == (16, 16, 3)


def test_exact_repair_replaces_clamped_chunks():
  """Chunks the windowed marcher clamped are re-rendered clamp-free.

  Fake renderers: the 'windowed' one reports oow > 0 on chunks 1 and 3
  and writes sentinel 0.25; the 'exact' one writes sentinel 0.75. After
  repair, exactly those chunks carry the exact sentinel and the returned
  residual oow is 0.
  """
  from samplenerfro_tpu.data.rays import Rays

  h = w = 8
  chunk = 16
  n_chunks = h * w // chunk
  rays = Rays(origins=np.zeros((h, w, 3), np.float32),
              directions=np.ones((h, w, 3), np.float32),
              viewdirs=np.ones((h, w, 3), np.float32),
              radii=np.ones((h, w, 1), np.float32))
  calls = {"windowed": 0, "exact": 0}

  def windowed_fn(k0, k1, chunk_rays):
    i = calls["windowed"]
    calls["windowed"] += 1
    n = chunk_rays.origins.shape[0]
    oow = np.int32(7 if i % n_chunks in (1, 3) else 0)
    return (np.full((n, 3), 0.25, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, oow)

  def exact_fn(k0, k1, chunk_rays):
    calls["exact"] += 1
    n = chunk_rays.origins.shape[0]
    return (np.full((n, 3), 0.75, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, np.int32(0))

  rgb, _, _, oow = render_lib.render_image(
      windowed_fn, rays, random.PRNGKey(0), False, chunk=chunk,
      return_oow=True, render_exact_fn=exact_fn)
  assert oow == 0
  assert calls["exact"] == 2
  flat = rgb.reshape(n_chunks, chunk, 3)
  np.testing.assert_array_equal(flat[1], 0.75)
  np.testing.assert_array_equal(flat[3], 0.75)
  np.testing.assert_array_equal(flat[0], 0.25)
  np.testing.assert_array_equal(flat[2], 0.25)


def test_repair_ladder_escalates_still_clamped_chunks():
  """A repair stage that still clamps hands the chunk to the next stage.

  The windowed renderer clamps chunks 1 and 3. Repair stage 0 (the
  wide-window tiled marcher in production) cleans chunk 1 (sentinel 0.5)
  but still clamps chunk 3 — chunk 3 must keep its pre-repair pixels at
  that point and escalate to stage 1 (scan, sentinel 0.75), which never
  clamps. Residual oow must be 0.
  """
  from samplenerfro_tpu.data.rays import Rays

  h = w = 8
  chunk = 16
  n_chunks = h * w // chunk
  rays = Rays(origins=np.zeros((h, w, 3), np.float32),
              directions=np.ones((h, w, 3), np.float32),
              viewdirs=np.ones((h, w, 3), np.float32),
              radii=np.ones((h, w, 1), np.float32))
  calls = {"windowed": 0, "wide": 0, "scan": 0}

  def windowed_fn(k0, k1, chunk_rays):
    i = calls["windowed"]
    calls["windowed"] += 1
    n = chunk_rays.origins.shape[0]
    oow = np.int32(7 if i % n_chunks in (1, 3) else 0)
    return (np.full((n, 3), 0.25, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, oow)

  def wide_fn(k0, k1, chunk_rays):
    i = calls["wide"]
    calls["wide"] += 1
    n = chunk_rays.origins.shape[0]
    oow = np.int32(0 if i == 0 else 3)  # cleans chunk 1, still clamps 3
    return (np.full((n, 3), 0.5, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, oow)

  def scan_fn(k0, k1, chunk_rays):
    calls["scan"] += 1
    n = chunk_rays.origins.shape[0]
    return (np.full((n, 3), 0.75, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, np.int32(0))

  rgb, _, _, oow = render_lib.render_image(
      windowed_fn, rays, random.PRNGKey(0), False, chunk=chunk,
      return_oow=True, render_exact_fn=[wide_fn, scan_fn])
  assert oow == 0
  assert calls["wide"] == 2 and calls["scan"] == 1
  flat = rgb.reshape(n_chunks, chunk, 3)
  np.testing.assert_array_equal(flat[1], 0.5)   # cleaned by stage 0
  np.testing.assert_array_equal(flat[3], 0.75)  # escalated to stage 1
  np.testing.assert_array_equal(flat[0], 0.25)
  np.testing.assert_array_equal(flat[2], 0.25)


def test_no_repair_without_exact_fn():
  """Without render_exact_fn the clamp count is reported, not repaired."""
  from samplenerfro_tpu.data.rays import Rays

  h = w = 4
  rays = Rays(origins=np.zeros((h, w, 3), np.float32),
              directions=np.ones((h, w, 3), np.float32),
              viewdirs=np.ones((h, w, 3), np.float32),
              radii=np.ones((h, w, 1), np.float32))

  def windowed_fn(k0, k1, chunk_rays):
    n = chunk_rays.origins.shape[0]
    return (np.full((n, 3), 0.25, np.float32), np.zeros((n, 1), np.float32),
            np.ones((n, 1), np.float32), None, None, np.int32(3))

  rgb, _, _, oow = render_lib.render_image(
      windowed_fn, rays, random.PRNGKey(0), False, chunk=8, return_oow=True)
  assert oow == 6  # 2 chunks x 3 clamps, untouched
  np.testing.assert_array_equal(rgb.reshape(-1, 3), 0.25)
