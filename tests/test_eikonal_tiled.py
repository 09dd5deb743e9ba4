"""Tests for the tile-coherent eikonal marcher and tile utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import grid as grid_ops


def _blob_grid(n=33, lo=-2.0, hi=2.0, peak=0.3):
  spec = grid_ops.GridSpec([n] * 3, [lo] * 3, [hi] * 3)
  axes = np.linspace(lo, hi, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = (1.0 + peak * np.exp(-(xx**2 + yy**2 + zz**2) / 1.0)).reshape(-1, 1)
  values = jnp.asarray(vals, jnp.float32)
  grad = grid_ops.central_difference_grad(spec, values)
  return spec, jnp.concatenate([values, grad], axis=-1)


def _tile_bundle(n_tiles=2, tile=4, seed=0):
  """Coherent ray bundles: small-angle pencils from a shared origin."""
  rng = np.random.RandomState(seed)
  o = np.array([0.0, 0.0, -1.8], np.float32)
  dirs = []
  for _ in range(n_tiles):
    cx, cy = rng.uniform(-0.25, 0.25, 2)
    for py in range(tile):
      for px in range(tile):
        d = np.array([cx + px * 0.004, cy + py * 0.004, 1.0])
        dirs.append(d / np.linalg.norm(d))
  d = np.asarray(dirs, np.float32)
  return (jnp.asarray(np.broadcast_to(o, d.shape).copy()), jnp.asarray(d))


def test_tiled_matches_scan_march():
  spec, data = _blob_grid()
  o, d = _tile_bundle()
  S, near = 64, 0.5
  h = 3.0 / (S - 1)
  ref = eik_ops.march(spec, data, o, d, near, h, S, unroll=2)
  til = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=10, refetch_every=8)
  assert int(til[5]) == 0, "window violations on a coherent bundle"
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref, til[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5,
                               err_msg=name)


def test_tiled_counts_window_violations():
  """Two wildly divergent rays in a block overflow a small window."""
  spec, data = _blob_grid()
  o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.8]), (8, 3))
  d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (8, 1))
  d[0] = [0.7, 0.0, 0.714]
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  out = eikt.march_tiled(spec, data, o, jnp.asarray(d), 0.5, 3.0 / 63, 64,
                         block_size=8, window=6, refetch_every=8)
  assert int(out[5]) > 0


def test_tile_order_roundtrip():
  for (h, w, t) in ((32, 32, 16), (24, 40, 16), (17, 19, 8)):
    perm, inv = eikt.tile_order(h, w, t)
    x = np.arange(h * w)
    assert np.array_equal(x[perm][inv], x)
    assert sorted(perm.tolist()) == x.tolist()


def test_tile_order_blocks_are_tiles():
  perm, _ = eikt.tile_order(32, 32, 16)
  first = perm[:256]
  ys, xs = first // 32, first % 32
  assert ys.max() - ys.min() == 15 and xs.max() - xs.min() == 15


def test_path_sampler_tiled_mode():
  """PathSampler in tiled mode reproduces scan-mode outputs."""
  from jax import random
  from samplenerfro_tpu.models import construct_nerf
  from samplenerfro_tpu.data.rays import Rays
  from tests import helpers

  o, d = _tile_bundle(n_tiles=2, tile=4)
  rays = Rays(origins=o, directions=d, viewdirs=d,
              radii=jnp.full((o.shape[0], 1), 1e-3))
  args = helpers.tiny_args(near=0.5, far=3.5, num_coarse_samples=8,
                           num_path_samples=4, march_mode="scan")
  ndim, nmin, nmax = [33] * 3, [-2.0] * 3, [2.0] * 3
  grid = np.asarray(_blob_grid()[1][:, :1])
  model_scan, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  args_t = helpers.tiny_args(near=0.5, far=3.5, num_coarse_samples=8,
                             num_path_samples=4, march_mode="tiled",
                             tile_size=4, march_window=10, march_refetch=8)
  model_tiled, _ = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args_t, ndim, nmin, nmax, grid)

  ps = lambda m: m.apply(variables, o, d, 0.5,
                         method=lambda mm, oo, dd, a: mm.path_sampler(oo, dd, a))
  out_s = ps(model_scan)
  out_t = ps(model_tiled)
  for a, b in zip(out_s, out_t):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5)


def test_tile_batching_dataset(tmp_path):
  from tests import fixtures, helpers
  from samplenerfro_tpu.data import datasets

  data_dir = fixtures.make_scene(str(tmp_path / "scene"), res=24)
  args = helpers.tiny_args(batching="tile", tile_size=4, batch_size=32,
                           data_dir=data_dir, factor=0, white_bkgd=False,
                           bg_patch_size=4)
  ds = datasets.Blender("train", args)
  batch = next(ds)
  assert batch["pixels"].shape == (32, 3)
  # First 16 rays form one spatial tile: origins identical, dirs coherent.
  dirs = batch["rays"].viewdirs[:16]
  spread = np.max(np.ptp(dirs, axis=0))
  assert spread < 0.2, spread


def test_tiled_march_all_stage_pred_grad():
  """Tiled march with the refinement hook matches the scan marcher."""
  import jax.numpy as jnp2
  spec, data = _blob_grid()
  o, d = _tile_bundle()
  S, near = 64, 0.5
  h = 3.0 / (S - 1)

  def pred_fn(rp, g):
    # Deterministic stand-in for the so3 head: rotate grad slightly.
    return g + 0.05 * jnp2.cross(jnp2.broadcast_to(
        jnp2.asarray([0.0, 0.0, 1.0]), g.shape), g)

  ref = eik_ops.march(spec, data, o, d, near, h, S, unroll=2,
                      pred_grad_fn=pred_fn, use_pred_grad=True)
  til = eikt.march_tiled(spec, data, o, d, near, h, S, block_size=16,
                         window=10, refetch_every=8,
                         pred_grad_fn=pred_fn, use_pred_grad=True)
  assert int(til[5]) == 0
  for name, a, b in zip(("pos", "dir", "dist", "n", "g"), ref, til[:5]):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=5e-5,
                               err_msg=name)


def test_window_calibration():
  """Calibration finds a violation-free window on a coherent bundle."""
  from jax import random
  from samplenerfro_tpu.data.rays import Rays
  from samplenerfro_tpu.models import construct_nerf
  from samplenerfro_tpu.train import calibrate
  from tests import helpers

  o, d = _tile_bundle(n_tiles=2, tile=4)
  rays = Rays(origins=o, directions=d, viewdirs=d,
              radii=jnp.full((o.shape[0], 1), 1e-3))
  args = helpers.tiny_args(near=0.5, far=3.5, num_coarse_samples=8,
                           num_path_samples=4, march_mode="tiled",
                           tile_size=4, march_window=16, march_refetch=8)
  ndim, nmin, nmax = [33] * 3, [-2.0] * 3, [2.0] * 3
  grid = np.asarray(_blob_grid()[1][:, :1])
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  cands = ((6, 4), (6, 2), (8, 4), (10, 4), (12, 4))
  chosen, results = calibrate.calibrate_march_window(
      model, variables, [{"rays": rays}], candidates=cands)
  assert results[chosen] == 0 or chosen == cands[-1]
  # Every candidate probed before the chosen one must have violations.
  for cand in cands[:cands.index(chosen)]:
    assert results[cand] > 0


def test_calibration_ladder_reaches_runtime_fallback_ceiling():
  """The probe ladders cover the runtime fallback's terminal rungs.

  The terminal calibration candidate is the short-refetch (32, 2) — the
  widest window that compiles at flagship grid scale, at the shortest
  useful reuse period; the runtime fallback must be able to land there
  too (wider rungs are fenced when their Mosaic compile fails).
  """
  from samplenerfro_tpu.train import calibrate
  assert calibrate.CANDIDATES[-1] == (32, 2)
  assert calibrate.CANDIDATES_PALLAS[-1] == (32, 2)
  assert max(w for w, _ in calibrate.CANDIDATES) == 48
  # Every pallas candidate must satisfy the kernel's alignment rule
  # (window + 8 divisible by 8 <=> window % 8 == 0).
  assert all(w % 8 == 0 for w, _ in calibrate.CANDIDATES_PALLAS)


def test_fallback_rungs_policy():
  """--march_oow_action=fallback: refetch-halving -> widening -> r2 tier.

  Every rung strictly increases drift coverage (window/refetch) over the
  starting pair, the walk ends with the descending-width refetch-2 tier
  (so a fenced 512^3-infeasible wide window still leaves the feasible
  (32, 2) terminal rung), and no rung repeats.
  """
  from samplenerfro_tpu.train import calibrate

  rungs = calibrate.fallback_rungs(24, 8)
  assert rungs[0] == (24, 4)           # halve refetch before widening
  assert rungs[-1] == (32, 2)          # terminal feasible rung
  assert (48, 2) in rungs and (40, 2) in rungs
  assert len(set(rungs)) == len(rungs)
  assert all(w / r > 24 / 8 for w, r in rungs)

  # Widening never overshoots the 48-voxel cap.
  assert all(w <= 48 for w, _ in calibrate.fallback_rungs(8, 8))
  # From the terminal calibration rung only wider r2 rungs remain (all
  # 512^3-infeasible -> the caller falls back to scan after fencing).
  assert calibrate.fallback_rungs(32, 2) == [(48, 2), (40, 2)]
  # From the widest r4 rung the r2 tier is the whole runway.
  assert calibrate.fallback_rungs(48, 4) == [(48, 2), (40, 2), (32, 2)]


def test_calibration_filters_by_reverse_kernel_support(monkeypatch):
  """'all'-stage + pallas reverse sweep: the ladder keeps only pairs the
  REVERSE kernel supports, so the chosen pair never silently forfeits the
  fused backward (which would fall back to stepvjp outside its envelope).
  """
  from jax import random

  from samplenerfro_tpu.data.rays import Rays
  from samplenerfro_tpu.models import construct_nerf
  from samplenerfro_tpu.ops.pallas import march_bwd_kernel
  from samplenerfro_tpu.train import calibrate
  from tests import helpers

  o, d = _tile_bundle(n_tiles=2, tile=4)
  rays = Rays(origins=o, directions=d, viewdirs=d,
              radii=jnp.full((o.shape[0], 1), 1e-3))
  args = helpers.tiny_args(near=0.5, far=3.5, num_coarse_samples=8,
                           num_path_samples=4, march_mode="pallas",
                           tile_size=4, march_window=16, march_refetch=8,
                           stage="all_calib")
  ndim, nmin, nmax = [33] * 3, [-2.0] * 3, [2.0] * 3
  grid = np.asarray(_blob_grid()[1][:, :1])
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)

  monkeypatch.setenv("EIKVJP_IMPL", "pallas")
  probed = []

  def fake_supports(spec, num_samples, batch, block, w, r):
    probed.append((w, r))
    return w >= 16

  monkeypatch.setattr(march_bwd_kernel, "supports", fake_supports)
  cands = ((8, 8), (16, 8), (24, 8))
  chosen, results = calibrate.calibrate_march_window(
      model, variables, [{"rays": rays}], candidates=cands)
  assert probed, "filter never consulted the reverse kernel envelope"
  assert (8, 8) not in results, "unsupported pair was still probed"
  assert chosen[0] >= 16


def test_calibration_skips_windows_wider_than_a_compile_failure():
  """One failed kernel compile fences off every wider candidate.

  A failed Mosaic compile costs ~2.5 min through the remote relay and
  compile pressure grows monotonically with the window, so after (40, 8)
  fails the ladder must not attempt (40, 4) or (48, *) — measured on the
  512^3 eval calibration: 4 doomed attempts = ~10 wasted minutes per
  driver startup.
  """
  import jax

  from samplenerfro_tpu.data.rays import Rays
  from samplenerfro_tpu.train import calibrate

  attempts = []

  class FakeModel:
    march_mode = "pallas"
    stage = "radiance"
    march_bwd_impl = "auto"

    def __init__(self, window=0, refetch=0):
      self.march_window, self.march_refetch = window, refetch

    def clone(self, march_window, march_refetch):
      return FakeModel(march_window, march_refetch)

    def apply(self, variables, origins, viewdirs, alpha, method=None,
              mutable=None):
      attempts.append((self.march_window, self.march_refetch))
      if self.march_window >= 40:
        raise jax.errors.JaxRuntimeError("mosaic scoped-vmem OOM")
      # Always dirty: forces the ladder to walk every candidate.
      return None, {"diagnostics": {"path_sampler": {
          "march_oow": jnp.int32(1)}}}

  rays = Rays(origins=np.zeros((16, 3), np.float32),
              directions=np.ones((16, 3), np.float32),
              viewdirs=np.ones((16, 3), np.float32),
              radii=np.ones((16, 1), np.float32))
  cands = ((32, 8), (40, 8), (40, 4), (48, 8), (48, 4))
  chosen, results = calibrate.calibrate_march_window(
      FakeModel(), {}, [{"rays": rays}], candidates=cands)
  probed_windows = {w for w, _ in attempts}
  assert probed_windows == {32, 40}, attempts
  assert attempts.count((40, 8)) == 1 and (40, 4) not in attempts
  assert results[(40, 4)] is None and results[(48, 8)] is None
  assert chosen == (32, 8)  # last (only) compilable candidate


def test_probe_batches_cover_whole_view():
  """Window calibration probes EVERY pixel of the probe view.

  A subset probe under-picks the window: the round-4 strided 16-block
  probe of an 800 x 800 eval view still left 1.5M clamped interpolations
  on the unprobed central rays (the bent ones a refractive object
  produces). Coverage here is asserted by tagging each ray with its flat
  pixel index and checking the probed union is the full view.
  """
  from samplenerfro_tpu.data.rays import Rays
  from samplenerfro_tpu.train import calibrate

  for h, w, tile, batch in ((16, 24, 4, 64), (10, 10, 4, 32), (8, 8, 8, 256)):
    idx = np.arange(h * w, dtype=np.float32).reshape(h, w, 1)
    rays = Rays(origins=np.tile(idx, (1, 1, 3)),
                directions=np.ones((h, w, 3), np.float32),
                viewdirs=np.ones((h, w, 3), np.float32),
                radii=np.ones((h, w, 1), np.float32))
    batches = calibrate.probe_batches_from_view(rays, tile, batch)
    seen = np.unique(np.concatenate(
        [b["rays"].origins[:, 0] for b in batches]))
    assert seen.size == h * w, (h, w, tile, batch, seen.size)
    # All chunks share one shape => one compiled probe per candidate.
    sizes = {b["rays"].origins.shape[0] for b in batches}
    assert len(sizes) == 1 and next(iter(sizes)) % tile**2 == 0


class _LadderModel:
  """Fake marcher whose oow is clean iff window/refetch covers `need`."""

  march_mode = "pallas"
  stage = "radiance"
  march_bwd_impl = "auto"

  def __init__(self, need=3.0, window=0, refetch=1, log=None):
    self.need, self.march_window, self.march_refetch = need, window, refetch
    self.log = log if log is not None else []

  def clone(self, march_window, march_refetch=None):
    return _LadderModel(
        self.need, march_window,
        self.march_refetch if march_refetch is None else march_refetch,
        self.log)

  def apply(self, variables, origins, viewdirs, alpha, method=None,
            mutable=None):
    self.log.append((self.march_window, self.march_refetch))
    dirty = self.march_window / self.march_refetch < self.need
    return None, {"diagnostics": {"path_sampler": {
        "march_oow": jnp.int32(1 if dirty else 0)}}}


def _probe_rays(n=16):
  from samplenerfro_tpu.data.rays import Rays
  return Rays(origins=np.zeros((n, 3), np.float32),
              directions=np.ones((n, 3), np.float32),
              viewdirs=np.ones((n, 3), np.float32),
              radii=np.ones((n, 1), np.float32))


def test_calibration_seed_pair_short_circuits_ladder():
  """A clean seed pair is probed FIRST and ends the walk at one probe."""
  from samplenerfro_tpu.train import calibrate

  cands = ((8, 8), (16, 8), (24, 8), (32, 8))
  model = _LadderModel(need=3.0)
  chosen, results = calibrate.calibrate_march_window(
      model, {}, [{"rays": _probe_rays()}], candidates=cands,
      seed_pair=(24, 8))
  assert chosen == (24, 8)
  assert model.log == [(24, 8)], model.log  # exactly one probe

  # A DIRTY seed costs one probe, then the normal walk resumes and the
  # fastest clean candidate still wins (a stale cache cannot mis-pick).
  model2 = _LadderModel(need=2.5)
  chosen2, _ = calibrate.calibrate_march_window(
      model2, {}, [{"rays": _probe_rays()}], candidates=cands,
      seed_pair=(16, 8))
  assert model2.log[0] == (16, 8)
  assert chosen2 == (24, 8)

  # A seed that is NOT a valid candidate for this marcher is ignored.
  model3 = _LadderModel(need=3.0)
  chosen3, _ = calibrate.calibrate_march_window(
      model3, {}, [{"rays": _probe_rays()}], candidates=cands,
      seed_pair=(12, 8))
  assert model3.log[0] == (8, 8) and chosen3 == (24, 8)


def test_calibration_cache_roundtrip(tmp_path):
  from samplenerfro_tpu.train import calibrate

  key = calibrate.cache_key("pallas", "abcd1234", (1024, 3), tile_size=16,
                            num_coarse_samples=64, num_path_samples=12,
                            march_interp="default")
  primary = str(tmp_path / "calib.json")
  seedfile = str(tmp_path / "seed.json")
  assert calibrate.load_cached_pair(key, (primary, seedfile)) is None
  calibrate.store_cached_pair(key, (24, 8), seedfile)
  assert calibrate.load_cached_pair(key, (primary, seedfile)) == (24, 8)
  # The first cache file in order wins; others are fallbacks.
  calibrate.store_cached_pair(key, (16, 4), primary)
  assert calibrate.load_cached_pair(key, (primary, seedfile)) == (16, 4)
  # Unreadable/corrupt files are skipped, not fatal.
  (tmp_path / "junk.json").write_text("{not json")
  assert calibrate.load_cached_pair(
      key, (str(tmp_path / "junk.json"), seedfile)) == (24, 8)
  # Distinct keys don't collide (grid content / probe kind / interp).
  other = calibrate.cache_key("pallas", "abcd1234", (1024, 3), tile_size=16,
                              num_coarse_samples=64, num_path_samples=12,
                              march_interp="highest")
  assert calibrate.load_cached_pair(other, (primary, seedfile)) is None


def test_maybe_autocalibrate_persists_and_reloads(tmp_path):
  """Run 2 with the same cache file verifies the cached pair in ONE probe."""
  import types

  from samplenerfro_tpu.train import calibrate

  flags = types.SimpleNamespace(
      march_mode="pallas", march_window=0, march_refetch=8, tile_size=16,
      num_coarse_samples=64, num_path_samples=12, march_interp="default",
      stage="radiance", march_bwd_impl="auto")
  path = str(tmp_path / "march_calib.json")
  batches = [{"rays": _probe_rays()}]
  cands = calibrate.CANDIDATES_PALLAS

  # First clean candidate on the real pallas ladder for need=3.0.
  expect = next(c for c in cands if c[0] / c[1] >= 3.0)
  model = _LadderModel(need=3.0, window=16)
  _, w, r = calibrate.maybe_autocalibrate(
      model, {}, flags, batches, cache_paths=(path,), store_path=path,
      grid_tag="tag1")
  assert (w, r) == expect
  assert len(model.log) == cands.index(expect) + 1  # full walk

  model2 = _LadderModel(need=3.0, window=16)
  _, w2, r2 = calibrate.maybe_autocalibrate(
      model2, {}, flags, batches, cache_paths=(path,), store_path=path,
      grid_tag="tag1")
  assert (w2, r2) == expect
  assert model2.log == [expect]  # cache-seeded: one verification probe

  # A different grid hash invalidates the cache (full walk again).
  model3 = _LadderModel(need=3.0, window=16)
  calibrate.maybe_autocalibrate(
      model3, {}, flags, batches, cache_paths=(path,), store_path=path,
      grid_tag="tag2")
  assert len(model3.log) == cands.index(expect) + 1


def test_mosaic_off_gates_every_capability_check(monkeypatch):
  """SAMPLENERFRO_MOSAIC=0 on a TPU backend disables all pallas routing.

  The relay-outage demotion (utils/mosaic_probe.py) funnels through
  march_kernel.mosaic_off(): forward supports(), lean supports(), the
  reverse kernel's supports(), and the EIKVJP impl resolution must all
  say no, so nothing ever reaches a Mosaic compile.
  """
  import jax as jax_mod

  from samplenerfro_tpu.ops import grid as grid_ops
  from samplenerfro_tpu.ops.pallas import march_bwd_kernel
  from samplenerfro_tpu.ops.pallas import march_kernel
  from samplenerfro_tpu.train import calibrate

  spec = grid_ops.GridSpec([64] * 3, [-1.5] * 3, [1.5] * 3)
  sup_args = (spec, 768, 512, 256, 16, 8)
  assert march_kernel.supports(*sup_args)
  assert march_kernel.supports_lean(spec, 768, 512, 64, 256, 16, 8)
  assert march_bwd_kernel.supports(*sup_args)

  monkeypatch.setenv("SAMPLENERFRO_MOSAIC", "0")
  # CPU backends are never gated (tests run interpret-mode pallas).
  assert not march_kernel.mosaic_off()
  assert march_kernel.supports(*sup_args)

  monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
  assert march_kernel.mosaic_off()
  assert not march_kernel.supports(*sup_args)
  assert not march_kernel.supports_lean(spec, 768, 512, 64, 256, 16, 8)
  assert not march_bwd_kernel.supports(*sup_args)
  # The calibration ladder's resolved bwd impl demotes pallas -> stepvjp.
  assert calibrate._resolved_bwd_impl("auto") == "stepvjp"
  assert calibrate._resolved_bwd_impl("pallas") == "stepvjp"
  assert calibrate._resolved_bwd_impl("passes") == "passes"


def test_march_tiled_interp_precision_knob():
  """interp_precision threads to the interp einsum (exact on CPU)."""
  spec, data = _blob_grid()
  o, d = _tile_bundle()
  hi = eikt.march_tiled(spec, data, o, d, 0.5, 0.02, 32,
                        block_size=o.shape[0], window=16, refetch_every=8)
  lo = eikt.march_tiled(spec, data, o, d, 0.5, 0.02, 32,
                        block_size=o.shape[0], window=16, refetch_every=8,
                        interp_precision="default")
  # CPU ignores matmul precision hints: identical results, but the knob
  # must be plumbed (a typo'd name would raise in getattr).
  for a, b in zip(hi[:5], lo[:5]):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_march_bwd_impl_autodiff_matches_stepvjp_grads():
  """bwd_impl='autodiff' (direct differentiable tiled forward) gradient
  parity vs the analytic stepvjp sweep at matched trajectories."""
  from jax import random as jrandom

  from samplenerfro_tpu.ops import eikonal_vjp
  from samplenerfro_tpu.ops import mlp as fmlp

  spec, data = _blob_grid()
  n = spec.ndim[0]
  data3d = jnp.asarray(np.asarray(data).reshape(n, n, n * 4))
  o, d = _tile_bundle()
  bs = o.shape[0]
  S, near, h = 32, 0.5, 0.02
  so3_key = (0, 4, True, True, True, False)
  so3 = fmlp.mlp_init(jrandom.PRNGKey(0), 2 * 3 * so3_key[1], net_depth=2,
                      net_width=16, skip_layer=4, num_out_channels=3,
                      output_init_std=1e-2)
  so3_apply = eikonal_vjp.make_so3_apply(*so3_key)
  march = eikonal_vjp.make_march_allstage(
      spec, near, h, S, bs, 16, 8, so3_key, "tiled", bwd_impl="stepvjp")

  def loss_analytic(th):
    pos, dirs, dist, nv, g, _ = march(data3d, o, d, jnp.float32(0.7), th)
    return jnp.sum(jnp.sin(pos)) + jnp.sum(dirs) + jnp.sum(nv * g)

  def loss_autodiff(th):
    pred = lambda rp, g_: so3_apply(th, jnp.float32(0.7), rp, g_)
    pos, dirs, dist, nv, g, _ = eikt.march_tiled(
        spec, data3d, o, d, near, h, S, block_size=bs, window=16,
        refetch_every=8, pred_grad_fn=pred, use_pred_grad=True)
    return jnp.sum(jnp.sin(pos)) + jnp.sum(dirs) + jnp.sum(nv * g)

  ga = jax.grad(loss_analytic)(so3)
  gb = jax.grad(loss_autodiff)(so3)
  for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-4, atol=1e-6)
