"""Benchmark: training throughput (rays/sec) at the reference's workload.

Runs the full radiance-stage train step at flagship scene scale and prints
ONE JSON line:

  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / REFERENCE_3090_RAYS_PER_SEC, ...}

The HEADLINE value is the flagship ship workload (batch 1024 rays,
64 coarse + 128 fine samples, 12 eikonal path samples, 8x256 MLPs,
BENCH_GRID_N^3 IOR grid — default 512, the ship scene's
voxelize_uni512_highpoly scale). The march (window, refetch) is
AUTO-CALIBRATED on the bench batch exactly as production
--march_window=0 (fastest pair with zero out-of-window clamps), the
chosen pair and the timed steps' march_oow are recorded in the JSON, and
"march_exact" says whether the measured configuration is clamp-free.
BENCH_MARCH_WINDOW pins a window instead. The same JSON line carries
companion measurements as extra fields (BENCH_FAST=1 skips them):

  grid128_rays_per_sec      the 128^3 workload (round-1/2 continuity)
  grid384_s24_rays_per_sec  real-scene scale: 384^3 grid, 64x24=1536-step
                            march (configs/glass.{yaml,gin}), auto window
  all_stage_rays_per_sec    joint-refinement stage (differentiable march
                            via the analytic reverse sweep)
  eval_rays_per_sec         chunked full-image render (the reference's
                            test_rays_per_sec, train.py:450-454)

Robustness (round-5 redesign — round 4 lost a fully-measured run to a
single end-of-run print stuck behind a stalled companion):
  - the full JSON line is printed (flushed) the moment the HEADLINE is
    measured and re-printed after every companion, so the driver's
    parse-the-tail always sees everything measured so far;
  - BENCH_TIME_BUDGET (secs, default 1100, counted once the backend is
    up) skips remaining companions when exhausted (*_skipped_budget);
  - calibration ladders are persisted (train/calibrate.py cache; file at
    BENCH_CALIB_CACHE, repo seed bench_calib_seed.json) and the
    all-stage companion seeds from the headline's verified pair;
  - BENCH_SMOKE=1 runs selfcheck + headline only at a pinned window — the
    fast measurement-path dry-run for pre-round-end timing.

Before timing, an on-device correctness gate runs the production Pallas
kernel against the XLA tiled and reference-parity scan marchers, and the
analytic all-stage VJP against XLA autodiff (train/selfcheck.py); the JSON
records "check": "ok". BENCH_CHECK=0 disables. A broken kernel fails the
bench instead of producing wrong timings.

Measures the framework's production TPU configuration: tile-batched
training with the fused Pallas marcher at the safe window (16) and bf16
radiance MLPs, quality-validated against iid batching on the synthetic
refractive benchmark (scripts/validate_quality.py). Set BENCH_MARCH_MODE
to tiled/scan for the XLA marchers (scan == reference-parity iid batching).

Baseline provenance (both labeled in the JSON):
  - vs_baseline: divides by an RTX-3090 ESTIMATE for the reference code —
    the reference repo publishes no numbers (BASELINE.md); 3090
    JaxNeRF-class trainers with a 768-step eikonal scan per ray run
    ~2-4k rays/s, we use 3000. An estimate, not a measurement.
  - vs_parity_scan_tpu: divides by this framework's own reference-parity
    iid/scan configuration MEASURED on the same chip. The stored constant
    below was measured with BENCH_MARCH_MODE=scan on one v5e;
    BENCH_REMEASURE_PARITY=1 re-measures it in-run and stamps the fresh
    value (and its provenance) into the JSON instead of trusting the
    literal.
"""

import functools
import json
import os
import subprocess
import sys
import time
import types

import jax
import numpy as np
from flax.training.train_state import TrainState
from jax import random

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from samplenerfro_tpu.data.rays import Rays
from samplenerfro_tpu.utils import config as config_lib

config_lib.apply_platform_overrides()
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.parallel import mesh as mesh_lib
from samplenerfro_tpu.train import step as step_lib

# RTX-3090 estimate for the reference code (BASELINE.md: no published
# numbers exist; this is an order-of-magnitude anchor, labeled as such).
REFERENCE_3090_RAYS_PER_SEC = 3000.0
# This framework's reference-parity iid/scan config measured on one v5e
# (BENCH_MARCH_MODE=scan BENCH_GRID_N=128); BENCH_REMEASURE_PARITY=1
# re-measures instead of trusting this literal.
PARITY_SCAN_TPU_RAYS_PER_SEC = 16335.0

BATCH = 1024
GRID_N = int(os.environ.get("BENCH_GRID_N", "512"))
BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "1100"))
T_START = None  # set in main() once the backend is up


def ship_args(**overrides):
  args = types.SimpleNamespace(
      model="nerf", net_activation="relu", rgb_activation="sigmoid",
      sigma_activation="softplus",
      min_deg_point=0, max_deg_point=10, deg_view=4,
      num_coarse_samples=64, num_fine_samples=128,
      use_viewdirs=True, sh_deg=-1, sh_direnc_deg=-1,
      near=2.0, far=6.0, noise_std=None, white_bkgd=False,
      net_depth=8, net_width=256, net_depth_condition=1,
      net_width_condition=128,
      skip_layer=4, num_rgb_channels=3, num_sigma_channels=1, lindisp=False,
      legacy_posenc_order=False, randomized=True,
      stage="radiance_bench", num_path_samples=12,
      use_fine_sparsity=False, use_online_sparsity=False,
      config="ship_skydome-bkgd_no-partial-reflect_cycles",
      bg_weight=0.025, bg_smooth_weight=1.0, bg_patch_size=128,
      beta_weight=0.0, sparsity_weight=0.0,
      normal_loss_weight=0.0, normal_smooth_weight=0.0,
      weight_decay_mult=0.0, grad_max_val=0.0, grad_max_norm=0.0,
      lr_init=5e-4, lr_final=5e-6, max_steps=200000, lr_delay_steps=2500,
      lr_delay_mult=0.01, anneal_delay_steps=2500, anneal_max_steps=160000,
      extra_batch_size=16, scan_unroll=8)
  for k, v in overrides.items():
    setattr(args, k, v)
  return args


def make_inputs(batch, seed=0, tiled=False, tile=16):
  rng = np.random.RandomState(seed)
  if tiled:
    # Camera-like ray bundles: random 16x16 pixel tiles of an 800px view.
    fov, res = 0.69, 800
    o = np.array([0, 0, -4.0], np.float32)
    dirs = []
    for _ in range(batch // (tile * tile)):
      cx, cy = rng.randint(0, res - tile, 2)
      for py in range(tile):
        for px in range(tile):
          x = (cx + px - res / 2) / res * fov
          y = (cy + py - res / 2) / res * fov
          dd = np.array([np.tan(x), np.tan(y), 1.0])
          dirs.append(dd / np.linalg.norm(dd))
    d = np.asarray(dirs, np.float32)
    o = np.broadcast_to(o, d.shape).copy()
  else:
    d = rng.randn(batch, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.randn(batch, 3).astype(np.float32) * 0.1
  rays = Rays(
      origins=o.astype(np.float32),
      directions=d.astype(np.float32),
      viewdirs=d.astype(np.float32),
      radii=np.full((batch, 1), 0.001, np.float32))
  env = Rays(*[rng.randn(128, 128, 3).astype(np.float32) for _ in range(4)])
  return {
      "pixels": rng.rand(batch, 3).astype(np.float32),
      "rays": rays,
      "env_rays": env,
      "pts": rng.randn(16, 1, 3).astype(np.float32),
      "grads": rng.randn(16, 1, 3).astype(np.float32),
      "annealed_alpha": np.float32(0.5),
      "coarse_alpha_target": np.float32(0.0),
      "fine_alpha_target": np.float32(0.0),
  }


def camera_rays(res=800, fov=0.69):
  """Full-view camera ray grid [res, res, C] (eval-render workload)."""
  xs = (np.arange(res) - res / 2) / res * fov
  ys = (np.arange(res) - res / 2) / res * fov
  dx, dy = np.meshgrid(np.tan(xs), np.tan(ys))
  d = np.stack([dx, dy, np.ones_like(dx)], -1)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(np.array([0, 0, -4.0], np.float32), d.shape).copy()
  return Rays(origins=o.astype(np.float32), directions=d.astype(np.float32),
              viewdirs=d.astype(np.float32),
              radii=np.full((res, res, 1), 0.001, np.float32))


def blob_grid(n):
  axes = np.linspace(-1.5, 1.5, n, dtype=np.float32)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = 1.0 + 0.5 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)
  return vals.reshape(-1, 1).astype(np.float32)


def scene_grid(n, radius=0.7):
  """Scene-like IOR grid: compact object, EXACT ambient 1.0 free space.

  Production grids (voxelize_mesh.py -> mesh.pkl, reference
  voxelize/main.py) are exactly 1.0 outside the object, which is what
  the fused kernel's uniform-window free-space skip predicates on
  (march_kernel.uniformity_flags). The headline blob_grid decays to 1.0
  only asymptotically, so it exercises the marcher but not the skip;
  this grid is the skip A/B workload (scene512_* companion fields).
  """
  axes = np.linspace(-1.5, 1.5, n, dtype=np.float32)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  r2 = xx**2 + yy**2 + zz**2
  bump = np.maximum(0.0, 1.0 - r2 / radius**2)**2
  vals = 1.0 + 0.5 * bump
  return vals.reshape(-1, 1).astype(np.float32)


_GRID_CACHE = {}


def _grid(n, kind="blob"):
  key = (kind, n)
  if key not in _GRID_CACHE:
    _GRID_CACHE[key] = blob_grid(n) if kind == "blob" else scene_grid(n)
  return _GRID_CACHE[key]


def _build(args, grid_n):
  grid = _grid(grid_n, getattr(args, "bench_grid", "blob"))
  batch = make_inputs(
      BATCH, tiled=(args.march_mode in ("tiled", "pallas")))
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": batch["rays"]}, args,
      [grid_n] * 3, [-1.5] * 3, [1.5] * 3, grid)
  mesh = mesh_lib.make_mesh()
  grid_vars = {"grid": mesh_lib.replicate(dict(variables["grid"]), mesh)}
  tx, _, _ = step_lib.create_optimizer(args)
  state = TrainState.create(apply_fn=model.apply,
                            params=variables["params"], tx=tx)
  state = mesh_lib.replicate(state, mesh)
  return model, state, grid_vars, mesh, batch


# Calibration persistence (train/calibrate.py): the ladder's per-candidate
# Mosaic compiles cost minutes through the remote relay, so verified
# (window, refetch) picks are cached at CALIB_CACHE and SEED the next
# run's ladder (the seed is re-probed, never trusted blindly — a stale
# entry costs one probe). The repo-committed seed file primes a fresh
# /tmp so even a first-boot driver bench skips the cold walk.
CALIB_CACHE = os.environ.get("BENCH_CALIB_CACHE",
                             "/tmp/jax_cache/snr_march_calib.json")
CALIB_SEED_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_calib_seed.json")


def _auto_calibrate(model, state, grid_vars, args, probe_batches, grid_n,
                    seed_pair=None, probe_kind="train"):
  """Resolve window=0 via the cached/seeded probe ladder; returns model.

  probe_kind keeps train-batch and eval-view calibrations on distinct
  cache keys: a full view needs a wider window than the 1024-ray bench
  batch, and a view-derived cache entry seeding the headline would make
  the ladder accept the wider (slower) pair without ever probing the
  faster ones.
  """
  from samplenerfro_tpu.train import calibrate
  variables = {"params": state.params, **grid_vars}
  key = calibrate.cache_key(
      args.march_mode,
      f"{getattr(args, 'bench_grid', 'blob')}{grid_n}-{probe_kind}",
      np.asarray(probe_batches[0]["rays"].origins).shape,
      tile_size=args.tile_size,
      num_coarse_samples=args.num_coarse_samples,
      num_path_samples=args.num_path_samples,
      march_interp=args.march_interp, stage=args.stage,
      bwd_impl=calibrate._resolved_bwd_impl(
          getattr(args, "march_bwd_impl", "auto")))
  seed = seed_pair or calibrate.load_cached_pair(
      key, (CALIB_CACHE, CALIB_SEED_FILE))
  (w, r), oow_by = calibrate.calibrate_march_window(
      model, variables, probe_batches, seed_pair=seed)
  if oow_by.get((w, r)) == 0:
    calibrate.store_cached_pair(key, (w, r), CALIB_CACHE)
  model = model.clone(march_window=w, march_refetch=r)
  args.march_window, args.march_refetch = w, r
  return model


def measure_train(args, grid_n, n_steps=20, seed_pair=None):
  """(rays/s, info) of the full train step for one configuration.

  march_window == 0 auto-calibrates the (window, refetch) pair on the
  bench batch exactly as the production driver does (--march_window=0),
  so the recorded number is the fastest configuration with ZERO window
  clamps. `info` records the chosen pair and the measured march_oow of
  the timed steps ("march_exact": whether the result is clamp-free).
  """
  model, state, grid_vars, mesh, batch = _build(args, grid_n)
  info = {}
  if args.march_mode in ("tiled", "pallas") and args.march_window == 0:
    model = _auto_calibrate(model, state, grid_vars, args,
                            [{"rays": batch["rays"]}], grid_n,
                            seed_pair=seed_pair)
    info["march_window"] = args.march_window
    info["march_refetch"] = args.march_refetch
  tstep = step_lib.make_train_step(model, args, grid_vars)
  dbatch = mesh_lib.put_batch(batch, mesh)
  keys = random.PRNGKey(1)
  for _ in range(3):
    state, stats, keys = tstep(keys, state, dbatch)
  jax.block_until_ready(state.params)
  t0 = time.perf_counter()
  for _ in range(n_steps):
    state, stats, keys = tstep(keys, state, dbatch)
  jax.block_until_ready(state.params)
  dt = time.perf_counter() - t0
  if args.march_mode in ("tiled", "pallas"):
    oow = int(jax.device_get(stats.march_oow))
    info["march_oow"] = oow
    info["march_exact"] = oow == 0
  return BATCH * n_steps / dt, info


def measure_train_loop(args, grid_n, k=1, n_steps=40):
  """Wall-clock rays/s of a production-shaped train LOOP.

  Unlike measure_train (fixed device-resident batch; async dispatch hides
  the per-call host cost), this feeds a FRESH device batch per step
  through the threaded prefetch exactly like train.py — so it pays the
  real per-step H2D + dispatch path — and runs k optimizer steps per
  jitted call (--steps_per_dispatch). The k=10 vs k=1 delta is the
  dispatch-amortization win a train.py user sees.
  """
  from samplenerfro_tpu.data import prefetch as prefetch_lib
  model, state, grid_vars, mesh, batch = _build(args, grid_n)
  if args.march_mode in ("tiled", "pallas") and args.march_window == 0:
    model = _auto_calibrate(model, state, grid_vars, args,
                            [{"rays": batch["rays"]}], grid_n)
  make = (step_lib.make_train_step_multi if k > 1
          else step_lib.make_train_step)
  tstep = make(model, args, grid_vars)
  host_batch = jax.tree_util.tree_map(np.asarray, batch)
  if k > 1:
    host_batch = jax.tree_util.tree_map(
        lambda x: np.stack([x] * k), host_batch)
  warmup = 3
  n_disp = n_steps // k
  served = [0]

  def batch_fn():
    if served[0] >= warmup + n_disp:
      return None
    served[0] += 1
    return host_batch

  batches = prefetch_lib.device_prefetch(batch_fn, mesh, size=3,
                                         stacked=(k > 1))
  it = iter(batches)
  keys = random.PRNGKey(1)
  for _ in range(warmup):
    state, stats, keys = tstep(keys, state, next(it))
  jax.block_until_ready(state.params)
  t0 = time.perf_counter()
  for _ in range(n_disp):
    state, stats, keys = tstep(keys, state, next(it))
  jax.block_until_ready(state.params)
  dt = time.perf_counter() - t0
  return BATCH * n_disp * k / dt


def measure_eval(args, grid_n, res=800, chunk=8192):
  """Rays/s of the chunked tile-reordered full-image render."""
  from samplenerfro_tpu.utils import render as render_lib
  model, state, grid_vars, mesh, _ = _build(args, grid_n)
  if args.march_mode in ("tiled", "pallas") and args.march_window == 0:
    from samplenerfro_tpu.train import calibrate
    probe = calibrate.probe_batches_from_view(
        camera_rays(res), args.tile_size, BATCH)
    model = _auto_calibrate(model, state, grid_vars, args, probe, grid_n,
                            probe_kind=f"eval{res}")
  render_fn = step_lib.make_render_fn(model, args, grid_vars, mesh=mesh)
  # BENCH_EVAL_CPD > 1: render that many chunks per jitted dispatch
  # (lax.map grouping, bit-identical; see utils/render.py).
  cpd = int(os.environ.get("BENCH_EVAL_CPD", "1"))
  render_multi = (step_lib.make_render_fn_multi(model, args, grid_vars,
                                                mesh=mesh)
                  if cpd > 1 else None)
  # Clamp-free repair ladder for bundles that outdrift every calibrated
  # window (train/step.py make_repair_fns); its cost is part of the
  # timed render, so the headline stays honest.
  repair_fns = step_lib.make_repair_fns(model, args, grid_vars, mesh=mesh)
  img_rays = camera_rays(res)
  params = state.params
  tile = args.tile_size if args.march_mode in ("tiled", "pallas") else 0
  run = lambda: render_lib.render_image(
      lambda k0, k1, r: render_fn(params, k0, k1, r), img_rays,
      random.PRNGKey(2), False, chunk=chunk, mesh=mesh, tile=tile,
      chunks_per_dispatch=cpd, return_oow=True,
      render_multi_fn=(None if render_multi is None else
                       lambda k0, k1, r: render_multi(params, k0, k1, r)),
      render_exact_fn=(None if repair_fns is None else
                       [functools.partial(f, params) for f in repair_fns]))
  run()  # warmup/compile
  t0 = time.perf_counter()
  oow = int(run()[3])
  dt = time.perf_counter() - t0
  return res * res / dt, dt, oow


def production_args(stage="radiance_bench", window=None, **over):
  march_mode = os.environ.get("BENCH_MARCH_MODE", "pallas")
  if window is None:
    # 0 = auto-calibrate (window, refetch) on the bench batch, exactly as
    # the production --march_window=0 path; a number pins the window.
    window = int(os.environ.get("BENCH_MARCH_WINDOW", "0"))
  # Production default: bf16 radiance MLPs (quality-validated neutral on
  # the synthetic benchmark — STATUS.md "Quality A/B"); scan mode stays
  # fp32 (it is the reference-parity configuration).
  mlp_dtype = os.environ.get(
      "BENCH_MLP_DTYPE", "float32" if march_mode == "scan" else "bfloat16")
  mlp_remat = os.environ.get("BENCH_MLP_REMAT", "0") == "1"
  # Measured on v5e: the fused Pallas MLP loses to XLA's Dense stack at
  # these shapes (STATUS.md round-2 notes), so xla stays the default.
  mlp_kernel = os.environ.get("BENCH_MLP_KERNEL", "xla")
  # Production: the all-stage reverse sweep's batched passes run in bf16
  # (see ops/eikonal_vjp.py); BENCH_MARCH_BWD_DTYPE=float32 for the
  # autodiff-exact configuration.
  march_bwd_dtype = os.environ.get("BENCH_MARCH_BWD_DTYPE", "bfloat16")
  # Fused-march interpolation precision. Production (configs/tpu/) ships
  # "default" (single-pass bf16: +45% at the 512^3 flagship, quality-
  # neutral on the exact-GT scene); BENCH_MARCH_INTERP=highest measures
  # the fp32-exact configuration.
  march_interp = os.environ.get(
      "BENCH_MARCH_INTERP", "float32" if march_mode == "scan" else "default")
  if march_interp == "float32":
    march_interp = "highest"
  refetch = int(os.environ.get("BENCH_MARCH_REFETCH", "8"))
  # Lean march emit (7-channel dense trajectory + in-kernel jittered
  # subsample) A/B knob; see ops/pallas/march_kernel.py.
  march_emit = os.environ.get("BENCH_MARCH_EMIT", "lean")
  # Uniform-window free-space skip (march_kernel.py). Only fires on grids
  # with exactly-uniform bricks — the scene512 companion workload; the
  # headline blob has none (its Gaussian never lands exactly on ambient
  # except in fp32-underflow corners the bench rays never visit).
  march_skip = os.environ.get("BENCH_MARCH_SKIP", "off")
  over = {"march_refetch": refetch, "march_bwd_dtype": march_bwd_dtype,
          "march_interp": march_interp, "march_emit": march_emit,
          "march_skip": march_skip, **over}
  return ship_args(march_mode=march_mode, tile_size=16, march_window=window,
                   mlp_dtype=mlp_dtype, mlp_remat=mlp_remat,
                   mlp_kernel=mlp_kernel, stage=stage, **over)


def wait_for_backend():
  """Wait (bounded) for the TPU tunnel before touching the backend.

  The axon tunnel has multi-hour outages, and an in-process backend-init
  failure poisons the whole process (a hung init can sit ~25 min before
  raising). Probe from a SUBPROCESS with a hard timeout so this process
  first touches jax.devices() only once a probe has succeeded. Bounded by
  BENCH_WAIT_TPU_SECS (default 1800); 0 disables the probe entirely.
  """
  if os.environ.get("SAMPLENERFRO_FORCE_CPU") == "1":
    return
  budget = float(os.environ.get("BENCH_WAIT_TPU_SECS", "1800"))
  if budget <= 0:
    return
  deadline = time.time() + budget
  while True:
    try:
      ok = subprocess.run(
          [sys.executable, "-c", "import jax; jax.devices()"],
          timeout=300, stdout=subprocess.DEVNULL,
          stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
      ok = False
    if ok:
      return
    if time.time() >= deadline:
      print("bench.py: TPU backend unavailable after waiting "
            f"{budget:.0f}s; giving up.", file=sys.stderr)
      raise SystemExit(1)
    print("bench.py: TPU backend down; retrying in 60s "
          f"(deadline in {deadline - time.time():.0f}s)", file=sys.stderr)
    time.sleep(60)


def main():
  global T_START
  record = {}
  wait_for_backend()
  # Measurement wall-clock budget (secs, counted from after the backend
  # probe): once exhausted, remaining companions are SKIPPED (recorded as
  # *_skipped_budget) so the run always finishes inside the driver's
  # timeout with everything measured so far on its last JSON line.
  T_START = time.monotonic()

  if (os.environ.get("BENCH_MARCH_MODE", "pallas") == "pallas"
      and os.environ.get("SAMPLENERFRO_FORCE_CPU") != "1"):
    # A dead Mosaic remote-compile relay blocks the first pallas_call
    # forever — which would turn this whole run into a driver timeout
    # with no JSON line (the round-4 failure mode, in a new guise).
    # Probe under a wall clock; on failure demote the entire bench to
    # the XLA tiled marcher + stepvjp reverse sweep, honestly labeled.
    from samplenerfro_tpu.utils import mosaic_probe
    if not mosaic_probe.probe():
      os.environ["SAMPLENERFRO_MOSAIC"] = "0"
      os.environ["BENCH_MARCH_MODE"] = "tiled"
      os.environ["EIKVJP_IMPL"] = "stepvjp"
      record["mosaic_relay"] = "unavailable"
      print("bench.py: mosaic relay unavailable — benching the XLA "
            "tiled-marcher fallback configuration", file=sys.stderr)

  if os.environ.get("BENCH_CHECK", "1") != "0":
    # On-device correctness gate (see module docstring): raises on
    # disagreement between pallas/tiled/scan forwards or between the
    # analytic all-stage VJP and XLA autodiff.
    from samplenerfro_tpu.train import selfcheck
    check_window = int(os.environ.get("BENCH_MARCH_WINDOW", "0")) or 16
    deviations, soft_failures = selfcheck.check_march(window=check_window)
    record["check"] = "ok"
    if soft_failures:
      # Experimental (non-production) impl out of envelope: recorded,
      # not fatal — the production measurement proceeds.
      record["check_soft_failures"] = soft_failures
      print(f"bench.py: {len(soft_failures)} experimental-impl "
            f"self-check deviation(s): {soft_failures}", file=sys.stderr)
    record["check_max_dev"] = round(
        max(v for k, v in deviations.items() if "bf16" not in k), 8)
    bf16_devs = [v for k, v in deviations.items() if "bf16" in k]
    if bf16_devs:
      # The production bf16-interp forward is gated against a LOOSE
      # envelope of the exact scan path (selfcheck.py); its deviation is
      # reported separately so the exact-path parity number stays tight.
      record["check_bf16_max_dev"] = round(max(bf16_devs), 8)
  else:
    record["check"] = "skipped"

  if os.environ.get("BENCH_MODE", "train") == "eval":
    res = int(os.environ.get("BENCH_EVAL_RES", "800"))
    chunk = int(os.environ.get("BENCH_EVAL_CHUNK", "8192"))
    # BENCH_EVAL_GRID=scene renders the production-representative grid
    # (compact object, exact ambient free space — like voxelized scenes);
    # the default blob is the refraction stress grid (IOR varies
    # everywhere, most view bundles outdrift every feasible window).
    args = production_args(
        bench_grid=os.environ.get("BENCH_EVAL_GRID", "blob"),
        march_skip=os.environ.get(
            "BENCH_MARCH_SKIP",
            "uniform" if os.environ.get("BENCH_EVAL_GRID") == "scene"
            else "off"))
    rays_per_sec, dt, eval_oow = measure_eval(args, GRID_N, res=res,
                                              chunk=chunk)
    print(json.dumps({
        "metric": "test_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": None,
        "baseline_provenance": "reference publishes no eval numbers",
        "march_mode": args.march_mode, "grid_n": GRID_N,
        "secs_per_frame": round(dt, 3), "res": res,
        "eval_march_oow": eval_oow, "eval_exact": eval_oow == 0, **record,
    }))
    return

  # BENCH_STAGE=all makes the joint-refinement stage the headline
  # (differentiable march via the analytic reverse sweep).
  stage = ("all_bench" if os.environ.get("BENCH_STAGE") == "all"
           else "radiance_bench")
  smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
  if smoke and "BENCH_MARCH_WINDOW" not in os.environ:
    # Smoke mode: selfcheck + headline only at a PINNED window — the
    # measurement-path dry-run (no calibration ladder, no companions).
    os.environ["BENCH_MARCH_WINDOW"] = "24"
  args = production_args(stage=stage)
  value, info = measure_train(args, GRID_N)
  record.update(info)

  parity = PARITY_SCAN_TPU_RAYS_PER_SEC
  parity_prov = "stored constant (measured on one v5e; see bench.py)"
  if os.environ.get("BENCH_REMEASURE_PARITY", "0") == "1":
    parity, _ = measure_train(
        ship_args(march_mode="scan", tile_size=16, march_window=16,
                  march_refetch=8, mlp_dtype="float32", mlp_remat=False,
                  mlp_kernel="xla", stage="radiance_bench"), 128)
    parity_prov = "re-measured this run (BENCH_REMEASURE_PARITY=1)"
    record["parity_scan_tpu_rays_per_sec"] = round(parity, 1)

  def emit():
    # One full JSON line per completed measurement stage, flushed: the
    # driver parses the LAST parseable line of the tail, so the headline
    # (and every companion measured so far) survives a timeout/crash in a
    # later companion. Round 4 lost an entire measured run to a single
    # end-of-run print behind a stalled calibration ladder.
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / REFERENCE_3090_RAYS_PER_SEC, 3),
        "baseline_provenance": "RTX-3090 estimate (no published numbers)",
        "vs_parity_scan_tpu": round(value / parity, 3),
        "parity_provenance": parity_prov,
        "march_mode": args.march_mode,
        "march_interp": args.march_interp,
        "march_emit": args.march_emit,
        "march_epilogue": os.environ.get("MARCH_EPILOGUE", "xla"),
        "mlp_dtype": args.mlp_dtype,
        "mlp_kernel": args.mlp_kernel,
        "stage": args.stage,
        "grid_n": GRID_N,
        **({"march_bwd_impl": os.environ.get("EIKVJP_IMPL", "pallas"),
            "march_bwd_pack": os.environ.get("MARCH_BWD_PACK", "mxu"),
            "march_bwd_dtype": args.march_bwd_dtype}
           if stage == "all_bench" else {}),
        "elapsed_secs": round(time.monotonic() - T_START, 1),
        **record,
    }), flush=True)

  emit()  # the headline is now unlosable

  def over_budget(name):
    left = BUDGET - (time.monotonic() - T_START)
    if left > 0:
      return False
    record[f"{name}_skipped_budget"] = True
    print(f"bench.py: skipping {name} (BENCH_TIME_BUDGET={BUDGET:.0f}s "
          "exhausted)", file=sys.stderr)
    return True

  def companion(name, args_c, grid_n, seed_pair=None):
    # A companion failure (e.g. a TPU-tunnel flake mid-run) must not cost
    # the headline measurement already taken: record the error instead.
    if over_budget(name):
      return
    try:
      rays, inf = measure_train(args_c, grid_n, seed_pair=seed_pair)
    except Exception as e:  # noqa: BLE001
      record[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
      return
    record[f"{name}_rays_per_sec"] = round(rays, 1)
    for k in ("march_window", "march_refetch"):
      if k in inf:
        record[f"{name}_{k.split('_')[1]}"] = inf[k]
    if not inf.get("march_exact", True):
      record[f"{name}_march_oow"] = inf["march_oow"]
    emit()

  fast = smoke or os.environ.get("BENCH_FAST", "0") == "1"
  if not fast and stage == "radiance_bench":
    # Companion measurements for the record (see module docstring),
    # most-load-bearing first (the wall-clock budget trims from the tail).
    # The all-stage run seeds its restricted calibration ladder with the
    # headline's verified pair (same batch, same grid — round 4 timed out
    # walking this ladder cold from (8, 8)).
    headline_pair = (record.get("march_window"), record.get("march_refetch"))
    companion("all_stage", production_args(stage="all_bench"), GRID_N,
              seed_pair=(headline_pair if headline_pair[0] else None))
    # Two eval workloads: the production-representative scene grid
    # (compact object, exact ambient outside — voxelized-scene-like, with
    # the free-space skip) and the blob stress grid (IOR varies
    # everywhere; most 800² view bundles outdrift every feasible window,
    # so its honest exact number rides the (32, 2)/repair floor).
    for name, grid_kind, skip in (("eval_scene", "scene", "uniform"),
                                  ("eval", "blob", "off")):
      if over_budget(name):
        continue
      try:
        eval_rps, _, eval_oow = measure_eval(
            production_args(bench_grid=grid_kind, march_skip=skip), GRID_N)
        record[f"{name}_rays_per_sec"] = round(eval_rps, 1)
        record[f"{name}_march_oow"] = eval_oow
        record[f"{name}_exact"] = eval_oow == 0
      except Exception as e:  # noqa: BLE001
        record[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
      emit()
    if GRID_N != 128:
      companion("grid128", production_args(), 128)
    # Free-space-skip A/B on the scene-like grid (exact ambient outside
    # the object, like production voxelized grids — the headline blob has
    # no uniform bricks, see scene_grid). The skip run pins the off run's
    # auto-calibrated (window, refetch) so the skip is the only delta.
    companion("scene_off", production_args(bench_grid="scene"), GRID_N)
    companion("scene_skip", production_args(
        bench_grid="scene", march_skip="uniform",
        window=record.get("scene_off_window", 0),
        march_refetch=record.get("scene_off_refetch", 8)), GRID_N)
    companion("grid384_s24", production_args(num_path_samples=24), 384)
    # Production train-LOOP throughput (fresh batch per step through the
    # prefetch): k=1 is the single-step-dispatch loop, k=10 the
    # --steps_per_dispatch=10 loop. args carries the headline run's
    # calibrated window, so no re-calibration.
    for k in (1, 10):
      if over_budget(f"inloop_k{k}"):
        continue
      try:
        record[f"inloop_k{k}_rays_per_sec"] = round(
            measure_train_loop(production_args(
                window=args.march_window,
                march_refetch=args.march_refetch), GRID_N, k=k), 1)
      except Exception as e:  # noqa: BLE001
        record[f"inloop_k{k}_error"] = f"{type(e).__name__}: {e}"[:200]
      emit()

  emit()


if __name__ == "__main__":
  main()
