"""Auto-calibration of the tiled marcher's window size.

The tiled marcher (ops/eikonal_tiled.py) is exact only while every ray of a
tile block stays inside its block's grid window; the required window size
depends on scene geometry (grid resolution, camera field of view, how hard
the IOR field bends rays). This probe runs the path sampler over a few real
training batches for increasing window sizes and picks the smallest one
with zero out-of-window clamps, so drivers can default to "fast but exact"
without hand-tuning.
"""

import json
import os

import jax
import numpy as np


def probe_batches_from_view(rays, tile_size, batch_size):
  """Tile-reordered probe rays covering one whole [H, W] camera view.

  Renders reorder pixels into tile blocks (utils/render.py), so window
  calibration for eval/extract probes the same ordering: the view's rays
  permuted into tiles. EVERY tile block of the view is probed — sampling a
  subset under-picks the window (a strided 16-block probe of an 800² view
  still left 1.5M clamped interpolations on the unprobed central rays of
  the real render; the original first-batch_size-rays probe left 21M). The
  probe only runs the march (no MLPs/render), so full coverage costs ~1 s
  per ladder candidate, once per driver startup. Chunks share one shape
  (batch_size rounded down to whole blocks; the tail chunk overlaps the
  previous one) so each candidate compiles a single probe executable.
  """
  from samplenerfro_tpu.ops import eikonal_tiled
  h, w = rays.origins.shape[:2]
  perm, _ = eikonal_tiled.tile_order(h, w, tile_size)
  flat = jax.tree_util.tree_map(
      lambda x: np.asarray(x).reshape(h * w, -1)[perm], rays)
  block = tile_size**2
  nrays = h * w  # full tiles first, partial edge tiles last (tile_order)
  bs = min(nrays, max(block, (batch_size // block) * block))
  starts = list(range(0, nrays - bs + 1, bs))
  if starts[-1] + bs < nrays:
    starts.append(nrays - bs)  # overlapped tail chunk, same shape
  # Center-out probe order: the hardest bundles (strongly bent rays
  # through a centered refractive object) sit mid-view, so a window that
  # is going to fail fails on its FIRST probe chunk and the calibration
  # ladder early-exits it cheaply. Pure reordering — coverage unchanged.
  starts.sort(key=lambda s: abs(s + bs // 2 - nrays // 2))
  return [{"rays": jax.tree_util.tree_map(lambda x: x[s:s + bs], flat)}
          for s in starts]


# ---------------------------------------------------------------------------
# Calibration persistence. The ladder walk costs one Mosaic compile per
# probed candidate (minutes through the remote relay when cold), and the
# chosen (window, refetch) is a pure function of scene geometry + batch
# shape + marcher config — so drivers persist it and SEED the next run's
# ladder with the cached pair. The seed is never trusted blindly: it is
# probed first (one compile, zero-oow verified on the same probe batches),
# so a stale cache costs one probe, not correctness. Keys are caller-built
# strings (see cache_key); values record the pair + provenance.
# ---------------------------------------------------------------------------

CACHE_VERSION = "v1"


def cache_key(march_mode, grid_tag, batch_shape, *, tile_size,
              num_coarse_samples, num_path_samples, march_interp="highest",
              stage="", bwd_impl=""):
  """Stable string key for a calibration result.

  grid_tag identifies the IOR grid CONTENT (a content hash for real
  scenes — grid_content_tag — or a synthetic-grid name for bench grids);
  the rest are the knobs the chosen (window, refetch) depends on:
  trajectory geometry (samples, interp precision), probe bundle shape,
  and the candidate-ladder restriction (all-stage + pallas bwd).
  """
  restrict = stage.split("_")[0] if stage.startswith("all") else ""
  return "|".join([
      CACHE_VERSION, march_mode, str(grid_tag),
      "x".join(str(s) for s in tuple(batch_shape)), f"t{tile_size}",
      f"c{num_coarse_samples}", f"p{num_path_samples}", march_interp,
      restrict, bwd_impl if restrict else ""])


def grid_content_tag(grid_vals):
  """Cheap content hash of a host-side IOR grid array."""
  import hashlib
  a = np.ascontiguousarray(np.asarray(grid_vals))
  h = hashlib.md5()
  h.update(str(a.shape).encode())
  h.update(a[:: max(1, a.size // (1 << 20))].tobytes())  # ~1M-elem stride
  h.update(np.asarray([a.sum(dtype=np.float64)]).tobytes())
  return h.hexdigest()[:16]


def load_cached_pair(key, paths):
  """First cached (window, refetch) for key across cache files, or None."""
  for path in paths:
    if not path:
      continue
    try:
      with open(path) as f:
        entry = json.load(f).get(key)
    except (OSError, ValueError):
      continue
    if entry:
      return int(entry["window"]), int(entry["refetch"])
  return None


def store_cached_pair(key, pair, path, extra=None):
  """Record a verified calibration result (best-effort, non-fatal)."""
  if not path:
    return
  try:
    try:
      with open(path) as f:
        data = json.load(f)
    except (OSError, ValueError):
      data = {}
    data[key] = {"window": int(pair[0]), "refetch": int(pair[1]),
                 **(extra or {})}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
      json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
  except OSError as e:
    print(f"march calibration cache: could not write {path}: {e}")


def maybe_autocalibrate(model, variables, flags, probe_batches,
                        cache_paths=(), store_path=None, grid_tag=None,
                        probe_kind="train"):
  """Resolve --march_window=0 to a measured (window, refetch).

  Returns (model, window, refetch). No-op (returns the model unchanged and
  the configured values) unless the marcher is windowed and the window is 0.

  When grid_tag is given, a persisted calibration (cache_paths, searched in
  order) SEEDS the probe ladder — a clean cached pair short-circuits the
  walk at one verification probe — and a verified result is written to
  store_path, so repeat runs (resume, eval, the next bench) skip the
  ladder's per-candidate Mosaic compiles. probe_kind keys training-batch
  probes apart from full-view probes (a view needs a wider window; its
  cached pair seeding a train run would be accepted without probing the
  faster narrower candidates first).
  """
  if flags.march_mode not in ("tiled", "pallas") or flags.march_window != 0:
    return model, flags.march_window, flags.march_refetch
  probe_model = model.clone(march_window=16)
  seed = key = None
  if grid_tag is not None and probe_batches:
    key = cache_key(
        flags.march_mode, f"{grid_tag}-{probe_kind}",
        np.asarray(probe_batches[0]["rays"].origins).shape,
        tile_size=flags.tile_size,
        num_coarse_samples=flags.num_coarse_samples,
        num_path_samples=flags.num_path_samples,
        # Key by the stage-aware EFFECTIVE interp (--march_interp_all can
        # promote 'all'-stage runs): the probe model already carries it,
        # and a key on the raw flag would alias two different precisions.
        march_interp=getattr(model, "march_interp",
                             getattr(flags, "march_interp", "highest")),
        stage=getattr(flags, "stage", ""),
        bwd_impl=_resolved_bwd_impl(getattr(flags, "march_bwd_impl",
                                            "auto")))
    seed = load_cached_pair(key, cache_paths)
    if seed:
      print(f"march window calibration: loaded cached pair {seed} "
            "(verifying with one probe)")
  (window, refetch), oow_by_cand = calibrate_march_window(
      probe_model, variables, probe_batches, seed_pair=seed)
  print(f"march window auto-calibration: {oow_by_cand} "
        f"-> window={window} refetch={refetch}")
  if key is not None and store_path and oow_by_cand.get(
      (window, refetch)) == 0:
    store_cached_pair(key, (window, refetch), store_path)
  return (model.clone(march_window=window, march_refetch=refetch), window,
          refetch)


# (window, refetch) probe order ~ descending measured march throughput on
# one v5e at ship scale: smaller windows march faster (less DMA + smaller
# one-hot contractions); when a window's full reuse period drifts out,
# HALVING refetch_every halves the drift the window margin must cover and
# costs only extra (cheap) window DMAs — so (8, 4) ranks between (8, 8)
# and the next window size up, keeping w8's speed for scenes whose bundles
# fit it at the shorter reuse period. Exactness is never relaxed: a
# candidate is accepted only with ZERO out-of-window clamps on the probes.
# The fused Pallas kernel only supports window % 8 == 0 (sublane-aligned
# y extent; march_kernel._supports) — intermediate windows would silently
# fall back to the slower XLA tiled marcher, so the pallas ladder skips
# them.
# The terminal (32, 2) candidate buys drift coverage with refetch rate
# instead of width: halving the refetch period halves the drift a window
# must cover, and the Mosaic kernel's window DMA is a contiguous slab that
# rides full HBM bandwidth (unlike a wider window, which at 512^3 fails to
# compile). Measured on the 512^3 eval view: (32, 4) clamps 1.56M
# interpolations, (32, 2) clamps 2.6k — the residual is static bundle
# SPREAD ((32, 1) measures the same), which the scan repair pass absorbs.
CANDIDATES = ((8, 8), (8, 4), (10, 8), (12, 8), (12, 4), (16, 8), (16, 4),
              (20, 8), (24, 8), (24, 4), (28, 8), (32, 8), (32, 4),
              (40, 8), (40, 4), (48, 8), (48, 4), (32, 2))
CANDIDATES_PALLAS = ((8, 8), (8, 4), (16, 8), (16, 4), (24, 8), (24, 4),
                     (32, 8), (32, 4), (40, 8), (40, 4), (48, 8), (48, 4),
                     (32, 2))


def _resolved_bwd_impl(flag_value):
  """'auto' -> $EIKVJP_IMPL (default pallas), mirroring eikonal_vjp."""
  import os
  if flag_value in (None, "auto"):
    flag_value = os.environ.get("EIKVJP_IMPL", "pallas")
  if flag_value == "pallas":
    from samplenerfro_tpu.ops.pallas import march_kernel
    if march_kernel.mosaic_off():
      return "stepvjp"  # relay outage demotion (eikonal_vjp mirrors this)
  return flag_value


def fallback_rungs(window, refetch):
  """Ordered safer (window, refetch) rungs below the current one.

  --march_oow_action=fallback policy (train.py): step DOWN this ladder
  instead of cliff-dropping to the 3x-slower scan — first halve the
  window reuse period (halves the drift the window margin must cover,
  costs only extra cheap window DMAs), then widen the window (resetting
  the reuse period), and past the 48-voxel cap walk a terminal
  refetch-2 tier in DESCENDING width — wide windows can fail to COMPILE
  at flagship grid scale (512^3 Mosaic compiles cap at w32), so after
  the caller fences a failed width the walk still lands on a feasible
  narrower short-refetch rung (the calibration ladders' own (32, 2)
  terminal candidate). Every yielded rung has strictly more drift
  coverage (window/refetch) than the current pair; when none compiles,
  the caller falls back to the exact scan marcher.
  """
  rungs = []
  w, r = window, refetch
  while r > 4:
    r //= 2
    rungs.append((w, r))
  while w < 48:
    w = min(48, w + 8)
    rungs.append((w, 8))
    rungs.append((w, 4))
  rungs += [(48, 2), (40, 2), (32, 2)]
  coverage = window / max(refetch, 1)
  seen, out = set(), []
  for cand in rungs:
    if cand in seen or cand[0] / cand[1] <= coverage:
      continue
    seen.add(cand)
    out.append(cand)
  return out


def probe_compilable(model, variables, rays_shape):
  """Whether the model's marcher compiles at all for this batch shape.

  A wide window can exceed the Mosaic scoped-VMEM stack at flagship grid
  scale (512^3 compiles cap at w32); the runtime oow fallback probes each
  candidate rung with abstract inputs (one compile, no execution, no
  batch data) so it skips infeasible rungs instead of crashing the
  training loop at its next step.
  """
  import jax.numpy as jnp
  o = jax.ShapeDtypeStruct(tuple(rays_shape), jnp.float32)

  def fn(variables, origins, viewdirs):
    out, _ = model.apply(
        variables, origins, viewdirs, 1.0,
        method=lambda m, og, d, a: m.path_sampler(og, d, a),
        mutable=["diagnostics"])
    return out

  try:
    jax.jit(fn).lower(variables, o, o).compile()
    return True
  except jax.errors.JaxRuntimeError as e:
    print("march fallback probe: candidate failed to compile: "
          f"{str(e).splitlines()[0][:120]}")
    return False


def calibrate_march_window(model, variables, batches, candidates=None,
                           annealed_alpha=1.0, seed_pair=None):
  """Pick the fastest (window, refetch) with zero violations on probes.

  Args:
    model: a NerfModel configured with march_mode="tiled"/"pallas".
    variables: its variables (params + grid collections).
    batches: iterable of training batches (dicts with "rays").
    candidates: (window, refetch) pairs in descending expected speed.
    annealed_alpha: PE annealing value to probe with.
    seed_pair: optional (window, refetch) to probe FIRST (a cached or
      headline-run result); probed like any candidate — a clean seed
      short-circuits the ladder at one probe, a dirty/stale one costs
      one probe and the walk continues. Ignored unless it is a valid
      candidate for this marcher (so a stale cache can never select a
      pair the kernel does not support).

  Returns:
    ((window, refetch), per_candidate_oow dict). Falls back to the last
    candidate (with its violation count) if none is clean.
  """
  if candidates is None:
    candidates = (CANDIDATES_PALLAS if model.march_mode == "pallas"
                  else CANDIDATES)
  batches = list(batches)
  # 'all'-stage calibration with the fused Pallas reverse sweep selected:
  # keep only (window, refetch) pairs the REVERSE kernel also supports,
  # else the forward-fastest pair could silently forfeit the fused
  # backward (the vjp falls back to stepvjp outside its envelope —
  # ops/eikonal_vjp.py bwd_pallas).
  if (model.march_mode == "pallas"
      and getattr(model, "stage", "").startswith("all")
      and _resolved_bwd_impl(getattr(model, "march_bwd_impl", "auto"))
      == "pallas" and batches):
    from samplenerfro_tpu.ops.pallas import march_bwd_kernel
    batch_rays = int(np.asarray(batches[0]["rays"].origins).shape[0])
    num_samples = model.num_coarse_samples * model.num_path_samples
    bwd_ok = [
        (w, r) for (w, r) in candidates
        if march_bwd_kernel.supports(model.spec, num_samples, batch_rays,
                                     model.tile_block, w, r)]
    if bwd_ok and bwd_ok != list(candidates):
      print("march window calibration: restricting to reverse-kernel-"
            f"supported candidates {bwd_ok}")
      candidates = bwd_ok
  if seed_pair is not None:
    seed = (int(seed_pair[0]), int(seed_pair[1]))
    cand_list = list(candidates)
    if seed in cand_list:
      cand_list.remove(seed)
      candidates = [seed] + cand_list
      print(f"march window calibration: probing seed pair {seed} first")
    else:
      print(f"march window calibration: seed pair {seed} is not a valid "
            "candidate here; walking the ladder")
  results = {}
  failed_window = None  # narrowest window whose kernel failed to compile
  for window, refetch in candidates:
    if failed_window is not None and window >= failed_window:
      # Kernel VMEM/compile pressure grows monotonically with the window,
      # and a failed Mosaic compile costs ~2.5 min through the remote
      # relay — once one window fails, don't attempt anything wider
      # (measured: both refetch variants of a failing window fail too).
      print(f"march window calibration: skipping ({window}, {refetch}) "
            f"(window {failed_window} already failed to compile)")
      results[(window, refetch)] = None
      continue
    probe_model = model.clone(march_window=window, march_refetch=refetch)

    @jax.jit
    def probe(variables, origins, viewdirs, probe_model=probe_model):
      _, aux = probe_model.apply(
          variables, origins, viewdirs, annealed_alpha,
          method=lambda m, o, d, a: m.path_sampler(o, d, a),
          mutable=["diagnostics"])
      diag = aux.get("diagnostics", {}).get("path_sampler", {})
      vals = diag.get("march_oow", ())
      if not isinstance(vals, (tuple, list)):
        vals = (vals,)  # sow with reduce_fn stores the reduced value
      oow = 0
      for v in vals:
        oow = oow + v
      return oow

    total = 0
    try:
      for batch in batches:
        rays = batch["rays"]
        total += int(probe(variables, np.asarray(rays.origins),
                           np.asarray(rays.viewdirs)))
        if total:
          break  # candidate already inexact; skip its remaining chunks
    except jax.errors.JaxRuntimeError as e:
      # A candidate that fails to COMPILE (e.g. a window whose scoped-VMEM
      # footprint exceeds the Mosaic stack at this grid scale) is
      # infeasible, not fatal: record it and move down the ladder.
      print(f"march window calibration: ({window}, {refetch}) failed to "
            f"compile, skipping: {str(e).splitlines()[0][:120]}")
      results[(window, refetch)] = None
      failed_window = (window if failed_window is None
                       else min(failed_window, window))
      continue
    results[(window, refetch)] = total
    if total == 0:
      return (window, refetch), results
  # No clean candidate: fall back to the LAST compilable candidate (the
  # widest window / shortest reuse period — fewest clamps in reality).
  # Probing early-exits a candidate at its first dirty chunk, so recorded
  # totals are prefix counts and NOT comparable across candidates.
  compiled = [cand for cand, oow in results.items() if oow is not None]
  if compiled:
    return compiled[-1], results
  return candidates[-1], results
