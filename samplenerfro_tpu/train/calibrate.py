"""Auto-calibration of the tiled marcher's window size.

The tiled marcher (ops/eikonal_tiled.py) is exact only while every ray of a
tile block stays inside its block's grid window; the required window size
depends on scene geometry (grid resolution, camera field of view, how hard
the IOR field bends rays). This probe runs the path sampler over a few real
training batches for increasing window sizes and picks the smallest one
with zero out-of-window clamps, so drivers can default to "fast but exact"
without hand-tuning.
"""

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


def maybe_autocalibrate(model, variables, flags, probe_batches):
  """Resolve --march_window=0 to a measured (window, refetch).

  Returns (model, window, refetch). No-op (returns the model unchanged and
  the configured values) unless the marcher is windowed and the window is 0.
  """
  if flags.march_mode not in ("tiled", "pallas") or flags.march_window != 0:
    return model, flags.march_window, flags.march_refetch
  probe_model = model.clone(march_window=16)
  (window, refetch), oow_by_cand = calibrate_march_window(
      probe_model, variables, probe_batches)
  print(f"march window auto-calibration: {oow_by_cand} "
        f"-> window={window} refetch={refetch}")
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
    return os.environ.get("EIKVJP_IMPL", "pallas")
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
                           annealed_alpha=1.0):
  """Pick the fastest (window, refetch) with zero violations on probes.

  Args:
    model: a NerfModel configured with march_mode="tiled"/"pallas".
    variables: its variables (params + grid collections).
    batches: iterable of training batches (dicts with "rays").
    candidates: (window, refetch) pairs in descending expected speed.
    annealed_alpha: PE annealing value to probe with.

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
