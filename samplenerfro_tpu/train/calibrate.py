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
  """Tile-reordered probe rays from one [H, W] camera view.

  Renders reorder pixels into tile blocks (utils/render.py), so window
  calibration for eval/extract probes the same ordering: the view's rays
  permuted into tiles, truncated to a whole number of blocks capped at
  batch_size rays.
  """
  from samplenerfro_tpu.ops import eikonal_tiled
  h, w = rays.origins.shape[:2]
  perm, _ = eikonal_tiled.tile_order(h, w, tile_size)
  flat = jax.tree_util.tree_map(
      lambda x: np.asarray(x).reshape(h * w, -1)[perm], rays)
  block = tile_size**2
  nprobe = min(batch_size, (h * w // block) * block)
  return [{"rays": jax.tree_util.tree_map(lambda x: x[:nprobe], flat)}]


def maybe_autocalibrate(model, variables, flags, probe_batches):
  """Resolve --march_window=0 to a measured window; returns (model, window).

  No-op (returns the model unchanged and the configured window) unless the
  marcher is windowed and the window is 0.
  """
  if flags.march_mode not in ("tiled", "pallas") or flags.march_window != 0:
    return model, flags.march_window
  probe_model = model.clone(march_window=16)
  window, oow_by_window = calibrate_march_window(probe_model, variables,
                                                 probe_batches)
  print(f"march window auto-calibration: {oow_by_window} -> {window}")
  return model.clone(march_window=window), window


def calibrate_march_window(model, variables, batches,
                           candidates=(8, 10, 12, 16, 20, 24),
                           annealed_alpha=1.0):
  """Pick the smallest window with zero violations on probe batches.

  Args:
    model: a NerfModel configured with march_mode="tiled".
    variables: its variables (params + grid collections).
    batches: iterable of training batches (dicts with "rays").
    candidates: ascending window sizes to try.
    annealed_alpha: PE annealing value to probe with.

  Returns:
    (window, per_candidate_oow dict). Falls back to the largest candidate
    (with its violation count) if none is clean.
  """
  batches = list(batches)
  results = {}
  for window in candidates:
    probe_model = model.clone(march_window=window)

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
    for batch in batches:
      rays = batch["rays"]
      total += int(probe(variables, np.asarray(rays.origins),
                         np.asarray(rays.viewdirs)))
    results[window] = total
    if total == 0:
      return window, results
  return candidates[-1], results
