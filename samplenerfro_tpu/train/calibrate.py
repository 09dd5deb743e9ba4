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
