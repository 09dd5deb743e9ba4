"""CPU probe: did the production all-stage learn UNDER THE NOISE?

Evaluates val-view MSE/PSNR with the fp32-EXACT scan forward (the parity
arm's render path) for three parameter sets:
  prod@30000   (radiance checkpoint the all stage started from)
  prod@40000   (after +10k production all-stage steps)
  parity@40000 (after +10k parity all-stage steps)

If prod@40000 beats prod@30000 under the exact forward while its own
bf16-interp eval was flat (30.367 -> 30.354 dB), the production stage
LEARNED but the bf16-interp render noise caps what its eval can show —
the fix is then an fp32-exact (or repaired) eval render, not a training
fix. If prod@40000 == prod@30000 here too, the production all-stage
truly stalled and the forward-noise-in-TRAINING hypothesis is next.

Uses a grid of val-view tiles (CPU can't afford full 400^2 renders).

Usage: python scripts/debug/probe_ckpt_exact_loss.py [--tiles 6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["SAMPLENERFRO_FORCE_CPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from absl import flags
from flax.training import checkpoints as flax_ckpt
from flax.training.train_state import TrainState
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io

WORK = "/tmp/snr_quality"
PROD = f"{WORK}/logs_tile_pallas_w0_bfloat16_interp-default"
PARITY = f"{WORK}/logs_single_image_scan_w16"

config_lib.apply_platform_overrides()
config_lib.define_flags()
FLAGS = flags.FLAGS


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--tiles", type=int, default=6)
  pargs, _ = ap.parse_known_args(sys.argv[1:])

  FLAGS([
      "probe",
      f"--data_dir={WORK}/scene",
      f"--train_dir={PROD}",
      f"--config={WORK}/cfg_tile_pallas_w0_bfloat16_interp-default",
      f"--gin_file={WORK}/cfg_tile_pallas_w0_bfloat16_interp-default.gin",
      "--stage=all_quality",
      "--march_window=24",
      "--march_refetch=8",
      "--march_interp=highest",
      "--batch_size=256",
  ])
  config_lib.update_flags(FLAGS)
  config_lib.apply_matmul_precision(FLAGS.matmul_precision)
  np.random.seed(7)

  cfg, gin_bindings = config_lib.load_config()
  grid, ndim, nmin, nmax = grid_io.load_ior_grid(
      FLAGS.data_dir, cfg, FLAGS.config)
  train_ds = datasets.get_dataset("train", FLAGS)
  val_ds = datasets.get_dataset("val", FLAGS)
  key = random.PRNGKey(0)
  model, variables = construct_nerf(key, train_ds.peek(), FLAGS,
                                    ndim=ndim, nmin=nmin, nmax=nmax,
                                    grid=grid, gin_overrides=gin_bindings)
  grid_vars = {"grid": dict(variables["grid"])}
  m = model.clone(march_mode="scan")

  # Central val-view tiles (object region): 16x16 tiles on a grid around
  # the image center, run through the full model forward (fine output).
  case = val_ds.peek()
  rays = case["rays"]
  pixels = np.asarray(case["pixels"][..., :3])
  h, w = pixels.shape[:2]
  t = FLAGS.tile_size
  k0, k1 = random.split(random.PRNGKey(3))

  @jax.jit
  def render_tile(params, o, d, radii):
    Rays = type(rays)
    r = Rays(origins=o, directions=d, viewdirs=d / jnp.linalg.norm(
        d, axis=-1, keepdims=True), radii=radii)
    (ret, _), _ = m.apply({"params": params, **grid_vars}, k0, k1, r,
                          False, jnp.float32(1.255),
                          mutable=["diagnostics"])
    return ret[-1][0]

  # Build tile list around the center.
  n_side = int(np.ceil(np.sqrt(pargs.tiles)))
  y0, x0 = h // 2 - (n_side * t) // 2, w // 2 - (n_side * t) // 2
  tiles = []
  for i in range(pargs.tiles):
    yy, xx = y0 + (i // n_side) * t, x0 + (i % n_side) * t
    tiles.append((yy, xx))

  def eval_params(label, params):
    ses, n = 0.0, 0
    for yy, xx in tiles:
      sl = np.s_[yy:yy + t, xx:xx + t]
      o = jnp.asarray(np.asarray(rays.origins[sl]).reshape(-1, 3))
      d = jnp.asarray(np.asarray(rays.directions[sl]).reshape(-1, 3))
      radii = jnp.asarray(np.asarray(rays.radii[sl]).reshape(-1, 1))
      rgb = np.asarray(render_tile(params, o, d, radii))
      gt = pixels[sl].reshape(-1, 3)
      ses += float(np.sum((rgb - gt) ** 2))
      n += gt.size
    mse = ses / n
    print(f"[{label}] exact-forward val-tile MSE={mse:.6f} "
          f"PSNR={-10 * np.log10(mse):.3f} dB")

  for label, d_, s_ in (("prod@30000", PROD, 30000),
                        ("prod@40000", PROD, 40000),
                        ("parity@30000", PARITY, 30000),
                        ("parity@40000", PARITY, 40000)):
    ck = flax_ckpt.restore_checkpoint(f"{d_}/all_quality", None, step=s_)
    eval_params(label, jax.tree_util.tree_map(jnp.asarray, ck["params"]))


if __name__ == "__main__":
  main()
