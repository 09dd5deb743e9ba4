"""CPU probe: why does the production all-stage stall while parity learns?

Round-5 finding: on the synthetic exact-GT scene, the reference-parity arm
(iid + scan + fp32) gains +3.1 dB from +10k joint-refinement steps
(30.61 -> 33.73 dB, avg_loss 0.0010 -> 0.0003) while the production arm
(tile + pallas + bf16 interp + fused pallas reverse sweep) is FLAT
(30.367 -> 30.354 dB, avg_loss ~0.0013 the whole way). march_oow == 0
throughout, so window clamping is ruled out.

This probe compares so3 (path_sampler) parameter gradients of the REAL
all-stage loss (train/step.py:make_loss_fn) at the REAL configuration —
the actual 64^3 scene grid, the actual radiance checkpoint_30000 params,
w24/r8, S=768, one 16x16 training tile — across backward implementations:

  scan    : autodiff through ops/eikonal.march   (the parity arm's grads)
  stepvjp : analytic per-step adjoint reverse scan (fallback impl)
  pallas  : fused Mosaic reverse sweep, interpret mode on CPU (production)

All variants run march_interp=highest (fp32-exact forward) so the
comparison isolates the backward. bf16-interp forward noise cannot be
reproduced on CPU (CPU matmuls are fp32 at every precision setting); if
all three backends agree here, the TPU-side suspects are bf16-interp
trajectory noise and tile-batch correlation, not the reverse sweep.

Usage: python scripts/debug/probe_allstage_grad.py   (CPU, ~5-10 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["SAMPLENERFRO_FORCE_CPU"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from absl import flags
from flax.training.train_state import TrainState
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.ops.pallas import march_bwd_kernel
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io

WORK = "/tmp/snr_quality"
TRAIN_DIR = f"{WORK}/logs_tile_pallas_w0_bfloat16_interp-default"

config_lib.apply_platform_overrides()
config_lib.define_flags()
FLAGS = flags.FLAGS


def tree_cmp(name, a, b):
  la = jax.tree_util.tree_leaves_with_path(a)
  lb = dict(jax.tree_util.tree_leaves_with_path(b))
  for path, x in la:
    y = lb[path]
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    nx, ny = np.linalg.norm(x), np.linalg.norm(y)
    cos = float(x @ y / (nx * ny)) if nx > 0 and ny > 0 else float("nan")
    rel = float(np.linalg.norm(x - y) / max(nx, 1e-30))
    print(f"  {name}{jax.tree_util.keystr(path)}: |ref|={nx:.3e} "
          f"|new|={ny:.3e} cos={cos:+.6f} relL2={rel:.3e}")


def main():
  FLAGS([
      "probe",
      f"--data_dir={WORK}/scene",
      f"--train_dir={TRAIN_DIR}",
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
  np.random.seed(1234)

  cfg, gin_bindings = config_lib.load_config()
  dataset = datasets.get_dataset("train", FLAGS)
  grid, ndim, nmin, nmax = grid_io.load_ior_grid(
      FLAGS.data_dir, cfg, FLAGS.config)
  key = random.PRNGKey(0)
  model, variables = construct_nerf(key, dataset.peek(), FLAGS,
                                    ndim=ndim, nmin=nmin, nmax=nmax,
                                    grid=grid, gin_overrides=gin_bindings)
  grid_vars = {"grid": dict(variables["grid"])}

  tx, _, _ = step_lib.create_optimizer(FLAGS)
  state = TrainState.create(apply_fn=model.apply,
                            params=variables["params"], tx=tx)
  state = ckpt_lib.restore_checkpoint(
      os.path.join(TRAIN_DIR, "radiance_quality"), state)
  print(f"restored radiance checkpoint at step {int(state.step)}")
  params = state.params

  batch = next(dataset)
  extra = datasets.Grid("train", FLAGS, grid, ndim, nmax, nmin)
  batch = {**batch, **next(extra)}
  step = int(state.step) + 1
  batch["annealed_alpha"] = np.float32(
      max(step - FLAGS.anneal_delay_steps, 0)
      / (FLAGS.anneal_max_steps - FLAGS.anneal_delay_steps))
  batch["coarse_alpha_target"] = np.float32(0.0)
  batch["fine_alpha_target"] = np.float32(0.0)
  batch = jax.tree_util.tree_map(jnp.asarray, batch)
  print(f"tile batch: rays {batch['rays'].origins.shape}, "
        f"alpha {float(batch['annealed_alpha']):.3f}")

  from samplenerfro_tpu.ops import grid as grid_ops
  nrays = batch["rays"].origins.shape[0]
  spec = grid_ops.GridSpec(list(ndim), list(nmin), list(nmax))
  num_samples = FLAGS.num_coarse_samples * FLAGS.num_path_samples
  sup = march_bwd_kernel.supports(spec, num_samples, nrays,
                                  FLAGS.tile_size ** 2, FLAGS.march_window,
                                  FLAGS.march_refetch)
  print(f"pallas bwd kernel supports (S={num_samples}, rays={nrays}, "
        f"w={FLAGS.march_window}, r={FLAGS.march_refetch}): {sup}")

  k0, k1, knrm = random.split(random.PRNGKey(42), 3)

  grads = {}
  for name, kw in (
      ("scan", dict(march_mode="scan")),
      ("stepvjp", dict(march_mode="tiled", march_bwd_impl="stepvjp")),
      ("pallas", dict(march_mode="tiled", march_bwd_impl="pallas")),
  ):
    m = model.clone(**kw)
    loss_fn = step_lib.make_loss_fn(m, FLAGS)

    def scalar_loss(p, loss_fn=loss_fn):
      out = loss_fn(p, grid_vars, k0, k1, knrm, batch)
      return out[0] if isinstance(out, tuple) else out

    val, g = jax.value_and_grad(scalar_loss)(params)
    grads[name] = g
    so3 = g["path_sampler"]
    leaves = jax.tree_util.tree_leaves(so3)
    gn = float(np.sqrt(sum(float(np.sum(np.square(np.asarray(x))))
                           for x in leaves)))
    print(f"[{name}] loss={float(val):.6f} |so3 grad|={gn:.4e}")

  print("\n=== stepvjp vs scan (fwd differs tiled-vs-scan; loose) ===")
  tree_cmp("so3", grads["scan"]["path_sampler"],
           grads["stepvjp"]["path_sampler"])
  print("\n=== pallas vs stepvjp (identical tiled forward; strict) ===")
  tree_cmp("so3", grads["stepvjp"]["path_sampler"],
           grads["pallas"]["path_sampler"])
  print("\n=== pallas vs scan ===")
  tree_cmp("so3", grads["scan"]["path_sampler"],
           grads["pallas"]["path_sampler"])


if __name__ == "__main__":
  main()
