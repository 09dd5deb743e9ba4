"""CPU probe: so3 gradient signal-to-noise under tile vs iid batching.

Follow-up to probe_allstage_grad.py (which proved the fused reverse sweep
numerically exact at the real quality-scene config): the all-stage so3
gradient at the radiance checkpoint is concentrated in the Dense_out
layer (the hidden layers see ~1e-7 because the untrained output layer
W_out ~ N(0, 1e-2) is the only gradient path into them). Joint
refinement therefore starts in a small-signal phase — if per-batch
gradient NOISE dominates the batch-mean SIGNAL, Adam's second-moment
normalization shrinks the effective step and the stage stalls.

This probe estimates that SNR on CPU (fp32-exact march, scan marcher for
both arms so ONLY the batching differs): K batches per mode, so3
Dense_out gradient of the real all-stage loss, reporting
  signal = |mean_k g_k|,  noise = mean_k |g_k - mean|,  and the mean
pairwise cosine between per-batch gradients (how aligned the per-batch
directions are). Production batches are 4 tiles x 256; iid batches are
1024 iid rays of one image (the parity arm's single_image mode).

Usage: python scripts/debug/probe_so3_snr.py [--rays 512] [--k 6]
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
from flax.training.train_state import TrainState
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io

WORK = "/tmp/snr_quality"
TRAIN_DIR = f"{WORK}/logs_tile_pallas_w0_bfloat16_interp-default"

config_lib.apply_platform_overrides()
config_lib.define_flags()
FLAGS = flags.FLAGS


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--rays", type=int, default=512)
  ap.add_argument("--k", type=int, default=6)
  pargs, _ = ap.parse_known_args(sys.argv[1:])

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
      f"--batch_size={pargs.rays}",
  ])
  config_lib.update_flags(FLAGS)
  config_lib.apply_matmul_precision(FLAGS.matmul_precision)

  cfg, gin_bindings = config_lib.load_config()
  grid, ndim, nmin, nmax = grid_io.load_ior_grid(
      FLAGS.data_dir, cfg, FLAGS.config)

  np.random.seed(1234)
  tile_ds = datasets.get_dataset("train", FLAGS)
  key = random.PRNGKey(0)
  model, variables = construct_nerf(key, tile_ds.peek(), FLAGS,
                                    ndim=ndim, nmin=nmin, nmax=nmax,
                                    grid=grid, gin_overrides=gin_bindings)
  grid_vars = {"grid": dict(variables["grid"])}
  tx, _, _ = step_lib.create_optimizer(FLAGS)
  state = TrainState.create(apply_fn=model.apply,
                            params=variables["params"], tx=tx)
  state = ckpt_lib.restore_checkpoint(
      os.path.join(TRAIN_DIR, "radiance_quality"), state)
  params = state.params
  step = int(state.step) + 1
  alpha = np.float32(max(step - FLAGS.anneal_delay_steps, 0)
                     / (FLAGS.anneal_max_steps - FLAGS.anneal_delay_steps))
  extra = datasets.Grid("train", FLAGS, grid, ndim, nmax, nmin)

  # The scan marcher for BOTH arms: only the batching differs.
  m = model.clone(march_mode="scan")
  loss_fn = step_lib.make_loss_fn(m, FLAGS)
  k0, k1, knrm = random.split(random.PRNGKey(42), 3)

  @jax.jit
  def so3_grad(p, batch):
    g = jax.grad(lambda pp: loss_fn(pp, grid_vars, k0, k1, knrm, batch)[0])(p)
    return g["path_sampler"]["so3_mlp"]["Dense_out"]

  def finish(batch):
    batch = {**batch, **next(extra)}
    batch["annealed_alpha"] = alpha
    batch["coarse_alpha_target"] = np.float32(0.0)
    batch["fine_alpha_target"] = np.float32(0.0)
    return jax.tree_util.tree_map(jnp.asarray, batch)

  def collect(ds, label):
    gs = []
    for _ in range(pargs.k):
      g = so3_grad(params, finish(next(ds)))
      gs.append(np.concatenate([np.asarray(g["kernel"]).ravel(),
                                np.asarray(g["bias"]).ravel()]))
    G = np.stack(gs)  # [K, P]
    mean = G.mean(0)
    signal = float(np.linalg.norm(mean))
    noise = float(np.mean(np.linalg.norm(G - mean, axis=1)))
    cosm = []
    for i in range(len(G)):
      for j in range(i + 1, len(G)):
        cosm.append(G[i] @ G[j]
                    / (np.linalg.norm(G[i]) * np.linalg.norm(G[j])))
    print(f"[{label}] |mean|={signal:.4e} E|g-mean|={noise:.4e} "
          f"SNR={signal/noise:.3f} pairwise_cos={np.mean(cosm):+.3f}")
    return G

  print(f"batch={pargs.rays} rays, K={pargs.k}, alpha={float(alpha):.3f}")
  collect(tile_ds, "tile (production)")

  FLAGS.batching = "single_image"
  iid_ds = datasets.get_dataset("train", FLAGS)
  collect(iid_ds, "iid  (parity)")


if __name__ == "__main__":
  main()
