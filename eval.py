"""Evaluation CLI: renders the test split, computes PSNR/SSIM, saves outputs.

Invocation surface matches the reference (eval.py, eval_nerf.sh): same
flags, checkpoint-watching loop, per-stage checkpoint surgery, and output
files (test_preds/NNN.png, disp_NNN.png, vis suite, psnrs_<step>.txt,
psnr.txt, ssim.txt).
"""

import functools
import time
from os import path

import jax
import numpy as np
from absl import app, flags
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.parallel import mesh as mesh_lib
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io
from samplenerfro_tpu.utils import io as io_lib
from samplenerfro_tpu.utils import metrics
from samplenerfro_tpu.utils import render as render_lib
from samplenerfro_tpu.utils import vis

FLAGS = flags.FLAGS

config_lib.apply_platform_overrides()
config_lib.maybe_initialize_distributed()
config_lib.define_flags()


def main(unused_argv):
  rng = random.PRNGKey(20200823)

  cfg, gin_bindings = config_lib.load_config()
  if FLAGS.config is not None:
    config_lib.update_flags(FLAGS)
  config_lib.apply_matmul_precision(FLAGS.matmul_precision)
  config_lib.resolve_mosaic(FLAGS)
  if FLAGS.train_dir is None:
    raise ValueError("train_dir must be set. None set now.")
  if FLAGS.data_dir is None:
    raise ValueError("data_dir must be set. None set now.")

  dataset = datasets.get_dataset("test", FLAGS)
  rng, key = random.split(rng)

  grid, ndim, nmin, nmax = grid_io.load_ior_grid(
      FLAGS.data_dir, cfg, FLAGS.config)
  model, variables = construct_nerf(key, dataset.peek(), FLAGS,
                                    ndim=ndim, nmin=nmin, nmax=nmax,
                                    grid=grid, gin_overrides=gin_bindings)
  print(io_lib.pretty_repr(variables))

  if FLAGS.march_mode in ("tiled", "pallas") and FLAGS.march_window == 0:
    from samplenerfro_tpu.train import calibrate
    calib_path = path.join(FLAGS.train_dir, "march_calib.json")
    io_lib.makedirs(FLAGS.train_dir)
    model, FLAGS.march_window, FLAGS.march_refetch = calibrate.maybe_autocalibrate(
        model, variables, FLAGS,
        calibrate.probe_batches_from_view(
            dataset.peek()["rays"], FLAGS.tile_size, FLAGS.batch_size),
        cache_paths=(calib_path,), store_path=calib_path,
        grid_tag=calibrate.grid_content_tag(grid), probe_kind="view")

  mesh = mesh_lib.make_mesh()
  grid_vars = {"grid": mesh_lib.replicate(dict(variables["grid"]), mesh)}
  render_fn = step_lib.make_render_fn(model, FLAGS, grid_vars, mesh=mesh)
  render_multi_fn = (
      step_lib.make_render_fn_multi(model, FLAGS, grid_vars, mesh=mesh)
      if FLAGS.render_chunks_per_dispatch > 1 else None)
  # Clamp-free repair ladder: chunks whose ray bundles outdrift the
  # calibrated window re-render through the wide-tiled -> scan ladder
  # (train/step.py make_repair_fns), so eval outputs are always exact.
  repair_fns = step_lib.make_repair_fns(model, FLAGS, grid_vars, mesh=mesh)

  ssim_fn = jax.jit(
      functools.partial(metrics.compute_ssim, max_val=1.0), backend="cpu")

  FLAGS.stage_dir = path.join(FLAGS.train_dir, FLAGS.stage)
  last_step = 0
  if not FLAGS.eval_train:
    out_dir = path.join(FLAGS.stage_dir,
                        "path_renders" if FLAGS.render_path else "test_preds")
  else:
    out_dir = path.join(FLAGS.stage_dir, "train_preds")
  summary_writer = None
  if not FLAGS.eval_once:
    from flax.metrics import tensorboard
    summary_writer = tensorboard.SummaryWriter(
        path.join(FLAGS.stage_dir, "eval"))

  while True:
    variables, step = ckpt_lib.load_stage_variables(
        variables, FLAGS.train_dir, cfg, FLAGS.stage, FLAGS.num_fine_samples)
    print(io_lib.pretty_repr(variables))

    if step <= last_step:
      time.sleep(10)
      continue
    if FLAGS.save_output and (not io_lib.isdir(out_dir)):
      io_lib.makedirs(out_dir)
    psnr_values = []
    ssim_values = []
    showcase_index = None
    if not FLAGS.eval_once:
      showcase_index = np.random.randint(0, dataset.size)
    params = mesh_lib.replicate(dict(variables["params"]), mesh)
    for idx in range(dataset.size):
      print(f"Evaluating {idx+1}/{dataset.size}")
      batch = next(dataset)
      pred_color, pred_disp, pred_acc = render_lib.render_image(
          functools.partial(render_fn, params),
          batch["rays"], rng, FLAGS.dataset == "llff",
          chunk=FLAGS.chunk, mesh=mesh,
          tile=(FLAGS.tile_size
                if FLAGS.march_mode in ("tiled", "pallas") else 0),
          chunks_per_dispatch=FLAGS.render_chunks_per_dispatch,
          render_multi_fn=(functools.partial(render_multi_fn, params)
                           if render_multi_fn is not None else None),
          render_exact_fn=(
              [functools.partial(f, params) for f in repair_fns]
              if repair_fns is not None else None))
      vis_suite = vis.visualize_suite(pred_disp[..., 0], pred_acc[..., 0])

      if jax.process_index() != 0:
        continue
      if (not FLAGS.eval_once) and idx == showcase_index:
        showcase_color = pred_color
        showcase_disp = pred_disp
        showcase_acc = pred_acc
        if not FLAGS.render_path:
          showcase_gt = batch["pixels"]
      if not FLAGS.render_path:
        psnr = metrics.compute_psnr(((pred_color - batch["pixels"])**2).mean())
        ssim = ssim_fn(pred_color, batch["pixels"])
        print(f"PSNR = {psnr:.4f}, SSIM = {ssim:.4f}")
        psnr_values.append(float(psnr))
        ssim_values.append(float(ssim))
      if FLAGS.save_output:
        io_lib.save_img(pred_color, path.join(out_dir, f"{idx:03d}.png"))
        io_lib.save_img(pred_disp[..., 0],
                        path.join(out_dir, f"disp_{idx:03d}.png"))
        for k, v in vis_suite.items():
          io_lib.save_img(v, path.join(out_dir, k + f"_{idx:03d}.png"))
    if (not FLAGS.eval_once) and (jax.process_index() == 0):
      summary_writer.image("pred_color", showcase_color, step)
      summary_writer.image("pred_disp", showcase_disp, step)
      summary_writer.image("pred_acc", showcase_acc, step)
      if not FLAGS.render_path:
        summary_writer.scalar("psnr", np.mean(np.array(psnr_values)), step)
        summary_writer.scalar("ssim", np.mean(np.array(ssim_values)), step)
        summary_writer.image("target", showcase_gt, step)
    if FLAGS.save_output and (not FLAGS.render_path) and (
        jax.process_index() == 0):
      with open(path.join(out_dir, f"psnrs_{step}.txt"), "w") as f:
        f.write(" ".join([str(v) for v in psnr_values]))
      with open(path.join(out_dir, f"ssims_{step}.txt"), "w") as f:
        f.write(" ".join([str(v) for v in ssim_values]))
      with open(path.join(out_dir, "psnr.txt"), "w") as f:
        f.write("{}".format(np.mean(np.array(psnr_values))))
      with open(path.join(out_dir, "ssim.txt"), "w") as f:
        f.write("{}".format(np.mean(np.array(ssim_values))))
    if FLAGS.eval_once:
      break
    if int(step) >= FLAGS.max_steps:
      break
    last_step = step


if __name__ == "__main__":
  app.run(main)
