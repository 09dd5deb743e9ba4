"""Voxelize a proxy mesh into the IOR grid (mesh.pkl).

CLI parity with the reference voxelize_mesh.py: same flags
(--num_samples --num_voxels --extent --min_point --max_point --threshold,
voxelize_mesh.py:22-27), same mesh.pkl schema {data, extent, min_point,
max_point, num_voxels} (:109-116), same preview obj naming (:135).

Implementation: the per-voxel python loop over pysdf queries (:101-107) is
replaced by batched containment queries against the native BVH core
(samplenerfro_tpu/native/sdfcore.cpp) — the whole supersampled grid is
evaluated in a few vectorized calls.
"""

import os
import pickle

import numpy as np
from absl import app, flags
from jax import config as jax_config

from samplenerfro_tpu.tools import isosurface, objio
from samplenerfro_tpu.tools import sdf as sdflib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import io as io_lib

FLAGS = flags.FLAGS

config_lib.apply_platform_overrides()
config_lib.define_flags()
flags.DEFINE_integer("num_samples", 4, "sampling resolution of voxelization")
flags.DEFINE_integer("num_voxels", 128, "resolution of voxel grid")
flags.DEFINE_float("extent", 3, "extent of voxel grid")
flags.DEFINE_multi_float("min_point", [-1, -1, -1],
                         "minimum point of voxel grid")
flags.DEFINE_multi_float("max_point", [1, 1, 1], "maximum point of voxel grid")
flags.DEFINE_float("threshold", 1.0, "threshold of isosurface")
jax_config.parse_flags_with_absl()


def main(unused_argv):
  np.random.seed(20201473)

  if FLAGS.config is not None:
    config_lib.update_flags(FLAGS)
  if FLAGS.data_dir is None:
    raise ValueError("data_dir must be set. None set now.")

  out_dir = os.path.join(FLAGS.data_dir, "voxelize")
  if not io_lib.isdir(out_dir):
    io_lib.makedirs(out_dir)

  mesh = objio.load(os.path.join(FLAGS.data_dir, "mesh.obj"))
  intersector = sdflib.SDF(mesh.vertices, mesh.faces)

  # Supersample offsets: num_samples^3 regular lattice in [-1, 1]^3 per
  # voxel (voxelize_mesh.py:72-78; the jittered-noise variant is commented
  # out there as well).
  ns = FLAGS.num_samples
  yy, xx, zz = np.meshgrid(np.linspace(-1, 1, ns), np.linspace(-1, 1, ns),
                           np.linspace(-1, 1, ns))
  offset = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

  nv = FLAGS.num_voxels
  yy, xx, zz = np.meshgrid(np.linspace(0, 1, nv), np.linspace(0, 1, nv),
                           np.linspace(0, 1, nv))
  if FLAGS.extent > 0:
    x_max = y_max = z_max = FLAGS.extent
    x_min = y_min = z_min = -FLAGS.extent
  else:
    x_max, y_max, z_max = FLAGS.max_point
    x_min, y_min, z_min = FLAGS.min_point
  offset_scale = (2 * np.array([x_max - x_min, y_max - y_min,
                                z_max - z_min])[None]) / (nv - 1) * 0.5
  xx = xx * (x_max - x_min) + x_min
  yy = yy * (y_max - y_min) + y_min
  zz = zz * (z_max - z_min) + z_min
  grid = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

  # Mean IOR per voxel over the supersample lattice: inside -> 1.33,
  # outside -> 1.0 (voxelize_mesh.py:57-66,99-107), evaluated in batches.
  scaled_offsets = (offset * offset_scale).astype(np.float32)  # [S, 3]
  out = np.zeros((grid.shape[0], 1))
  chunk = max(1, (1 << 22) // scaled_offsets.shape[0])
  for i in range(0, grid.shape[0], chunk):
    centers = grid[i:i + chunk].astype(np.float32)  # [C, 3]
    samples = (centers[:, None, :] + scaled_offsets[None, :, :]).reshape(-1, 3)
    inside = intersector.contains(samples).reshape(len(centers), -1)
    ior = np.where(inside, 1.33, 1.0)
    out[i:i + chunk, 0] = ior.mean(axis=1)

  with open(os.path.join(out_dir, "mesh.pkl"), "wb") as f:
    pickle.dump({
        "data": out,
        "extent": FLAGS.extent,
        "min_point": FLAGS.min_point,
        "max_point": FLAGS.max_point,
        "num_voxels": FLAGS.num_voxels,
    }, f)

  sigma = out.reshape(nv, nv, nv)
  threshold = FLAGS.threshold
  print("fraction occupied", np.mean(sigma > threshold))
  vertices, triangles = isosurface.marching_cubes(sigma, threshold)
  print("done", vertices.shape, triangles.shape)

  preview = objio.Trimesh(vertices / nv - 0.5, triangles)
  preview.export(os.path.join(
      out_dir,
      f"mesh_{FLAGS.num_samples}_{FLAGS.num_voxels}_{FLAGS.extent}_"
      f"{FLAGS.threshold}.obj"))


if __name__ == "__main__":
  app.run(main)
