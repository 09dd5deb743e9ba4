"""mesh.pkl IOR-grid loading, rescaling, and prefiltering.

Behavioral parity targets (reference SampleNeRFRO):
  - mesh.pkl schema {data, extent, min_point, max_point, num_voxels}:
    voxelize_mesh.py:109-116
  - bounds selection from extent vs min/max point: train.py:211-217
  - scene-name-substring IOR rescale (data-1)*k/0.33+1 with k=0.33 or 0.5:
    train.py:220-225, eval.py:80-85
  - Gaussian prefilter via Config.kernel_size/kernel_sigma
"""

import pickle
from os import path

import numpy as np

from samplenerfro_tpu.ops import grid as grid_ops

# Scene-name substrings that select refractive_index = 0.33 (train.py:220).
_K033_SUBSTRINGS = ("glass", "wineglass", "pen", "torus_skydome-bkgd_cycles",
                    "dolphin", "lighthouse", "yellow")


def refractive_rescale_factor(config_name):
  """The k in (data-1)*k/0.33+1, selected by scene-name substring."""
  name = config_name or ""
  return 0.33 if any(s in name for s in _K033_SUBSTRINGS) else 0.5


def load_mesh_pkl(data_dir, voxel_grid_dir):
  """Load mesh.pkl -> (data [N^3,1], ndim, nmin, nmax)."""
  with open(path.join(data_dir, voxel_grid_dir, "mesh.pkl"), "rb") as f:
    mesh_dict = pickle.load(f)
  if mesh_dict["extent"] > 0:
    e = mesh_dict["extent"]
    nmin, nmax = [-e, -e, -e], [e, e, e]
  else:
    nmin = list(mesh_dict["min_point"])
    nmax = list(mesh_dict["max_point"])
  n = mesh_dict["num_voxels"]
  ndim = [n, n, n]
  data = np.asarray(mesh_dict["data"], np.float32).reshape(-1, 1)
  return data, ndim, nmin, nmax


def load_ior_grid(data_dir, cfg, config_name):
  """Full pipeline: load + rescale + optional Gaussian prefilter.

  Returns (grid [N^3, 1] np.float32, ndim, nmin, nmax).
  """
  data, ndim, nmin, nmax = load_mesh_pkl(data_dir, cfg.voxel_grid)
  k = refractive_rescale_factor(config_name)
  rescaled = (data - 1.0) * k / 0.33 + 1.0
  if cfg.kernel_size > 0:
    grid = np.asarray(grid_ops.gaussian_prefilter(
        rescaled, tuple(ndim), cfg.kernel_size, cfg.kernel_sigma))
  else:
    grid = rescaled
  return grid.astype(np.float32), ndim, nmin, nmax
