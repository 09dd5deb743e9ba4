"""Space-carving visual hull from calibrated masks -> mesh.pkl + preview obj.

Output parity with the reference calib/make_visual_hull.py (same mesh.pkl
schema; IOR = occupancy * 0.33 + 1.0, ref :139-146), different structure:
all views are projected in one batched einsum over voxel chunks instead of
a per-view python loop, masks are preloaded as a single boolean stack, and
the iso-surface preview uses the in-repo extractor instead of
PyMCubes/trimesh.
"""

import json
import pickle
from os import path

import cv2
import numpy as np

import cfg

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from samplenerfro_tpu.tools import isosurface, objio  # noqa: E402

# Voxels per projection chunk: bounds peak memory at
# CHUNK * num_views * 3 floats (~0.6 GB for 64 views).
CHUNK = 2**20


def to_view_matrix(mat):
  """Invert a c2w transform into a view (w2c) matrix."""
  ret = np.eye(4)
  ret[:3, :3] = mat[:3, :3].T
  ret[:3, 3] = (-mat[:3, :3].T @ mat[:3, 3:]).reshape(-1)
  return ret


def load_calibration(root):
  """calib.json -> (projection mats [V, 3, 4], mask filenames, c2w mats)."""
  with open(path.join(root, "calib.json"), "r") as f:
    calib = json.load(f)
  p_mat = np.concatenate([np.array(calib["cam_mat"]), np.zeros((3, 1))],
                         axis=1)
  proj_mats, mask_fnames, trans_mats = [], [], []
  for frame_dict in calib["frames"]:
    d, fname = path.split(frame_dict["file_path"])
    mask_fnames.append(path.join(d, "mask_" + fname[:-3] + "png"))
    c2w = np.array(frame_dict["transform_matrix"])
    trans_mats.append(c2w)
    proj_mats.append(p_mat @ to_view_matrix(c2w))
  return np.stack(proj_mats), mask_fnames, trans_mats


def carving_bounds(trans_mats):
  """Default carving box: camera-position bounding box, padded 1.5x."""
  poses = np.array(trans_mats)[:, :3, 3]
  center = np.mean(poses, axis=0)
  side = np.max(np.max(poses, axis=0) - np.min(poses, axis=0)) * 1.5
  return center + side * 0.5, center - side * 0.5


def voxel_centers(n, min_point, max_point):
  """[n, n, n, 3] world-space voxel centers, index order (x, y, z)."""
  axes = [np.linspace(lo, hi, n) for lo, hi in zip(min_point, max_point)]
  xs, ys, zs = np.meshgrid(*axes, indexing="ij")
  return np.stack([xs, ys, zs], axis=-1)


def carve_occupancy(pts, proj_mats, masks, chunk=CHUNK):
  """Per-voxel fraction of views whose mask covers the projected center.

  Args:
    pts: [..., 3] world points.
    proj_mats: [V, 3, 4] camera projections (K @ w2c).
    masks: [V, H, W] boolean silhouettes (all frames same resolution).

  Returns:
    [...] float array in [0, 1] (mean vote over views).
  """
  num_views, h, w = masks.shape
  flat = pts.reshape(-1, 3)
  votes = np.empty(flat.shape[0], np.float64)
  view_idx = np.arange(num_views)[:, None]
  for lo in range(0, flat.shape[0], chunk):
    p = flat[lo:lo + chunk]
    p_h = np.concatenate([p, np.ones((p.shape[0], 1))], axis=-1)
    uvw = np.einsum("vij,nj->vni", proj_mats, p_h)
    uv = uvw[..., :2] / uvw[..., 2:3]
    us = np.clip(np.round(uv[..., 0]), 0, w - 1).astype(np.int64)
    vs = np.clip(np.round(uv[..., 1]), 0, h - 1).astype(np.int64)
    votes[lo:lo + chunk] = masks[view_idx, vs, us].mean(axis=0)
  return votes.reshape(pts.shape[:-1])


def unit_test_project_origin():
  """Sanity check: draw the projected world origin on each frame."""
  with open(path.join(cfg.root, "calib.json"), "r") as f:
    calib = json.load(f)
  proj_mats, _, _ = load_calibration(cfg.root)
  origin = np.array([0.0, 0.0, 0.0, 1.0])
  for proj, frame_dict in zip(proj_mats, calib["frames"]):
    img = cv2.imread(frame_dict["file_path"])
    uvw = proj @ origin
    uv = (uvw[:2] / uvw[2]).astype(int)
    img = cv2.circle(img, (uv[0], uv[1]), radius=1, thickness=20,
                     color=(0, 0, 255))
    d, fname = path.split(frame_dict["file_path"])
    cv2.imwrite(path.join(d, "0_" + fname), img)


def main():
  proj_mats, mask_fnames, trans_mats = load_calibration(cfg.root)
  masks = np.stack([cv2.imread(f)[..., 0] > 0 for f in mask_fnames])

  if cfg.max_point is None or cfg.min_point is None:
    max_point, min_point = carving_bounds(trans_mats)
  else:
    max_point, min_point = cfg.max_point, cfg.min_point

  n = cfg.num_voxels
  pts = voxel_centers(n, min_point, max_point)
  occupancy = carve_occupancy(pts, proj_mats, masks) > cfg.threshold

  with open(path.join(cfg.root, "mesh.pkl"), "wb") as f:
    pickle.dump({
        "data": occupancy.reshape(-1, 1) * 0.33 + 1.0,
        "extent": 0,
        "min_point": min_point,
        "max_point": max_point,
        "num_voxels": cfg.num_voxels,
    }, f)

  vertices, triangles = isosurface.marching_cubes(
      occupancy.astype(np.float64), 0.5)
  print(f"Marching cubes: {vertices.shape} vertices, "
        f"{triangles.shape} triangles")

  span = np.asarray(max_point, np.float64) - np.asarray(min_point, np.float64)
  vertices = vertices / cfg.num_voxels * span + np.asarray(min_point)
  objio.save_obj(
      path.join(cfg.root, f"mesh_{cfg.num_voxels}_0_{cfg.threshold}.obj"),
      vertices, triangles)


if __name__ == "__main__":
  main()
