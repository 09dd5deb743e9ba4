"""Space-carving visual hull from calibrated masks -> mesh.pkl + preview obj.

Parity with the reference calib/make_visual_hull.py: projects every voxel
center into every mask image, votes, thresholds, and writes the IOR grid
mesh.pkl (IOR = occupancy * 0.33 + 1.0, :139-146) plus a marching-cubes
preview mesh in world coordinates. Uses the in-repo iso-surface extractor
instead of PyMCubes/trimesh.
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


def to_view_matrix(mat):
  """Invert a c2w transform into a view (w2c) matrix."""
  ret = np.eye(4)
  ret[:3, :3] = mat[:3, :3].T
  ret[:3, 3] = (-mat[:3, :3].T @ mat[:3, 3:]).reshape(-1)
  return ret


def project_2d(pts, cam_mat, view_mat):
  """Project homogeneous world points [..., 4] -> (uv [..., 3], z [...])."""
  pv_mat = cam_mat @ view_mat
  uv = np.einsum("ij,nklj->nkli", pv_mat, pts)
  z = uv[..., 2]
  uv[..., :2] /= uv[..., 2:3]
  return uv, z


def unit_test_project_origin():
  """Sanity check: draw the projected world origin on each frame."""
  pts = np.array([0.0, 0.0, 0.0, 1.0]).reshape(1, 1, 1, 4)
  with open(path.join(cfg.root, "calib.json"), "r") as f:
    calib = json.load(f)
  cam_mat = np.array(calib["cam_mat"])
  p_mat = np.concatenate([cam_mat, np.zeros((3, 1))], axis=1)
  for frame_dict in calib["frames"]:
    img = cv2.imread(frame_dict["file_path"])
    v_mat = to_view_matrix(np.array(frame_dict["transform_matrix"]))
    uv, _ = project_2d(pts, p_mat, v_mat)
    uv = uv.reshape(-1, 3)
    for i in range(uv.shape[0]):
      img = cv2.circle(img, (int(uv[i, 0]), int(uv[i, 1])), radius=1,
                       thickness=20, color=(0, 0, 255))
    d, fname = path.split(frame_dict["file_path"])
    cv2.imwrite(path.join(d, "0_" + fname), img)


def create_init_bounding_box(trans_mats):
  """Carving bounds from the camera-position bounding box, padded 1.5x."""
  poses = np.array(trans_mats)[:, :3, 3]
  pose_avg = np.mean(poses, axis=0)
  max_point = np.max(poses, axis=0)
  min_point = np.min(poses, axis=0)
  side = np.max(max_point - min_point) * 1.5
  return (pose_avg + np.ones_like(pose_avg) * side * 0.5,
          pose_avg - np.ones_like(pose_avg) * side * 0.5)


def main():
  with open(path.join(cfg.root, "calib.json"), "r") as f:
    calib = json.load(f)

  cam_mat = np.array(calib["cam_mat"])
  p_mat = np.concatenate([cam_mat, np.zeros((3, 1))], axis=1)

  mask_fnames = []
  trans_mats = []
  view_mats = []
  for frame_dict in calib["frames"]:
    d, fname = path.split(frame_dict["file_path"])
    mask_fnames.append(path.join(d, "mask_" + fname[:-3] + "png"))
    trans_mats.append(np.array(frame_dict["transform_matrix"]))
    view_mats.append(to_view_matrix(np.array(frame_dict["transform_matrix"])))
  num_imgs = len(mask_fnames)

  if cfg.max_point is None or cfg.min_point is None:
    max_point, min_point = create_init_bounding_box(trans_mats)
  else:
    max_point, min_point = cfg.max_point, cfg.min_point
  n = cfg.num_voxels
  yy, xx, zz = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                           np.linspace(0, 1, n))
  x_max, y_max, z_max = max_point
  x_min, y_min, z_min = min_point
  xx = xx * (x_max - x_min) + x_min
  yy = yy * (y_max - y_min) + y_min
  zz = zz * (z_max - z_min) + z_min
  pts = np.concatenate(
      [np.stack([xx, yy, zz], axis=-1), np.ones((n, n, n, 1))], axis=-1)
  count = np.zeros((n, n, n))

  for view_mat, mask_fname in zip(view_mats, mask_fnames):
    mask_img = cv2.imread(mask_fname)[..., 0]
    uvs, _ = project_2d(pts, p_mat, view_mat)
    us = np.clip(np.round(uvs[..., 0]), 0, mask_img.shape[1] - 1).astype(int)
    vs = np.clip(np.round(uvs[..., 1]), 0, mask_img.shape[0] - 1).astype(int)
    inside = mask_img[vs.reshape(-1), us.reshape(-1)] > 0
    count += inside.reshape(n, n, n)
  count /= num_imgs

  with open(path.join(cfg.root, "mesh.pkl"), "wb") as f:
    pickle.dump({
        "data": (count > cfg.threshold).reshape(-1, 1) * 0.33 + 1.0,
        "extent": 0,
        "min_point": min_point,
        "max_point": max_point,
        "num_voxels": cfg.num_voxels,
    }, f)

  vertices, triangles = isosurface.marching_cubes(
      (count > cfg.threshold).astype(np.float64), 0.5)
  print(f"Marching cubes: {vertices.shape} vertices, "
        f"{triangles.shape} triangles")

  vertices = vertices / cfg.num_voxels
  vertices[..., 0] = vertices[..., 0] * (x_max - x_min) + x_min
  vertices[..., 1] = vertices[..., 1] * (y_max - y_min) + y_min
  vertices[..., 2] = vertices[..., 2] * (z_max - z_min) + z_min
  objio.save_obj(
      path.join(cfg.root, f"mesh_{cfg.num_voxels}_0_{cfg.threshold}.obj"),
      vertices, triangles)


if __name__ == "__main__":
  main()
