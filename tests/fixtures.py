"""Synthetic scene fixture generator for end-to-end tests.

Builds a tiny Blender-format scene (transforms_*.json + PNGs) and a
reference-schema voxelize/mesh.pkl (sphere occupancy), so e2e tests are
fully self-contained.
"""

import json
import os
import pickle

import numpy as np


def look_at_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
  """Blender/NeRF c2w: x right, y up, camera looks down -z."""
  eye = np.asarray(eye, np.float64)
  target = np.asarray(target, np.float64)
  up = np.asarray(up, np.float64)
  forward = eye - target  # -z axis points AT the target
  forward /= np.linalg.norm(forward)
  right = np.cross(up, forward)
  right /= np.linalg.norm(right)
  true_up = np.cross(forward, right)
  c2w = np.eye(4)
  c2w[:3, 0] = right
  c2w[:3, 1] = true_up
  c2w[:3, 2] = forward
  c2w[:3, 3] = eye
  return c2w


def make_scene(data_dir, num_train=3, num_val=1, num_test=1, res=24,
               radius=4.0, grid_n=16, extent=1.5, seed=0):
  """Write a synthetic scene; returns data_dir.

  Images are simple view-dependent gradients (enough for the loss to have
  signal); the proxy mesh.pkl is a sphere occupancy with IOR 1.33 inside.
  """
  from PIL import Image
  rng = np.random.RandomState(seed)
  os.makedirs(os.path.join(data_dir, "imgs"), exist_ok=True)
  os.makedirs(os.path.join(data_dir, "voxelize"), exist_ok=True)

  counts = {"train": num_train, "val": num_val, "test": num_test}
  idx = 0
  for split, count in counts.items():
    frames = []
    for _ in range(count):
      theta = rng.uniform(0, 2 * np.pi)
      phi = rng.uniform(0.2, 1.2)
      eye = radius * np.array([
          np.cos(theta) * np.cos(phi),
          np.sin(theta) * np.cos(phi),
          np.sin(phi)])
      c2w = look_at_pose(eye)
      # A smooth gradient image + alpha ring, deterministic per view.
      yy, xx = np.mgrid[0:res, 0:res] / res
      img = np.stack([
          0.5 + 0.5 * np.cos(theta) * xx,
          0.5 + 0.5 * np.sin(theta) * yy,
          0.5 * (xx + yy) / 2 + 0.25,
          np.ones_like(xx)], axis=-1)
      name = f"imgs/r_{idx}"
      Image.fromarray((img * 255).astype(np.uint8)).save(
          os.path.join(data_dir, name + ".png"))
      frames.append({"file_path": name,
                     "transform_matrix": c2w.tolist()})
      idx += 1
    meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
    with open(os.path.join(data_dir, f"transforms_{split}.json"), "w") as f:
      json.dump(meta, f)

  # Sphere occupancy grid in reference mesh.pkl schema
  # (voxelize_mesh.py:109-116).
  axes = np.linspace(-extent, extent, grid_n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  inside = (xx**2 + yy**2 + zz**2) < 1.0
  data = np.where(inside, 1.33, 1.0).reshape(-1, 1).astype(np.float64)
  with open(os.path.join(data_dir, "voxelize", "mesh.pkl"), "wb") as f:
    pickle.dump({
        "data": data,
        "extent": extent,
        "min_point": [-1, -1, -1],
        "max_point": [1, 1, 1],
        "num_voxels": grid_n,
    }, f)
  return data_dir


def write_tiny_config(cfg_dir, name="smoke"):
  """Write a tiny yaml+gin config pair for fast CPU smoke runs."""
  os.makedirs(cfg_dir, exist_ok=True)
  yaml_text = """\
dataset: blender
batching: single_image
factor: 0
batch_size: 32
num_coarse_samples: 8
num_fine_samples: 16
num_path_samples: 2
use_viewdirs: true
white_bkgd: false
use_pixel_centers: true
randomized: true
max_steps: 3
lr_delay_steps: 0
render_every: 0
save_every: 3
print_every: 1
sh_deg: -1
sh_direnc_deg: -1
sparsity_weight: 0.0
use_online_sparsity: false
extra_batch_size: 8
bg_weight: 0.025
bg_smooth_weight: 1.0
bg_patch_size: 8
anneal_delay_steps: 1
anneal_max_steps: 10
net_depth: 2
net_width: 32
net_depth_condition: 1
net_width_condition: 16
chunk: 256
"""
  gin_text = """\
VoxMLP.interp_method = 'linear3'
VoxMLP.use_direct_output = True
VoxMLP.use_residual = True
VoxMLP.annealed = True
PathSampler.normal_radius_scale = 0.1
Config.kernel_size = 3
Config.kernel_sigma = 1.0
Config.voxel_grid = 'voxelize'
NerfModel.use_mask_bbox = False
"""
  with open(os.path.join(cfg_dir, name + ".yaml"), "w") as f:
    f.write(yaml_text)
  with open(os.path.join(cfg_dir, name + ".gin"), "w") as f:
    f.write(gin_text)
  return os.path.join(cfg_dir, name)


def opencv_pose(eye, target, up=(0.0, 0.0, 1.0)):
  """OpenCV c2w: x right, y down-ish, camera looks down +z at target."""
  eye = np.asarray(eye, np.float64)
  fwd = np.asarray(target, np.float64) - eye
  fwd /= np.linalg.norm(fwd)
  up = np.asarray(up, np.float64)
  right = np.cross(fwd, up)
  right /= np.linalg.norm(right)
  true_up = np.cross(fwd, right)
  c2w = np.eye(4)
  c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, fwd, eye
  return c2w


def make_opencv_scene(data_dir, num_train=4, num_test=1, res=48,
                      radius=2.2, center=(0.0, 1.0, 0.0), ball_r=0.45):
  """Synthetic calibrated real-scene capture in the reference layout.

  Writes what a real capture session produces (README.md:119-184 flow):
  imgs/*.png + imgs/mask_*.png silhouettes, calib.json (cam_mat + frames,
  the calib_camera_with_*.py output schema), and OpenCV-format
  transforms_{train,val,test}.json. Images are an analytically shaded
  ball (center matches the reference 'ball' scene's bd_cut bbox, y in
  [0.036, 2.036]) over a view-dependent gradient; masks are exact
  ray-sphere silhouettes, so the visual hull carves a clean proxy.
  """
  from PIL import Image
  center = np.asarray(center, np.float64)
  k_mat = np.array([[60.0, 0.0, res / 2], [0.0, 60.0, res / 2],
                    [0.0, 0.0, 1.0]])
  os.makedirs(os.path.join(data_dir, "imgs"), exist_ok=True)

  counts = {"train": num_train, "val": num_test, "test": num_test}
  calib_frames = []
  idx = 0
  for split, count in counts.items():
    frames = []
    for j in range(count):
      theta = 2 * np.pi * (idx + 0.35 * (split != "train")) / num_train
      eye = center + radius * np.array([
          np.cos(theta) * 0.9, np.sin(theta) * 0.9, 0.45])
      c2w = opencv_pose(eye, center)
      # Per-pixel world rays through K^-1.
      ys, xs = np.mgrid[0:res, 0:res].astype(np.float64) + 0.5
      dirs_cam = np.stack([(xs - k_mat[0, 2]) / k_mat[0, 0],
                           (ys - k_mat[1, 2]) / k_mat[1, 1],
                           np.ones_like(xs)], axis=-1)
      dirs = dirs_cam @ c2w[:3, :3].T
      dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
      # Ray-sphere intersection for the silhouette + shading normal.
      oc = eye - center
      b = dirs @ oc
      disc = b**2 - (oc @ oc - ball_r**2)
      hit = disc > 0
      t = -b - np.sqrt(np.where(hit, disc, 0.0))
      normal = (eye + t[..., None] * dirs - center) / ball_r
      shade = np.clip(-(normal * dirs).sum(-1), 0.0, 1.0)
      bg = np.stack([0.2 + 0.6 * xs / res, 0.3 + 0.5 * ys / res,
                     np.full_like(xs, 0.4 + 0.2 * np.cos(theta))], -1)
      img = np.where(hit[..., None],
                     shade[..., None] * np.array([0.9, 0.7, 0.3]), bg)
      name = f"imgs/r_{idx}.png"
      Image.fromarray((img * 255).astype(np.uint8)).save(
          os.path.join(data_dir, name))
      Image.fromarray((hit * 255).astype(np.uint8)).save(
          os.path.join(data_dir, f"imgs/mask_r_{idx}.png"))
      frame = {"file_path": name, "transform_matrix": c2w.tolist()}
      frames.append(frame)
      if split == "train":
        # calib.json file_paths are absolute (capture-session layout).
        calib_frames.append({
            "file_path": os.path.join(data_dir, name),
            "transform_matrix": c2w.tolist()})
      idx += 1
    meta = {"cam_mat": k_mat.tolist(), "frames": frames}
    with open(os.path.join(data_dir, f"transforms_{split}.json"), "w") as f:
      json.dump(meta, f)

  with open(os.path.join(data_dir, "calib.json"), "w") as f:
    json.dump({"cam_mat": k_mat.tolist(), "frames": calib_frames}, f)
  return data_dir


def write_opencv_config(cfg_dir, name="ballcv_smoke"):
  """Tiny OpenCV-dataset config; name contains 'ball' so the reference's
  scene-substring bd_cut bbox branch (models.py:485-503) is reachable."""
  os.makedirs(cfg_dir, exist_ok=True)
  yaml_text = """\
dataset: opencv
batching: single_image
factor: 0
batch_size: 32
num_coarse_samples: 8
num_fine_samples: 16
num_path_samples: 2
use_viewdirs: true
white_bkgd: false
use_pixel_centers: true
randomized: true
near: 1.0
far: 4.0
max_steps: 3
lr_delay_steps: 0
render_every: 0
save_every: 3
print_every: 1
sh_deg: -1
sh_direnc_deg: -1
sparsity_weight: 0.0
use_online_sparsity: false
extra_batch_size: 8
bg_weight: 0.025
bg_smooth_weight: 1.0
bg_patch_size: 8
anneal_delay_steps: 1
anneal_max_steps: 10
net_depth: 2
net_width: 32
net_depth_condition: 1
net_width_condition: 16
chunk: 256
"""
  gin_text = """\
VoxMLP.interp_method = 'linear3'
VoxMLP.use_direct_output = True
VoxMLP.use_residual = True
VoxMLP.annealed = True
PathSampler.normal_radius_scale = 0.1
Config.kernel_size = 0
Config.kernel_sigma = 1.0
Config.voxel_grid = 'hull'
NerfModel.use_mask_bbox = False
NerfModel.bd_cut_dist = 6.0
"""
  with open(os.path.join(cfg_dir, name + ".yaml"), "w") as f:
    f.write(yaml_text)
  with open(os.path.join(cfg_dir, name + ".gin"), "w") as f:
    f.write(gin_text)
  return os.path.join(cfg_dir, name)
