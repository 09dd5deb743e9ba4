"""Synthetic refractive-scene generator with exact eikonal ground truth.

Renders a Blender-format dataset of a transparent refractive blob in front
of a procedural emissive environment: ground-truth pixels are computed by
marching the SAME eikonal ODE the model uses (ops/eikonal.march) through a
known IOR grid and shading the exit direction with an analytic envmap.
Because the model family contains this scene exactly (zero density +
background MLP + the given proxy grid), it provides a controlled
end-to-end quality benchmark with no external data: a correctly-working
trainer should reach high PSNR, and sampling-strategy variants (iid pixels
vs tile batching) can be compared apples-to-apples.

Outputs the reference data layout: imgs/r_*.png, transforms_{split}.json,
voxelize/mesh.pkl (reference schema).
"""

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.data import rays as rays_lib
from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import grid as grid_ops


def envmap(dirs):
  """Smooth analytic emissive environment (unit dirs -> rgb in [0, 1])."""
  x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
  r = 0.5 + 0.35 * jnp.sin(3.0 * x + 1.0) * jnp.cos(2.0 * y)
  g = 0.5 + 0.35 * jnp.sin(2.0 * y + 2.0) * jnp.cos(3.0 * z)
  b = 0.5 + 0.35 * jnp.sin(4.0 * z + 0.5) * jnp.cos(2.0 * x)
  return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def blob_ior_grid(grid_n=64, extent=1.5, peak=0.33, sigma2=0.25):
  """Smooth Gaussian IOR blob on the reference mesh.pkl lattice."""
  axes = np.linspace(-extent, extent, grid_n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vals = 1.0 + peak * np.exp(-(xx**2 + yy**2 + zz**2) / sigma2)
  return vals.reshape(-1, 1).astype(np.float32)


def render_gt(spec, grid_values, origins, viewdirs, near, far,
              num_samples, chunk=65536):
  """March the exact eikonal paths and shade exit dirs with the envmap."""
  grad = np.asarray(grid_ops.central_difference_grad(
      spec, jnp.asarray(grid_values)))
  data = jnp.asarray(np.concatenate([grid_values, grad], axis=-1))
  h = (far - near) / (num_samples - 1)

  @jax.jit
  def shade(o, d):
    _, dirs, _, _, _ = eik_ops.march(spec, data, o, d, near, h, num_samples,
                                     unroll=8)
    return envmap(dirs[:, -1])

  out = []
  flat_o = origins.reshape(-1, 3)
  flat_d = viewdirs.reshape(-1, 3)
  n = flat_o.shape[0]
  for i in range(0, n, chunk):
    o = flat_o[i:i + chunk]
    d = flat_d[i:i + chunk]
    pad = 0
    if o.shape[0] < chunk and n > chunk:
      pad = chunk - o.shape[0]
      o = np.pad(o, ((0, pad), (0, 0)), mode="edge")
      d = np.pad(d, ((0, pad), (0, 0)), mode="edge")
    rgb = np.asarray(shade(jnp.asarray(o), jnp.asarray(d)))
    out.append(rgb[:rgb.shape[0] - pad] if pad else rgb)
  return np.concatenate(out, axis=0).reshape(origins.shape)


def make_scene(out_dir, n_train=16, n_val=2, n_test=2, res=128, grid_n=64,
               extent=1.5, near=2.0, far=6.0, radius=4.0, num_samples=768,
               camera_angle_x=0.6911112070083618, seed=0):
  """Generate the dataset; returns out_dir."""
  from PIL import Image
  rng = np.random.RandomState(seed)
  os.makedirs(os.path.join(out_dir, "imgs"), exist_ok=True)
  os.makedirs(os.path.join(out_dir, "voxelize"), exist_ok=True)

  grid_values = blob_ior_grid(grid_n, extent)
  spec = grid_ops.GridSpec([grid_n] * 3, [-extent] * 3, [extent] * 3)
  with open(os.path.join(out_dir, "voxelize", "mesh.pkl"), "wb") as f:
    pickle.dump({
        "data": grid_values.astype(np.float64),
        "extent": extent,
        "min_point": [-1, -1, -1],
        "max_point": [1, 1, 1],
        "num_voxels": grid_n,
    }, f)

  counts = {"train": n_train, "val": n_val, "test": n_test}
  idx = 0
  for split, count in counts.items():
    frames = []
    for _ in range(count):
      theta = rng.uniform(0, 2 * np.pi)
      phi = rng.uniform(-0.9, 0.9)
      eye = radius * np.array([
          np.cos(theta) * np.cos(phi),
          np.sin(theta) * np.cos(phi),
          np.sin(phi)])
      # Blender convention look-at: camera -z axis points at the origin.
      fwd = eye / np.linalg.norm(eye)  # +z away from target
      up = np.array([0.0, 0.0, 1.0])
      if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
      right = np.cross(up, fwd)
      right /= np.linalg.norm(right)
      true_up = np.cross(fwd, right)
      c2w = np.eye(4)
      c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
          right, true_up, fwd, eye)

      scene_rays = rays_lib.generate_pinhole_rays(
          res, res, 0.5 * res / np.tan(0.5 * camera_angle_x),
          c2w[None], use_pixel_centers=True)
      rgb = render_gt(spec, grid_values, scene_rays.origins[0],
                      scene_rays.viewdirs[0], near, far, num_samples)
      rgba = np.concatenate(
          [rgb, np.ones_like(rgb[..., :1])], axis=-1)
      name = f"imgs/r_{idx}"
      Image.fromarray((np.clip(rgba, 0, 1) * 255).astype(np.uint8)).save(
          os.path.join(out_dir, name + ".png"))
      frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
      idx += 1
    with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
      json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
  return out_dir
