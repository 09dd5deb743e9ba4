"""Generate the vendored example_data/ smoke scene (run once, committed).

Reference parity target: /root/reference/example_data — a 1-frame Blender
scene (800x800 RGBA pngs under imgs/, transforms_{train,val}.json, a proxy
mesh + voxelize output) paired with configs/example.{yaml,gin} so the
documented first-run path executes from a fresh checkout:

  python voxelize_mesh.py --data_dir=example_data --num_samples=4 \
      --num_voxels=128 --extent=1.5 --threshold=1.165
  python train.py --data_dir=example_data --train_dir=/tmp/example_logs \
      --config=configs/example --gin_file=configs/example.gin \
      --stage=radiance --max_steps=2000

Nothing is copied from the reference: the scene is synthesized here — a
unit glass sphere (IOR 1.33) refracting a direction-parameterized sky
gradient, raytraced analytically per view, plus an icosphere mesh.obj for
the voxelizer. Views are 3D-consistent (background depends only on ray
direction, the sphere refracts it), so the scene is genuinely learnable.
We additionally ship transforms_test.json (the reference ships only
train/val, which its own eval.py test split cannot read).
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from samplenerfro_tpu.tools import objio  # noqa: E402
from tests.fixtures import look_at_pose  # noqa: E402

RES = 800
CAMERA_ANGLE_X = 0.6911112070083618
RADIUS = 4.0
SPHERE_R = 1.0
IOR = 1.33


def icosphere(subdiv=3, radius=1.0):
  """Icosahedron subdivided `subdiv` times, projected to the sphere."""
  t = (1.0 + np.sqrt(5.0)) / 2.0
  verts = np.array([
      [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
      [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
      [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
  faces = np.array([
      [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
      [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
      [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
      [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
  verts /= np.linalg.norm(verts, axis=1, keepdims=True)
  for _ in range(subdiv):
    cache = {}
    new_faces = []
    vlist = list(verts)

    def midpoint(a, b):
      key = (min(a, b), max(a, b))
      if key not in cache:
        m = vlist[a] + vlist[b]
        m /= np.linalg.norm(m)
        cache[key] = len(vlist)
        vlist.append(m)
      return cache[key]

    for f in faces:
      a, b, c = int(f[0]), int(f[1]), int(f[2])
      ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
      new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    verts = np.asarray(vlist)
    faces = np.asarray(new_faces, np.int64)
  return verts * radius, faces


def sky(d):
  """Direction-parameterized environment: smooth multiview-consistent RGB."""
  dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
  r = 0.55 + 0.35 * dz + 0.10 * np.sin(3.0 * dx)
  g = 0.45 + 0.25 * np.sin(2.0 * dx + 1.0) + 0.20 * dz
  b = 0.60 + 0.30 * np.cos(2.0 * dy) + 0.10 * dz
  return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def refract(d, n, eta):
  """Snell refraction of unit dirs d at unit normals n (eta = n1/n2)."""
  cosi = -np.sum(d * n, axis=-1, keepdims=True)
  k = 1.0 - eta**2 * (1.0 - cosi**2)
  tir = k < 0.0
  t = eta * d + (eta * cosi - np.sqrt(np.maximum(k, 0.0))) * n
  refl = d + 2.0 * cosi * n
  return np.where(tir, refl, t), tir.squeeze(-1)


def render(c2w):
  """Analytic raytrace: glass sphere over the sky gradient."""
  j, i = np.mgrid[0:RES, 0:RES].astype(np.float64) + 0.5
  focal = 0.5 * RES / np.tan(0.5 * CAMERA_ANGLE_X)
  dirs = np.stack([(i - RES * 0.5) / focal, -(j - RES * 0.5) / focal,
                   -np.ones_like(i)], axis=-1)
  d = dirs @ c2w[:3, :3].T
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(c2w[:3, 3], d.shape)

  # Sphere |o + t d| = SPHERE_R.
  b = np.sum(o * d, axis=-1)
  c = np.sum(o * o, axis=-1) - SPHERE_R**2
  disc = b * b - c
  hit = disc > 0.0
  t0 = -b - np.sqrt(np.maximum(disc, 0.0))
  hit &= t0 > 0.0

  img = sky(d)
  if hit.any():
    p1 = o[hit] + t0[hit, None] * d[hit]
    n1 = p1 / SPHERE_R
    d1, _ = refract(d[hit], n1, 1.0 / IOR)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    # Exit point: second intersection of the interior ray with the sphere.
    b2 = np.sum(p1 * d1, axis=-1)
    t2 = -2.0 * b2  # c=0 on the surface; far root of t^2 + 2 b2 t = 0
    p2 = p1 + t2[:, None] * d1
    n2 = -p2 / SPHERE_R
    d2, _ = refract(d1, n2, IOR)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    shade = sky(d2)
    # Schlick fresnel mix with the reflected sky at entry.
    cosi = np.clip(-np.sum(d[hit] * n1, axis=-1), 0.0, 1.0)
    r0 = ((1.0 - IOR) / (1.0 + IOR))**2
    fres = (r0 + (1.0 - r0) * (1.0 - cosi)**5)[:, None]
    refl = d[hit] + 2.0 * cosi[:, None] * n1
    img[hit] = (1.0 - fres) * shade + fres * sky(refl)
  rgba = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
  return (np.clip(rgba, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def main():
  from PIL import Image
  out = os.path.join(REPO, "example_data")
  os.makedirs(os.path.join(out, "imgs"), exist_ok=True)

  views = {
      "train": [(0.3, 0.55), (2.2, 0.35), (4.2, 0.75)],
      "val": [(1.3, 0.5)],
      "test": [(5.3, 0.45)],
  }
  idx = 0
  for split, cams in views.items():
    frames = []
    for theta, phi in cams:
      eye = RADIUS * np.array([np.cos(theta) * np.cos(phi),
                               np.sin(theta) * np.cos(phi), np.sin(phi)])
      c2w = look_at_pose(eye)
      name = f"imgs/r_{idx}"
      Image.fromarray(render(c2w), "RGBA").save(
          os.path.join(out, name + ".png"), optimize=True)
      frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
      idx += 1
    meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
    with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
      json.dump(meta, f, indent=2)

  verts, faces = icosphere(subdiv=3, radius=SPHERE_R)
  objio.save_obj(os.path.join(out, "mesh.obj"), verts, faces)
  print("wrote", out)


if __name__ == "__main__":
  main()
