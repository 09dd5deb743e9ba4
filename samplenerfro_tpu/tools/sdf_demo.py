"""Native-renderer demo: turntable depth/mask renders of a mesh.

Equivalent of the reference's sdf/demo.cpp viewer (meshview-based), adapted
for headless use: raycasts the mesh with the native BVH renderer from a
ring of viewpoints and writes depth/mask PNGs.

Usage: python -m samplenerfro_tpu.tools.sdf_demo mesh.obj out_dir [--views 8]
"""

import argparse
import os

import numpy as np

from samplenerfro_tpu.tools import objio
from samplenerfro_tpu.tools import sdf as sdflib


def main():
  p = argparse.ArgumentParser()
  p.add_argument("mesh")
  p.add_argument("out_dir")
  p.add_argument("--views", type=int, default=8)
  p.add_argument("--size", type=int, default=256)
  args = p.parse_args()

  from PIL import Image
  mesh = objio.load(args.mesh)
  center = mesh.vertices.mean(0)
  radius = float(np.max(np.linalg.norm(mesh.vertices - center, axis=-1)))
  os.makedirs(args.out_dir, exist_ok=True)

  s = args.size
  for i, theta in enumerate(np.linspace(0, 2 * np.pi, args.views,
                                        endpoint=False)):
    eye = center + 3.0 * radius * np.array(
        [np.cos(theta), np.sin(theta), 0.3])
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    # Camera space: x=right, y=-up (image y down), z=forward.
    rot = np.stack([right, -true_up, fwd])
    cam_verts = (mesh.vertices - eye) @ rot.T

    ren = sdflib.Renderer(cam_verts, mesh.faces, width=s, height=s,
                          fx=s, fy=s, cx=s / 2, cy=s / 2)
    depth = ren.render_depth()
    mask = depth > 0
    vis = np.zeros_like(depth)
    if mask.any():
      d = depth[mask]
      vis[mask] = 1.0 - (depth[mask] - d.min()) / max(np.ptp(d), 1e-6)
    Image.fromarray((vis * 255).astype(np.uint8)).save(
        os.path.join(args.out_dir, f"depth_{i:02d}.png"))
    Image.fromarray((mask * 255).astype(np.uint8)).save(
        os.path.join(args.out_dir, f"mask_{i:02d}.png"))
    print(f"view {i}: {mask.mean() * 100:.1f}% coverage")


if __name__ == "__main__":
  main()
