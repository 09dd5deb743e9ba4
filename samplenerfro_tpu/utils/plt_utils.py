"""3D curved-ray-path plotting (reference rnerf/plt_utils.py:31-92).

Renders a per-pixel eikonal path as a styled matplotlib 3D figure from four
canonical viewpoints (top/right/front/free), used by the mesh-extraction
debug tool.
"""

import io
from itertools import combinations, product

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from samplenerfro_tpu.ops import math as math_ops


def get_img_from_fig(fig, dpi=180):
  """Rasterize a matplotlib figure to an RGB array."""
  buf = io.BytesIO()
  fig.savefig(buf, format="png", dpi=dpi)
  buf.seek(0)
  from PIL import Image
  img = np.array(Image.open(buf).convert("RGB"))
  buf.close()
  return img


def plot_cube(ax, r):
  """Wireframe cube across range r = [lo, hi]."""
  for s, e in combinations(np.array(list(product(r, r, r))), 2):
    if np.sum(np.abs(s - e)) == r[1] - r[0]:
      ax.plot(*zip(s, e), color="r")


def plot_path(ray_pos, idx_grad=None, out_dir=None):
  """Plot the first ray's curved path with floor projection and droplines."""
  ray_pos = np.asarray(ray_pos)
  nmax = np.max(ray_pos.reshape(-1, 3), axis=0)
  nmin = np.min(ray_pos.reshape(-1, 3), axis=0)
  center = np.mean(ray_pos.reshape(-1, 3), axis=0)
  side = np.max(nmax - nmin)
  scale = side / 100 * 10

  fig = plt.figure(figsize=(8, 8))
  ax = fig.add_subplot(projection="3d", computed_zorder=False)
  ax.set_xlabel("X")
  ax.set_ylabel("Y")
  ax.set_zlabel("Z")

  ax.scatter(
      ray_pos[0, :, 0:1], ray_pos[0, :, 1:2], ray_pos[0, :, 2:3],
      facecolors=np.tile(np.array([[1.0, 1.0, 1.0]]), [ray_pos.shape[1], 1]),
      edgecolors=np.tile(np.array([[139, 206, 151]]) / 255.0,
                         [ray_pos.shape[1], 1]),
      s=50, depthshade=True, zorder=4.4)
  floor = center[2] - side * 0.5
  ax.plot(ray_pos[0, :, 0], ray_pos[0, :, 1],
          np.ones_like(ray_pos[0, :, 2]) * floor, color="#8bce97")
  for i in list(range(0, ray_pos.shape[1], 16)) + [-1]:
    ax.plot([ray_pos[0, i, 0], ray_pos[0, i, 0]],
            [ray_pos[0, i, 1], ray_pos[0, i, 1]],
            [ray_pos[0, i, 2], floor], "k:")

  if idx_grad is not None:
    idx_grad = np.asarray(
        math_ops.safe_l2_normalize(np.asarray(idx_grad))) * scale
    ax.quiver(ray_pos[0, :, 0:1], ray_pos[0, :, 1:2], ray_pos[0, :, 2:3],
              idx_grad[0, :, 0:1] * scale, idx_grad[0, :, 1:2] * scale,
              idx_grad[0, :, 2:3] * scale, color="r")

  ax.set_xlim(center[0] - side * 0.5, center[0] + side * 0.5)
  ax.set_ylim(center[1] - side * 0.5, center[1] + side * 0.5)
  ax.set_zlim(center[2] - side * 0.5, center[2] + side * 0.5)
  ax.set_box_aspect(
      [ub - lb for lb, ub in (getattr(ax, f"get_{a}lim")() for a in "xyz")])
  ax.grid(False)
  ax.view_init(elev=20, azim=145)
  plt.tight_layout()

  if out_dir is not None:
    from PIL import Image
    for name, elev, azim in zip(["top", "right", "front", "free"],
                                [90.0, 0.0, 0.0, 30.0],
                                [0.0, 0.0, 90.0, -60.0]):
      ax.view_init(elev=elev, azim=azim)
      plt.draw()
      Image.fromarray(get_img_from_fig(fig, dpi=180)).save(
          f"{out_dir}/{name}.png")
  plt.close(fig)
