"""Render dilated object masks from the proxy mesh for masked metrics.

Parity with the reference metric/render_mask.py:84-94, but using the
in-repo native raycast renderer (samplenerfro_tpu/tools/sdf.Renderer)
instead of pyrender/open3d: for every calibrated frame, raycast the proxy
mesh from the camera, threshold depth into a silhouette, dilate with a
35x35 kernel, and write mask_<frame>.png next to the images.
"""

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from samplenerfro_tpu.tools import objio  # noqa: E402
from samplenerfro_tpu.tools import sdf as sdflib  # noqa: E402


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--data_dir", required=True)
  p.add_argument("--dataset", default="blender", choices=["blender", "opencv"])
  p.add_argument("--mesh", default="mesh.obj")
  p.add_argument("--split", default="test")
  p.add_argument("--dilate", type=int, default=35)
  args = p.parse_args()

  mesh = objio.load(os.path.join(args.data_dir, args.mesh))
  with open(os.path.join(args.data_dir,
                         f"transforms_{args.split}.json")) as f:
    meta = json.load(f)

  for frame in meta["frames"]:
    if args.dataset == "blender":
      img_path = os.path.join(args.data_dir, frame["file_path"] + ".png")
    else:
      img_path = os.path.join(args.data_dir, frame["file_path"])
    probe = cv2.imread(img_path)
    h, w = probe.shape[:2]
    if args.dataset == "blender":
      focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
      fx = fy = focal
      cx, cy = w / 2, h / 2
    else:
      cam = meta["cam_mat"]
      fx, fy, cx, cy = cam[0][0], cam[1][1], cam[0][2], cam[1][2]

    # Transform mesh into camera space. Blender c2w has -z forward / y up;
    # the raycaster looks down +z with y down (OpenCV convention).
    c2w = np.array(frame["transform_matrix"])
    w2c = np.eye(4)
    w2c[:3, :3] = c2w[:3, :3].T
    w2c[:3, 3] = -c2w[:3, :3].T @ c2w[:3, 3]
    verts_h = np.concatenate(
        [mesh.vertices, np.ones((len(mesh.vertices), 1))], -1)
    cam_verts = (w2c @ verts_h.T).T[:, :3]
    if args.dataset == "blender":
      cam_verts = cam_verts * np.array([1.0, -1.0, -1.0])  # GL -> CV

    ren = sdflib.Renderer(cam_verts, mesh.faces, width=w, height=h,
                          fx=fx, fy=fy, cx=cx, cy=cy)
    depth = ren.render_depth()
    mask = np.where(depth != 0, 1, 0).astype(np.uint8) * 255
    kernel = np.ones((args.dilate, args.dilate), np.uint8)
    mask = cv2.dilate(mask, kernel, iterations=1)

    d, fname = os.path.split(frame["file_path"])
    if args.dataset == "blender":
      mask_fname = os.path.join(args.data_dir, d, "mask_" + fname + ".png")
    else:
      mask_fname = os.path.join(args.data_dir, d,
                                "mask_" + fname[:-4] + ".png")
    cv2.imwrite(mask_fname, mask)
    print("wrote", mask_fname)


if __name__ == "__main__":
  main()
