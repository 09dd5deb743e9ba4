"""Convert LLFF poses_bounds.npy to calib.json; optional open3d viewer.

Parity with the reference calib/vis_camera_pose_with_llff.py: reads the
LLFF [down, right, backwards] poses, converts to the OpenCV-convention
cam->world matrices used by the opencv dataset loader, and writes
calib.json {cam_mat, frames}. The interactive open3d pose viewer runs only
when open3d is installed.
"""

import json
import os
from glob import glob

import numpy as np

import cfg


class NumpyEncoder(json.JSONEncoder):

  def default(self, obj):
    if isinstance(obj, np.ndarray):
      return obj.tolist()
    return json.JSONEncoder.default(self, obj)


def llff_to_opencv(pose):
  """LLFF 3x5 [down, right, backwards | t | hwf] -> OpenCV c2w 4x4 + hwf."""
  hwf = pose[:, 4]
  m = pose[:, :4]
  # [down, right, back] -> [right, down, forward] (x, y, z columns).
  r = np.stack([m[:, 1], m[:, 0], -m[:, 2]], axis=1)
  c2w = np.eye(4)
  c2w[:3, :3] = r
  c2w[:3, 3] = m[:, 3]
  return c2w, hwf


def main():
  poses_arr = np.load(os.path.join(cfg.root, "poses_bounds.npy"))
  poses = poses_arr[:, :-2].reshape([-1, 3, 5])
  bds = poses_arr[:, -2:]
  print(f"{len(poses)} poses, depth range "
        f"[{bds.min():.3f}, {bds.max():.3f}]")

  imgdir = os.path.join(cfg.root, "images")
  fnames = sorted(
      glob(os.path.join(imgdir, "*.jpg")) + glob(os.path.join(imgdir, "*.JPG"))
      + glob(os.path.join(imgdir, "*.png")))

  frames = []
  cam_mat = None
  for i, pose in enumerate(poses):
    c2w, hwf = llff_to_opencv(pose)
    h, w, f = hwf
    if cam_mat is None:
      cam_mat = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    frames.append({
        "file_path": fnames[i] if i < len(fnames) else f"images/{i:03d}.jpg",
        "transform_matrix": c2w,
    })

  with open(os.path.join(cfg.root, "calib.json"), "w") as f:
    json.dump({"cam_mat": cam_mat, "frames": frames}, f, cls=NumpyEncoder)
  print("wrote calib.json")

  try:
    import open3d as o3d
  except ImportError:
    print("open3d not installed; skipping the interactive pose viewer.")
    return
  vis = o3d.visualization.Visualizer()
  vis.create_window(width=1280, height=720)
  for frame in frames:
    mesh = o3d.geometry.TriangleMesh.create_coordinate_frame(size=0.05)
    mesh.transform(np.array(frame["transform_matrix"]))
    vis.add_geometry(mesh)
  vis.run()
  vis.destroy_window()


if __name__ == "__main__":
  main()
