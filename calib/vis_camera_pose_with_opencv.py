"""Convert OpenCV calibration (calib.pkl) to the Blender-style calib.json.

Parity with the reference calib/vis_camera_pose_with_opencv.py:80-94:
calib.pkl {fnames, cameraMatrix, distCoeffs, rvecs, tvecs} ->
calib.json {cam_mat, frames: [{file_path, transform_matrix}]}.
The open3d pose viewer is optional (skipped with a notice when open3d is
not installed).
"""

import json
import os
import pickle

import numpy as np
import scipy.spatial.transform as transform

import cfg


def to_view_matrix(rvec, tvec):
  """OpenCV (rvec, tvec) world->cam pose -> cam->world 4x4 matrix."""
  rot_mat = transform.Rotation.from_rotvec(np.asarray(rvec)[:, 0]).as_matrix()
  mat = np.eye(4)
  mat[:3, :3] = rot_mat.T
  mat[:3, 3] = (-rot_mat.T @ np.asarray(tvec)).reshape(-1)
  return mat


def to_trans_quat(mat):
  trans = mat[:3, 3]
  quat = transform.Rotation.from_matrix(mat[:3, :3]).as_quat()
  return np.concatenate([trans, quat])


class NumpyEncoder(json.JSONEncoder):

  def default(self, obj):
    if isinstance(obj, np.ndarray):
      return obj.tolist()
    return json.JSONEncoder.default(self, obj)


def main():
  with open(os.path.join(cfg.root, "calib.pkl"), "rb") as f:
    calib = pickle.load(f)

  fnames = calib["fnames"]
  rvecs = calib["rvecs"]
  tvecs = calib["tvecs"]

  json_dict = {"cam_mat": calib["cameraMatrix"], "frames": []}
  trans_quat_list = []
  for i, (rvec, tvec) in enumerate(zip(rvecs, tvecs)):
    mat = to_view_matrix(rvec, tvec)
    trans_quat_list.append(to_trans_quat(mat))
    json_dict["frames"].append({
        "file_path": fnames[i],
        "transform_matrix": mat,
    })

  with open(os.path.join(cfg.root, "calib.json"), "w") as f:
    json.dump(json_dict, f, cls=NumpyEncoder)
  print(f"wrote calib.json with {len(json_dict['frames'])} frames")

  try:
    import open3d as o3d  # noqa: F401
  except ImportError:
    print("open3d not installed; skipping the interactive pose viewer.")
    return
  _visualize_with_open3d(trans_quat_list)


def _visualize_with_open3d(trans_quat_list):
  import open3d as o3d
  vis = o3d.visualization.Visualizer()
  vis.create_window(width=1280, height=720)
  for tq in trans_quat_list:
    frame = o3d.geometry.TriangleMesh.create_coordinate_frame(size=0.05)
    rot = transform.Rotation.from_quat(tq[3:]).as_matrix()
    mat = np.eye(4)
    mat[:3, :3] = rot
    mat[:3, 3] = tq[:3]
    frame.transform(mat)
    vis.add_geometry(frame)
  vis.run()
  vis.destroy_window()


if __name__ == "__main__":
  main()
