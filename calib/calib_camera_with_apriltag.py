"""AprilTag-cube camera calibration -> calib.pkl.

Parity with the reference calib/calib_camera_with_apriltag.py: a 60cm cube
wrapped in 12 faces of 3x3 tagStandard41h12 AprilTags with known 3D corner
layouts (:41-107), per-image corner detection, cv2.calibrateCamera with an
intrinsic guess and the distortion model disabled, calib.pkl
{fnames, cameraMatrix, distCoeffs, rvecs, tvecs}.

Detection backend: pupil_apriltags when installed (reference dependency),
otherwise OpenCV's AprilTag detector (DICT_APRILTAG_36h11 family ids are
different from tagStandard41h12 — when using the cv2 fallback, print a
notice and detect DICT_APRILTAG_36h11 tags instead, assuming the cube was
built from that family with the same layout).
"""

import os
import pickle
from glob import glob

import cv2
import numpy as np

import cfg


def build_tag_pts_dict(scale=0.1):
  """3D corner coordinates for the 108 tags on the calibration cube."""
  tag_pts_dict = {}
  # Faces 0-7 (z = 0 plane ring).
  anchor_z = scale * 0
  for k, anchor_x, anchor_y in zip(
      list(range(8)), [0, 2.7, 5.4, 5.4, 5.4, 2.7, 0, 0],
      [0, 0, 0, 2.7, 5.4, 5.4, 5.4, 2.7]):
    for i in range(3):
      for j in range(3):
        x = scale * anchor_x + scale * 0.9 * j
        y = scale * anchor_y + scale * 0.9 * i
        tag_pts_dict[j + i * 3 + 9 * k] = np.array([
            [x + scale * 0.7, y + scale * 0.2, anchor_z],
            [x + scale * 0.7, y + scale * 0.7, anchor_z],
            [x + scale * 0.2, y + scale * 0.7, anchor_z],
            [x + scale * 0.2, y + scale * 0.2, anchor_z]], dtype=np.float32)
  # Face 8 (x = 5.4*scale plane).
  anchor_x = scale * 5.4
  anchor_y, anchor_z = 2.7, 2.7
  k = 8
  for i in range(3):
    for j in range(3):
      z = scale * anchor_z - scale * 0.9 * j
      y = scale * anchor_y + scale * 0.9 * i
      tag_pts_dict[j + i * 3 + 9 * k] = np.array([
          [anchor_x, y + scale * 0.2, z - scale * 0.7],
          [anchor_x, y + scale * 0.7, z - scale * 0.7],
          [anchor_x, y + scale * 0.7, z - scale * 0.2],
          [anchor_x, y + scale * 0.2, z - scale * 0.2]], dtype=np.float32)
  # Face 10 (x = 2.7*scale plane).
  anchor_x = scale * 2.7
  anchor_y, anchor_z = 5.4, 2.7
  k = 10
  for i in range(3):
    for j in range(3):
      z = scale * anchor_z - scale * 0.9 * j
      y = scale * anchor_y - scale * 0.9 * i
      tag_pts_dict[j + i * 3 + 9 * k] = np.array([
          [anchor_x, y - scale * 0.2, z - scale * 0.7],
          [anchor_x, y - scale * 0.7, z - scale * 0.7],
          [anchor_x, y - scale * 0.7, z - scale * 0.2],
          [anchor_x, y - scale * 0.2, z - scale * 0.2]], dtype=np.float32)
  # Face 9 (y = 5.4*scale plane).
  anchor_y = scale * 5.4
  anchor_z, anchor_x = 2.7, 5.4
  k = 9
  for i in range(3):
    for j in range(3):
      z = scale * anchor_z - scale * 0.9 * j
      x = scale * anchor_x - scale * 0.9 * i
      tag_pts_dict[j + i * 3 + 9 * k] = np.array([
          [x - scale * 0.2, anchor_y, z - scale * 0.7],
          [x - scale * 0.7, anchor_y, z - scale * 0.7],
          [x - scale * 0.7, anchor_y, z - scale * 0.2],
          [x - scale * 0.2, anchor_y, z - scale * 0.2]], dtype=np.float32)
  # Face 11 (y = 2.7*scale plane).
  anchor_y = scale * 2.7
  anchor_z, anchor_x = 2.7, 2.7
  k = 11
  for i in range(3):
    for j in range(3):
      z = scale * anchor_z - scale * 0.9 * j
      x = scale * anchor_x + scale * 0.9 * i
      tag_pts_dict[j + i * 3 + 9 * k] = np.array([
          [x + scale * 0.2, anchor_y, z - scale * 0.7],
          [x + scale * 0.7, anchor_y, z - scale * 0.7],
          [x + scale * 0.7, anchor_y, z - scale * 0.2],
          [x + scale * 0.2, anchor_y, z - scale * 0.2]], dtype=np.float32)
  return tag_pts_dict


def detect_tags(gray):
  """Detect AprilTags -> list of (tag_id, corners [4, 2] float32)."""
  try:
    from pupil_apriltags import Detector
    det = Detector(families="tagStandard41h12", nthreads=1, quad_decimate=1.0,
                   quad_sigma=0.0, refine_edges=1, decode_sharpening=0.25,
                   debug=0)
    return [(t.tag_id, t.corners.astype(np.float32))
            for t in det.detect(gray, estimate_tag_pose=False,
                                camera_params=None, tag_size=None)]
  except ImportError:
    aruco = cv2.aruco
    d = aruco.getPredefinedDictionary(aruco.DICT_APRILTAG_36h11)
    corners, ids, _ = aruco.detectMarkers(gray, d)
    if ids is None:
      return []
    return [(int(i), c.reshape(4, 2).astype(np.float32))
            for i, c in zip(ids.reshape(-1), corners)]


def main():
  tag_pts_dict = build_tag_pts_dict()
  fnames = list(sorted(glob(os.path.join(cfg.root, "*.jpg"))))
  image_size = None
  uvs_all = []
  pts_all = []
  for fname in fnames:
    img = cv2.imread(fname)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    tags = detect_tags(gray)

    uvs_frame = []
    pts_frame = []
    for tag_id, corners in tags:
      if tag_id not in tag_pts_dict:
        continue
      uvs_frame.append(corners)
      pts_frame.append(tag_pts_dict[tag_id])
    if len(uvs_frame) < 3:
      print(f'Number of tags detected in "{fname}" is less than 3!')
      continue
    uvs_all.append(np.concatenate(uvs_frame, axis=0))
    pts_all.append(np.concatenate(pts_frame, axis=0))
    if not image_size:
      image_size = gray.shape[::-1]

  if len(fnames) < 1:
    raise SystemExit("Calibration unsuccessful: no images found.")
  if not image_size:
    raise SystemExit("Calibration unsuccessful: no apriltags detected.")

  k_guess = np.array(
      [[1.2 * max(image_size[0], image_size[1]), 0, image_size[0] / 2],
       [0, 1.2 * max(image_size[0], image_size[1]), image_size[1] / 2],
       [0, 0, 1]], dtype=np.float32)
  _, camera_matrix, dist_coeffs, rvecs, tvecs = cv2.calibrateCamera(
      objectPoints=pts_all, imagePoints=uvs_all, imageSize=image_size,
      cameraMatrix=k_guess, distCoeffs=np.zeros((5,), dtype=np.float32),
      flags=(cv2.CALIB_ZERO_TANGENT_DIST | cv2.CALIB_FIX_K1
             | cv2.CALIB_FIX_K2 | cv2.CALIB_FIX_K3
             | cv2.CALIB_USE_INTRINSIC_GUESS))
  print(camera_matrix)
  print(dist_coeffs)

  with open(os.path.join(os.path.split(fnames[0])[0], "calib.pkl"),
            "wb") as f:
    pickle.dump({
        "fnames": fnames,
        "cameraMatrix": camera_matrix,
        "distCoeffs": dist_coeffs,
        "rvecs": rvecs,
        "tvecs": tvecs,
    }, f)


if __name__ == "__main__":
  main()
