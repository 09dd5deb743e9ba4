"""AprilTag reprojection sanity check (reference calib/reproject.py).

Projects the calibration cube's known 3D tag corners into every calibrated
frame and writes annotated images, to eyeball calibration quality.
"""

import os
import pickle

import cv2
import numpy as np

import cfg
from calib_camera_with_apriltag import build_tag_pts_dict


def main():
  with open(os.path.join(cfg.root, "calib.pkl"), "rb") as f:
    calib = pickle.load(f)

  tag_pts = np.concatenate(list(build_tag_pts_dict().values()), axis=0)
  cam_mat = np.asarray(calib["cameraMatrix"])
  dist = np.asarray(calib["distCoeffs"])

  for fname, rvec, tvec in zip(calib["fnames"], calib["rvecs"],
                               calib["tvecs"]):
    img = cv2.imread(fname)
    uv, _ = cv2.projectPoints(tag_pts, rvec, tvec, cam_mat, dist)
    uv = uv.reshape(-1, 2)
    h, w = img.shape[:2]
    for p in uv:
      x, y = int(round(p[0])), int(round(p[1]))
      if 0 <= x < w and 0 <= y < h:
        cv2.circle(img, (x, y), 3, (0, 0, 255), -1)
    d, base = os.path.split(fname)
    out = os.path.join(d, "reproj_" + base)
    cv2.imwrite(out, img)
    print("wrote", out)


if __name__ == "__main__":
  main()
