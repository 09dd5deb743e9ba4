"""ChArUco-board camera calibration -> calib.pkl.

Parity with the reference calib/calib_camera_with_charuco.py: a 5x7 ChArUco
board (DICT_6X6_250, 4cm squares / 2cm markers), per-image corner
interpolation, cv2.aruco.calibrateCameraCharuco with the distortion model
disabled, calib.pkl {fnames, cameraMatrix, distCoeffs, rvecs, tvecs}.
The interactive preview windows are replaced by annotated debug images on
disk (headless-friendly).
"""

import os
import pickle
from glob import glob

import cv2
import numpy as np
from cv2 import aruco

import cfg

ARUCO_DICT = aruco.getPredefinedDictionary(aruco.DICT_6X6_250)
try:  # OpenCV >= 4.7 class API
  CHARUCO_BOARD = aruco.CharucoBoard((5, 7), 0.04, 0.02, ARUCO_DICT)
except AttributeError:  # legacy factory API
  CHARUCO_BOARD = aruco.CharucoBoard_create(5, 7, 0.04, 0.02, ARUCO_DICT)


def resize_images():
  """Halve image + mask resolution in place (reference helper)."""
  for fname in glob(os.path.join(cfg.root, "*.jpg")):
    img = cv2.imread(fname)
    h, w = img.shape[:2]
    cv2.imwrite(fname, cv2.resize(img, (w // 2, h // 2),
                                  interpolation=cv2.INTER_AREA))
  for fname in glob(os.path.join(cfg.root, "mask_*.png")):
    img = cv2.imread(fname)
    h, w = img.shape[:2]
    cv2.imwrite(fname, cv2.resize(img, (w // 2, h // 2),
                                  interpolation=cv2.INTER_NEAREST))


def create_charuco_board():
  try:
    board_img = CHARUCO_BOARD.generateImage((500, 600), marginSize=10,
                                            borderBits=1)
  except AttributeError:
    board_img = CHARUCO_BOARD.draw((500, 600), 10, 1)
  cv2.imwrite("BoardImage.png", board_img)


def detect_charuco_board_and_calibrate_camera(save_debug=True):
  corners_all = []
  ids_all = []
  image_size = None

  fnames = glob(os.path.join(cfg.root, "*.jpg"))
  for fname in fnames:
    img = cv2.imread(fname)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    corners, ids, _ = aruco.detectMarkers(image=gray, dictionary=ARUCO_DICT)
    if ids is None or len(ids) == 0:
      print(f"No aruco markers in image: {fname}")
      continue
    img = aruco.drawDetectedMarkers(image=img, corners=corners)
    response, charuco_corners, charuco_ids = aruco.interpolateCornersCharuco(
        markerCorners=corners, markerIds=ids, image=gray,
        board=CHARUCO_BOARD)
    if response > 0:
      corners_all.append(charuco_corners)
      ids_all.append(charuco_ids)
      print(fname, len(charuco_ids))
      img = aruco.drawDetectedCornersCharuco(
          image=img, charucoCorners=charuco_corners, charucoIds=charuco_ids)
      if not image_size:
        image_size = gray.shape[::-1]
      if save_debug:
        d, base = os.path.split(fname)
        cv2.imwrite(os.path.join(d, "detect_" + base), img)
    else:
      print(f"Not able to detect a charuco board {response} in: {fname}")

  if len(fnames) < 1:
    raise SystemExit("Calibration unsuccessful: no images found.")
  if not image_size:
    raise SystemExit("Calibration unsuccessful: no charuco boards detected.")

  _, camera_matrix, dist_coeffs, rvecs, tvecs = aruco.calibrateCameraCharuco(
      charucoCorners=corners_all,
      charucoIds=ids_all,
      board=CHARUCO_BOARD,
      imageSize=image_size,
      cameraMatrix=None,
      distCoeffs=np.zeros((5,)),
      flags=(cv2.CALIB_ZERO_TANGENT_DIST | cv2.CALIB_FIX_K1
             | cv2.CALIB_FIX_K2 | cv2.CALIB_FIX_K3))
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
  create_charuco_board()
  detect_charuco_board_and_calibrate_camera()
