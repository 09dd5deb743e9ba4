"""Parsers for COLMAP sparse-reconstruction binary/text model files.

Standard COLMAP model format readers (cameras, images, points3D), used by
the LLFF pose pipeline (reference calib/llff/poses/colmap_read_model.py).
Pure python/numpy.
"""

import collections
import os
import struct

import numpy as np

CameraModel = collections.namedtuple("CameraModel",
                                     ["model_id", "model_name", "num_params"])
Camera = collections.namedtuple(
    "Camera", ["id", "model", "width", "height", "params"])
BaseImage = collections.namedtuple(
    "Image", ["id", "qvec", "tvec", "camera_id", "name", "xys", "point3D_ids"])
Point3D = collections.namedtuple(
    "Point3D", ["id", "xyz", "rgb", "error", "image_ids", "point2D_idxs"])

CAMERA_MODELS = {
    CameraModel(0, "SIMPLE_PINHOLE", 3),
    CameraModel(1, "PINHOLE", 4),
    CameraModel(2, "SIMPLE_RADIAL", 4),
    CameraModel(3, "RADIAL", 5),
    CameraModel(4, "OPENCV", 8),
    CameraModel(5, "OPENCV_FISHEYE", 8),
    CameraModel(6, "FULL_OPENCV", 12),
    CameraModel(7, "FOV", 5),
    CameraModel(8, "SIMPLE_RADIAL_FISHEYE", 4),
    CameraModel(9, "RADIAL_FISHEYE", 5),
    CameraModel(10, "THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {m.model_id: m for m in CAMERA_MODELS}


class Image(BaseImage):

  def qvec2rotmat(self):
    return qvec2rotmat(self.qvec)


def qvec2rotmat(qvec):
  w, x, y, z = qvec
  return np.array([
      [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
      [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
      [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2],
  ])


def _read(fid, num_bytes, fmt):
  return struct.unpack("<" + fmt, fid.read(num_bytes))


def read_cameras_binary(path):
  cameras = {}
  with open(path, "rb") as fid:
    num = _read(fid, 8, "Q")[0]
    for _ in range(num):
      cam_id, model_id, width, height = _read(fid, 24, "iiQQ")
      model = CAMERA_MODEL_IDS[model_id]
      params = _read(fid, 8 * model.num_params, "d" * model.num_params)
      cameras[cam_id] = Camera(cam_id, model.model_name, width, height,
                               np.array(params))
  return cameras


def read_images_binary(path):
  images = {}
  with open(path, "rb") as fid:
    num = _read(fid, 8, "Q")[0]
    for _ in range(num):
      props = _read(fid, 64, "idddddddi")
      image_id = props[0]
      qvec = np.array(props[1:5])
      tvec = np.array(props[5:8])
      camera_id = props[8]
      name = b""
      c = fid.read(1)
      while c != b"\x00":
        name += c
        c = fid.read(1)
      num_points = _read(fid, 8, "Q")[0]
      data = _read(fid, 24 * num_points, "ddq" * num_points)
      xys = np.column_stack([data[0::3], data[1::3]])
      point3d_ids = np.array(data[2::3], dtype=np.int64)
      images[image_id] = Image(image_id, qvec, tvec, camera_id,
                               name.decode("utf-8"), xys, point3d_ids)
  return images


def read_points3d_binary(path):
  points = {}
  with open(path, "rb") as fid:
    num = _read(fid, 8, "Q")[0]
    for _ in range(num):
      props = _read(fid, 43, "QdddBBBd")
      pid = props[0]
      xyz = np.array(props[1:4])
      rgb = np.array(props[4:7])
      error = props[7]
      track_len = _read(fid, 8, "Q")[0]
      track = _read(fid, 8 * track_len, "ii" * track_len)
      points[pid] = Point3D(pid, xyz, rgb, error,
                            np.array(track[0::2]), np.array(track[1::2]))
  return points


def read_model(path, ext=".bin"):
  if ext != ".bin":
    raise NotImplementedError("only binary COLMAP models are supported")
  cameras = read_cameras_binary(os.path.join(path, "cameras" + ext))
  images = read_images_binary(os.path.join(path, "images" + ext))
  points3d = read_points3d_binary(os.path.join(path, "points3D" + ext))
  return cameras, images, points3d
