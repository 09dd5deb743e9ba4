"""ctypes binding for the native SDF/raycast core (pysdf-compatible API).

Replaces the reference's pybind11 `pysdf` module (sdf/pybind.cpp:16-159):
`SDF(verts, faces)` with .contains/.calc/.nn/.sample_surface/.surface_area/
.aabb/.face_normals, and `Renderer` with .render_depth/.render_mask/
.render_nn. The shared library is built on demand from
samplenerfro_tpu/native/sdfcore.cpp with g++ (no pybind11 needed).
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdfcore.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "sdfcore.cpp")

_lib = None


def _load():
  global _lib
  if _lib is not None:
    return _lib
  if (not os.path.exists(_LIB_PATH)
      or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC_PATH,
         "-o", _LIB_PATH],
        check=True, capture_output=True)
  lib = ctypes.CDLL(_LIB_PATH)
  lib.sdf_create.restype = ctypes.c_void_p
  lib.sdf_create.argtypes = [
      ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int]
  lib.sdf_destroy.argtypes = [ctypes.c_void_p]
  lib.sdf_contains.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_uint8)]
  lib.sdf_calc.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_float)]
  lib.sdf_nn.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_int32)]
  lib.sdf_sample_surface.argtypes = [
      ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
      ctypes.POINTER(ctypes.c_float)]
  lib.sdf_surface_area.restype = ctypes.c_double
  lib.sdf_surface_area.argtypes = [ctypes.c_void_p]
  lib.sdf_aabb.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
  lib.sdf_face_normals.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
  lib.sdf_face_areas.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
  lib.sdf_render_depth.argtypes = [
      ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
      ctypes.c_float, ctypes.c_float, ctypes.c_float,
      ctypes.POINTER(ctypes.c_float)]
  lib.sdf_render_nn.argtypes = [
      ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
      ctypes.c_float, ctypes.c_float, ctypes.c_float,
      ctypes.POINTER(ctypes.c_int32)]
  _lib = lib
  return lib


def _fptr(a):
  return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class SDF:
  """Watertight-mesh containment / signed distance / sampling queries."""

  def __init__(self, verts, faces, robust=True, copy=True):
    del copy  # data is always copied into the native structure
    lib = _load()
    self.verts = np.ascontiguousarray(verts, np.float32)
    self.faces = np.ascontiguousarray(faces, np.int32)
    self.robust = bool(robust)
    self._h = lib.sdf_create(
        _fptr(self.verts), len(self.verts),
        self.faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(self.faces), int(robust))
    self._lib = lib
    self._seed = 0

  def __del__(self):
    try:
      if getattr(self, "_h", None):
        self._lib.sdf_destroy(self._h)
        self._h = None
    except Exception:
      pass

  def contains(self, points):
    """[N] bool: True iff inside the mesh (pysdf SDF.contains)."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    out = np.empty(len(pts), np.uint8)
    self._lib.sdf_contains(
        self._h, _fptr(pts), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)

  def calc(self, points, trunc_aabb=False):
    """[N] float32 signed distance, positive inside (pysdf SDF.calc)."""
    del trunc_aabb
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    out = np.empty(len(pts), np.float32)
    self._lib.sdf_calc(self._h, _fptr(pts), len(pts), _fptr(out))
    return out

  __call__ = calc

  def nn(self, points):
    """[N] int32 nearest-vertex indices (pysdf SDF.nn)."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    out = np.empty(len(pts), np.int32)
    self._lib.sdf_nn(
        self._h, _fptr(pts), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out

  def sample_surface(self, num_points):
    """[N, 3] float32 area-weighted uniform surface samples."""
    out = np.empty((num_points, 3), np.float32)
    self._seed += 1
    self._lib.sdf_sample_surface(self._h, num_points, self._seed, _fptr(out))
    return out

  @property
  def surface_area(self):
    return float(self._lib.sdf_surface_area(self._h))

  @property
  def aabb(self):
    out = np.empty(6, np.float32)
    self._lib.sdf_aabb(self._h, _fptr(out))
    return out.reshape(2, 3)

  @property
  def face_normals(self):
    out = np.empty((len(self.faces), 3), np.float32)
    self._lib.sdf_face_normals(self._h, _fptr(out))
    return out

  @property
  def face_areas(self):
    out = np.empty(len(self.faces), np.float32)
    self._lib.sdf_face_areas(self._h, _fptr(out))
    return out

  @property
  def vertices(self):
    return self.verts


class Renderer:
  """Image-space raycast depth/mask/vertex-id renderer (+z forward)."""

  def __init__(self, verts, faces, width=1080, height=1080, fx=2600.0,
               fy=2600.0, cx=540.0, cy=540.0, copy=True):
    del copy
    self._sdf = SDF(verts, faces, robust=False)
    self.width, self.height = int(width), int(height)
    self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy

  @property
  def verts(self):
    return self._sdf.verts

  @property
  def faces(self):
    return self._sdf.faces

  def render_depth(self):
    out = np.empty(self.height * self.width, np.float32)
    self._sdf._lib.sdf_render_depth(
        self._sdf._h, self.width, self.height, self.fx, self.fy, self.cx,
        self.cy, _fptr(out))
    return out.reshape(self.height, self.width)

  def render_mask(self):
    return self.render_depth() > 0

  def render_nn(self, fill_outside=False):
    out = np.empty(self.height * self.width, np.int32)
    self._sdf._lib.sdf_render_nn(
        self._sdf._h, self.width, self.height, self.fx, self.fy, self.cx,
        self.cy, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    out = out.reshape(self.height, self.width)
    if fill_outside and (out < 0).any() and (out >= 0).any():
      # 2D nearest-neighbor fill for empty pixels.
      ys, xs = np.nonzero(out >= 0)
      ey, ex = np.nonzero(out < 0)
      vals = out[ys, xs]
      d2 = (ey[:, None] - ys[None, :])**2 + (ex[:, None] - xs[None, :])**2
      out[ey, ex] = vals[np.argmin(d2, axis=1)]
    return out
