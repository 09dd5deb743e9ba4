"""Tests for mesh tools: OBJ IO, iso-surface, native SDF core, voxelizer."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from samplenerfro_tpu.tools import isosurface, objio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sphere_mesh(n=33, radius=0.7):
  axes = np.linspace(-1, 1, n)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vol = np.sqrt(xx**2 + yy**2 + zz**2)
  v, f = isosurface.marching_tetrahedra(vol, radius)
  return v / (n - 1) * 2 - 1, f


def test_marching_tetrahedra_sphere_accuracy():
  w, f = _sphere_mesh()
  r = np.linalg.norm(w, axis=-1)
  assert abs(r.mean() - 0.7) < 2e-3
  assert r.std() < 2e-3
  assert len(f) > 1000


def test_marching_tetrahedra_watertight():
  _, f = _sphere_mesh(17)
  edges = {}
  for tri in f:
    for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
      k = (min(a, b), max(a, b))
      edges[k] = edges.get(k, 0) + 1
  assert all(c == 2 for c in edges.values())


def test_marching_tetrahedra_empty():
  v, f = isosurface.marching_tetrahedra(np.zeros((8, 8, 8)), 0.5)
  assert len(v) == 0 and len(f) == 0


def test_objio_roundtrip(tmp_path):
  w, f = _sphere_mesh(9)
  p = str(tmp_path / "m.obj")
  objio.save_obj(p, w, f)
  m = objio.load(p)
  np.testing.assert_allclose(m.vertices, w, atol=1e-6)
  np.testing.assert_array_equal(m.faces, f)
  assert m.bounds.shape == (2, 3)


def test_sdf_core_sphere():
  from samplenerfro_tpu.tools import sdf as sdflib
  w, f = _sphere_mesh()
  s = sdflib.SDF(w, f)
  assert abs(s.surface_area - 4 * np.pi * 0.7**2) < 0.05

  rng = np.random.RandomState(0)
  pts = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)
  r = np.linalg.norm(pts, axis=-1)
  off_boundary = np.abs(r - 0.7) > 0.05
  inside = s.contains(pts)
  assert np.all(inside[off_boundary] == (r < 0.7)[off_boundary])

  d = s.calc(pts)
  np.testing.assert_allclose(d[off_boundary], (0.7 - r)[off_boundary],
                             atol=5e-3)

  samp = s.sample_surface(2000)
  sr = np.linalg.norm(samp, axis=-1)
  assert abs(sr.mean() - 0.7) < 5e-3

  nn = s.nn(pts[:20])
  assert nn.min() >= 0 and nn.max() < len(w)


def test_sdf_renderer():
  from samplenerfro_tpu.tools import sdf as sdflib
  w, f = _sphere_mesh()
  ren = sdflib.Renderer(w + np.array([0, 0, 2.0]), f, width=32, height=32,
                        fx=32, fy=32, cx=16, cy=16)
  depth = ren.render_depth()
  mask = ren.render_mask()
  assert abs(depth[16, 16] - 1.3) < 0.02
  assert 0.2 < mask.mean() < 0.8
  nn = ren.render_nn()
  assert nn[16, 16] >= 0
  assert nn[0, 0] == -1


def test_voxelize_cli(tmp_path):
  """voxelize_mesh.py produces a reference-schema mesh.pkl + preview obj."""
  data_dir = str(tmp_path / "scene")
  os.makedirs(data_dir)
  w, f = _sphere_mesh()
  objio.save_obj(os.path.join(data_dir, "mesh.obj"), w, f)

  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["SAMPLENERFRO_FORCE_CPU"] = "1"
  cmd = [
      sys.executable, os.path.join(REPO, "voxelize_mesh.py"),
      f"--data_dir={data_dir}", "--num_samples=2", "--num_voxels=24",
      "--extent=1.0", "--threshold=1.165",
  ]
  proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                        timeout=600, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-2000:]

  with open(os.path.join(data_dir, "voxelize", "mesh.pkl"), "rb") as fh:
    mesh_dict = pickle.load(fh)
  assert set(mesh_dict.keys()) == {
      "data", "extent", "min_point", "max_point", "num_voxels"}
  assert mesh_dict["num_voxels"] == 24
  data = np.asarray(mesh_dict["data"]).reshape(24, 24, 24)
  # Center voxel inside the sphere -> IOR 1.33; corners outside -> 1.0.
  assert abs(data[12, 12, 12] - 1.33) < 1e-6
  assert abs(data[0, 0, 0] - 1.0) < 1e-6
  # Occupied fraction ~ sphere volume fraction of the [-1,1]^3 box.
  frac = np.mean(data > 1.165)
  expected = 4 / 3 * np.pi * 0.7**3 / 8
  assert abs(frac - expected) < 0.05
  previews = [p for p in os.listdir(os.path.join(data_dir, "voxelize"))
              if p.endswith(".obj")]
  assert previews


def test_visual_hull_synthetic(tmp_path):
  """Space carving on synthetic masks reconstructs a centered ball."""
  import cv2
  import importlib
  sys.path.insert(0, os.path.join(REPO, "calib"))
  try:
    import cfg as hull_cfg
    mvh = importlib.import_module("make_visual_hull")
    importlib.reload(mvh)

    root = str(tmp_path / "hull")
    os.makedirs(root)
    # Cameras on a circle looking at the origin; ball of radius 0.3.
    cam_mat = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    frames = []
    for i, theta in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
      eye = 2.0 * np.array([np.cos(theta), np.sin(theta), 0.0])
      fwd = -eye / np.linalg.norm(eye)  # +z forward (OpenCV)
      up = np.array([0.0, 0.0, 1.0])
      right = np.cross(up, fwd)
      right /= np.linalg.norm(right)
      true_up = np.cross(fwd, right)
      c2w = np.eye(4)
      c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
          right, true_up, fwd, eye)
      # Analytic mask: projected ball silhouette.
      ys, xs = np.mgrid[0:64, 0:64]
      w2c = mvh.to_view_matrix(c2w)
      mask = np.zeros((64, 64), np.uint8)
      # Sample the ball surface and splat.
      rng = np.random.RandomState(i)
      pts = rng.randn(8000, 3)
      pts = 0.3 * pts / np.linalg.norm(pts, axis=-1, keepdims=True)
      ph = np.concatenate([pts, np.ones((len(pts), 1))], -1)
      campts = (w2c @ ph.T).T[:, :3]
      uv = (cam_mat @ campts.T).T
      uv = uv[:, :2] / uv[:, 2:3]
      uvi = np.round(uv).astype(int)
      ok = ((uvi[:, 0] >= 0) & (uvi[:, 0] < 64)
            & (uvi[:, 1] >= 0) & (uvi[:, 1] < 64))
      mask[uvi[ok, 1], uvi[ok, 0]] = 255
      mask = cv2.dilate(mask, np.ones((3, 3), np.uint8))
      mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE,
                              np.ones((5, 5), np.uint8))
      img_name = os.path.join(root, f"im_{i}.jpg")
      cv2.imwrite(img_name, np.zeros((64, 64, 3), np.uint8))
      cv2.imwrite(os.path.join(root, f"mask_im_{i}.png"), mask)
      frames.append({"file_path": img_name,
                     "transform_matrix": c2w.tolist()})
    import json
    with open(os.path.join(root, "calib.json"), "w") as fh:
      json.dump({"cam_mat": cam_mat.tolist(), "frames": frames}, fh)

    hull_cfg.root = root
    hull_cfg.num_voxels = 32
    hull_cfg.min_point = np.array([-0.5, -0.5, -0.5])
    hull_cfg.max_point = np.array([0.5, 0.5, 0.5])
    hull_cfg.threshold = 0.9
    mvh.cfg = hull_cfg
    mvh.main()

    with open(os.path.join(root, "mesh.pkl"), "rb") as fh:
      md = pickle.load(fh)
    data = np.asarray(md["data"]).reshape(32, 32, 32)
    assert data[16, 16, 16] > 1.3  # center carved as inside
    assert data[0, 0, 0] == 1.0
    occ_frac = np.mean(data > 1.1)
    ball_frac = 4 / 3 * np.pi * 0.3**3 / 1.0
    assert occ_frac == pytest.approx(ball_frac, rel=0.6)
  finally:
    sys.path.pop(0)
