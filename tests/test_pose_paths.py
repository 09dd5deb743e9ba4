"""Golden tests for the vectorized LLFF camera-path math.

Goldens in tests/golden/pose_paths/goldens.npz were captured from the
loop-based formulation (the canonical LLFF recipe the reference vendors at
rnerf/datasets.py:647-760) before the vectorized rework; these tests pin
the rework to those trajectories.
"""

import os

import numpy as np

from samplenerfro_tpu.data import pose_paths

GOLD = os.path.join(os.path.dirname(__file__), "golden", "pose_paths",
                    "goldens.npz")


def _load():
  return np.load(GOLD)


def test_recenter_matches_golden():
  g = _load()
  got = pose_paths.recenter_poses(g["poses"])
  np.testing.assert_allclose(got, g["recentered"], rtol=1e-5, atol=1e-5)


def test_spiral_matches_golden():
  g = _load()
  got = pose_paths.spiral_path(g["recentered"], g["bds"])
  assert got.shape == (120, 3, 4) and got.dtype == np.float32
  np.testing.assert_allclose(got, g["spiral"], rtol=1e-5, atol=1e-5)


def test_spherify_matches_golden():
  g = _load()
  poses_reset, render, bds_scaled = pose_paths.spherify_poses(
      g["recentered"], g["bds"])
  np.testing.assert_allclose(poses_reset, g["spherical_reset"],
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(render, g["spherical_render"],
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(bds_scaled, g["bds_after_spherify"],
                             rtol=1e-5, atol=1e-5)
  # No in-place mutation of the input bounds (reference quirk removed).
  np.testing.assert_allclose(g["bds"], _load()["bds"])


def test_recentered_average_is_identity():
  """After recentering, the average pose is the identity frame."""
  g = _load()
  avg = pose_paths.average_pose(pose_paths.recenter_poses(g["poses"]))
  np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-6)
  np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-6)


def test_spherified_cameras_on_unit_sphere():
  g = _load()
  poses_reset, render, _ = pose_paths.spherify_poses(
      g["recentered"], g["bds"])
  rms = np.sqrt(np.square(poses_reset[:, :3, 3]).sum(-1).mean())
  np.testing.assert_allclose(rms, 1.0, rtol=1e-6)
  # Orbit frames are orthonormal.
  rot = render[:, :3, :3]
  eye = np.einsum("nij,nik->njk", rot, rot)
  np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                             atol=1e-6)
