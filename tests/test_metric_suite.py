"""Tests for the offline metric suite (FLIP, SSIM, summary CLI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "metric"))

import flip as flip_lib  # noqa: E402
import ssim as ssim_lib  # noqa: E402

PPD = 0.3 * (400 / 0.5) * (np.pi / 180)


def test_flip_identical_images_zero():
  rng = np.random.RandomState(0)
  a = rng.rand(3, 48, 48).astype(np.float32)
  err = flip_lib.compute_ldrflip(a, a.copy(), PPD)
  assert float(np.max(err)) < 1e-5


def test_flip_monotone_with_perturbation():
  rng = np.random.RandomState(1)
  a = rng.rand(3, 48, 48).astype(np.float32)
  small = np.clip(a + rng.randn(3, 48, 48).astype(np.float32) * 0.02, 0, 1)
  big = np.clip(a + rng.randn(3, 48, 48).astype(np.float32) * 0.3, 0, 1)
  e_small = float(np.mean(flip_lib.compute_ldrflip(a, small, PPD)))
  e_big = float(np.mean(flip_lib.compute_ldrflip(a, big, PPD)))
  assert 0 < e_small < e_big <= 1.0


def test_flip_inverted_image_near_max():
  """Black vs white: large perceptual error."""
  black = np.zeros((3, 32, 32), np.float32)
  white = np.ones((3, 32, 32), np.float32)
  err = flip_lib.compute_ldrflip(black, white, PPD)
  assert float(np.mean(err)) > 0.8


def test_flip_color_transform_roundtrip():
  rng = np.random.RandomState(2)
  rgb = rng.rand(3, 8, 8).astype(np.float32)
  ycxcz = flip_lib.color_space_transform(rgb, "srgb2ycxcz")
  back = flip_lib.color_space_transform(
      flip_lib.color_space_transform(ycxcz, "ycxcz2linrgb"), "linrgb2srgb")
  np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_torch_ssim_matches_jax_ssim():
  import torch
  from samplenerfro_tpu.utils import metrics as jax_metrics
  import jax.numpy as jnp

  rng = np.random.RandomState(3)
  a = rng.rand(64, 64, 3).astype(np.float32)
  b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.05, 0, 1)
  jax_val = float(jax_metrics.compute_ssim(
      jnp.asarray(a), jnp.asarray(b), max_val=1.0))
  t_a = torch.FloatTensor(a).permute(2, 0, 1)[None]
  t_b = torch.FloatTensor(b).permute(2, 0, 1)[None]
  torch_val, torch_map = ssim_lib.SSIM(data_range=1.0)(t_a, t_b)
  assert abs(float(torch_val) - jax_val) < 1e-3
  assert torch_map.shape[-2:] == (64 - 10, 64 - 10)
  assert torch_map.shape[1] == 1


def test_magma_errmap_helpers():
  cmap = flip_lib.get_magma_map()
  assert cmap.shape == (3, 256)
  img = flip_lib.index2color(np.array([[0, 255]]), cmap)
  assert img.shape == (3, 1, 2)
  hwc = flip_lib.CHWtoHWC(img)
  assert hwc.shape == (1, 2, 3)


def test_summary_cli(tmp_path):
  """summary.py end-to-end on a tiny synthetic scene layout."""
  from PIL import Image
  rng = np.random.RandomState(4)
  scene = "toy"
  data_dir = tmp_path / "data"
  log_dir = tmp_path / "logs"
  scene_dir = data_dir / scene
  (scene_dir / "test").mkdir(parents=True)
  method = "radiance_toy"
  preds = log_dir / scene / method / "test_preds"
  preds.mkdir(parents=True)

  frames = []
  for i in range(2):
    gt = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    Image.fromarray(gt).save(scene_dir / "test" / f"r_{i}.png")
    noisy = np.clip(gt + rng.randn(64, 64, 3) * 10, 0, 255).astype(np.uint8)
    Image.fromarray(noisy).save(preds / f"{i:03d}.png")
    frames.append({"file_path": f"test/r_{i}",
                   "transform_matrix": np.eye(4).tolist()})
  with open(scene_dir / "transforms_test.json", "w") as f:
    json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

  cmd = [
      sys.executable, os.path.join(REPO, "metric", "summary.py"),
      f"--log_dir={log_dir}", f"--data_dir={data_dir}",
      f"--method={method}", "--scenes", scene, "--no-half",
  ]
  proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                        cwd=os.path.join(REPO, "metric"))
  assert proc.returncode == 0, proc.stderr[-2000:]
  result = (preds / "result.txt").read_text()
  vals = result.split()
  psnr = float(vals[0])
  assert 20 < psnr < 40
  assert (preds / "metric_list.txt").exists()
  assert (preds / "errmap" / "flip_000.png").exists()
  assert (preds / "errmap" / "frame" / "frame_000.png").exists()


def _random_lpips_weight_file(path, rng):
  import torch
  import lpips_torch
  net = lpips_torch.AlexNetFeatures()
  convs = {k: torch.tensor(rng.randn(*v.shape).astype(np.float32)) * 0.05
           for k, v in net.state_dict().items()}
  lin = [torch.tensor(np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
         for c in lpips_torch.CHANNELS]
  torch.save({"alexnet": convs, "lin": lin}, path)


def test_lpips_torch_identity_and_spatial(tmp_path):
  import torch
  import lpips_torch
  rng = np.random.RandomState(0)
  wpath = tmp_path / "lpips_alex.pth"
  _random_lpips_weight_file(wpath, rng)

  model = lpips_torch.load_lpips(spatial=False, path=str(wpath))
  model_sp = lpips_torch.load_lpips(spatial=True, path=str(wpath))
  assert model is not None and model_sp is not None

  img0 = torch.tensor(rng.rand(1, 3, 64, 64).astype(np.float32))
  noise = torch.tensor(rng.randn(1, 3, 64, 64).astype(np.float32))

  d_same = model(img0, img0, normalize=True).item()
  assert d_same == 0.0
  d_small = model(img0, (img0 + 0.05 * noise).clamp(0, 1),
                  normalize=True).item()
  d_big = model(img0, (img0 + 0.5 * noise).clamp(0, 1),
                normalize=True).item()
  assert 0 < d_small < d_big

  emap = model_sp(img0, (img0 + 0.2 * noise).clamp(0, 1), normalize=True)
  assert emap.shape == (1, 1, 64, 64)
  assert abs(emap.mean().item()
             - model(img0, (img0 + 0.2 * noise).clamp(0, 1),
                     normalize=True).item()) < 0.05


def test_lpips_missing_weights_returns_none(tmp_path):
  import lpips_torch
  assert lpips_torch.load_lpips(path=str(tmp_path / "absent.pth")) is None


def test_lpips_real_weights_end_to_end():
  """Validates the CALIBRATED metric the moment a real weight file exists.

  This zero-egress box cannot produce lpips_alex.pth (the reference's
  metric/summary.py:115-117 downloads it at import); the converter
  (scripts/convert_lpips_weights.py) runs on any machine with egress.
  Skipped-not-failed until then — drop the file at $LPIPS_WEIGHTS (or
  metric/weights/lpips_alex.pth) and this test certifies the published
  AlexNet-LPIPS behaviors end-to-end with no new work.
  """
  import lpips_torch
  wpath = lpips_torch.default_weight_path()
  if not os.path.exists(wpath):
    pytest.skip(f"no real LPIPS weight file at {wpath} "
                "(zero-egress; see scripts/convert_lpips_weights.py)")
  import torch
  import summary as summary_lib

  model = lpips_torch.load_lpips(spatial=False)
  model_sp = lpips_torch.load_lpips(spatial=True)
  rng = np.random.RandomState(7)
  img = torch.tensor(rng.rand(1, 3, 64, 64).astype(np.float32))
  noise = torch.tensor(rng.randn(1, 3, 64, 64).astype(np.float32))

  assert model(img, img, normalize=True).item() == 0.0
  a, b = img, (img + 0.3 * noise).clamp(0, 1)
  d_ab = model(a, b, normalize=True).item()
  d_ba = model(b, a, normalize=True).item()
  assert abs(d_ab - d_ba) < 1e-6          # symmetric
  d_small = model(img, (img + 0.05 * noise).clamp(0, 1),
                  normalize=True).item()
  assert 0 < d_small < d_ab               # monotone in perturbation
  assert d_ab < 2.0                       # calibrated scale, not random

  # Through the summary-protocol entry point (errmap + scalar).
  err, emap = summary_lib.compute_lpips(model, model_sp, a, b)
  assert err == pytest.approx(d_ab, abs=1e-6)
  assert np.asarray(emap).shape[-2:] == (64, 64)
