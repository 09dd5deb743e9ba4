"""End-to-end CLI smoke: train a few steps, checkpoint, then eval.

Runs the actual train.py / eval.py drivers as subprocesses on a synthetic
scene (reference CLI surface: --data_dir --train_dir --config --gin_file
--stage), exercising config loading, dataset threading, the jitted train
step, checkpointing, stage surgery, and chunked rendering.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env["SAMPLENERFRO_FORCE_CPU"] = "1"
  env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
  env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
  env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
  return env


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
  root = tmp_path_factory.mktemp("scene")
  data_dir = fixtures.make_scene(str(root / "data"))
  cfg = fixtures.write_tiny_config(str(root / "cfg"))
  train_dir = str(root / "logs")
  return {"data": data_dir, "cfg": cfg, "train": train_dir}


def test_train_cli_smoke(scene):
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={scene['train']}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=radiance_smoke",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  stage_dir = os.path.join(scene["train"], "radiance_smoke")
  ckpts = [f for f in os.listdir(stage_dir) if f.startswith("checkpoint_")]
  assert ckpts, os.listdir(stage_dir)
  assert os.path.exists(os.path.join(stage_dir, "flags.yaml"))
  assert os.path.exists(os.path.join(stage_dir, "config.gin"))


def test_multi_dispatch_cli_matches_single(scene, tmp_path):
  """--steps_per_dispatch=3 reproduces the 3-single-step run's checkpoint.

  Same stage/config/seeds as test_train_cli_smoke but all three optimizer
  steps run inside ONE scanned dispatch; the resulting params must match
  the sequential run's checkpoint (same math, same rng chain).
  """
  base_dir = os.path.join(scene["train"], "radiance_smoke")
  assert any(f.startswith("checkpoint_") for f in os.listdir(base_dir)), (
      "baseline train smoke must run first")
  train_dir = str(tmp_path / "logs_k3")
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={train_dir}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=radiance_smoke",
      "--steps_per_dispatch=3", "--print_every=3", "--gc_every=3",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]

  from flax.training import checkpoints as flax_ckpt
  a = flax_ckpt.restore_checkpoint(base_dir, target=None)
  b = flax_ckpt.restore_checkpoint(
      os.path.join(train_dir, "radiance_smoke"), target=None)
  assert int(a["step"]) == int(b["step"]) == 3
  flat_a = jax.tree_util.tree_leaves_with_path(a["params"])
  flat_b = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(b["params"])}
  assert flat_a and len(flat_a) == len(flat_b)
  for k, va in flat_a:
    np.testing.assert_allclose(va, flat_b[jax.tree_util.keystr(k)],
                               rtol=1e-6, atol=1e-6,
                               err_msg=jax.tree_util.keystr(k))


def test_oow_fallback_cli_smoke(scene, tmp_path):
  """--march_oow_action=fallback steps down the rung ladder mid-training.

  A deliberately-too-small pinned window clamps on the first step; the
  loop must compile-probe a safer rung (calibrate.fallback_rungs), swap
  the train step, and finish training without crashing or cliff-dropping
  straight to scan.
  """
  train_dir = str(tmp_path / "logs_fallback")
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={train_dir}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=radiance_fb",
      "--batching=tile", "--tile_size=4", "--march_mode=tiled",
      "--march_window=1", "--march_refetch=8",
      "--march_oow_action=fallback",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  out = proc.stdout + proc.stderr
  assert "stepping down the marcher ladder" in out, out[-4000:]
  stage_dir = os.path.join(train_dir, "radiance_fb")
  assert any(f.startswith("checkpoint_") for f in os.listdir(stage_dir))


def test_eval_cli_smoke(scene):
  """Eval with the radiance-stage surgery pulling the just-trained ckpt."""
  cmd = [
      sys.executable, os.path.join(REPO, "eval.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={scene['train']}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=radiance_smoke",
      "--gin_param=Config.radiance_weight_name='radiance_smoke'",
      "--eval_once=True",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  out_dir = os.path.join(scene["train"], "radiance_smoke", "test_preds")
  assert os.path.exists(os.path.join(out_dir, "000.png"))
  assert os.path.exists(os.path.join(out_dir, "psnr.txt"))
  psnr = float(open(os.path.join(out_dir, "psnr.txt")).read())
  assert np.isfinite(psnr)


def test_ior_stage_cli_smoke(scene):
  """The ior stage trains from the Grid boundary dataset."""
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={scene['train']}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=ior_smoke",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  stage_dir = os.path.join(scene["train"], "ior_smoke")
  assert any(f.startswith("checkpoint_") for f in os.listdir(stage_dir))


def test_all_stage_cli_smoke(scene):
  """The joint stage trains (so3 refinement active in the march)."""
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={scene['train']}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=all",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]

  # Eval with the all-stage surgery.
  cmd = [
      sys.executable, os.path.join(REPO, "eval.py"),
      f"--data_dir={scene['data']}",
      f"--train_dir={scene['train']}",
      f"--config={scene['cfg']}",
      f"--gin_file={scene['cfg']}.gin",
      "--stage=all",
      "--eval_once=True",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  out_dir = os.path.join(scene["train"], "all", "test_preds")
  assert os.path.exists(os.path.join(out_dir, "psnr.txt"))


def test_opencv_real_pipeline_rehearsal(tmp_path):
  """The real-capture flow end-to-end (reference README.md:119-184).

  Synthesizes a calibrated OpenCV capture (images + masks + calib.json),
  carves the visual hull from the masks (calib/make_visual_hull.py), uses
  the hull mesh.pkl as the scene's IOR proxy, trains the radiance stage on
  the OpenCV dataset with the real-scene bd_cut double render active
  (rnerf/models.py:479-524, datasets.py:426-518), and evals one view —
  the seam the Blender-format smoke never crosses.
  """
  import importlib
  import pickle
  import shutil

  data_dir = fixtures.make_opencv_scene(str(tmp_path / "capture"))
  cfg_base = fixtures.write_opencv_config(str(tmp_path / "cfg"))
  train_dir = str(tmp_path / "logs")

  # 1) Visual hull from calib.json + masks (in-process, patched cfg —
  #    the tool's config module is a file the capture session edits).
  sys.path.insert(0, os.path.join(REPO, "calib"))
  try:
    import cfg as hull_cfg
    mvh = importlib.import_module("make_visual_hull")
    importlib.reload(mvh)
    hull_cfg.root = data_dir
    hull_cfg.num_voxels = 16
    hull_cfg.min_point = np.array([-0.8, 0.2, -0.8])
    hull_cfg.max_point = np.array([0.8, 1.8, 0.8])
    hull_cfg.threshold = 0.9
    mvh.cfg = hull_cfg
    mvh.main()
  finally:
    sys.path.pop(0)

  hull_dir = os.path.join(data_dir, "hull")
  os.makedirs(hull_dir)
  shutil.move(os.path.join(data_dir, "mesh.pkl"),
              os.path.join(hull_dir, "mesh.pkl"))
  with open(os.path.join(hull_dir, "mesh.pkl"), "rb") as f:
    hull = pickle.load(f)
  occ = np.asarray(hull["data"]).reshape(16, 16, 16)
  assert occ[8, 8, 8] > 1.3     # ball center carved as inside
  assert occ[0, 0, 0] == 1.0    # corner is free space

  # 2) Train the radiance stage on the OpenCV dataset + hull proxy.
  cmd = [
      sys.executable, os.path.join(REPO, "train.py"),
      f"--data_dir={data_dir}",
      f"--train_dir={train_dir}",
      f"--config={cfg_base}",
      f"--gin_file={cfg_base}.gin",
      "--stage=radiance_cv",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  stage_dir = os.path.join(train_dir, "radiance_cv")
  assert any(f.startswith("checkpoint_") for f in os.listdir(stage_dir))

  # 3) Eval one test view through the same bd_cut render path.
  cmd = [
      sys.executable, os.path.join(REPO, "eval.py"),
      f"--data_dir={data_dir}",
      f"--train_dir={train_dir}",
      f"--config={cfg_base}",
      f"--gin_file={cfg_base}.gin",
      "--stage=radiance_cv",
      "--gin_param=Config.radiance_weight_name='radiance_cv'",
      "--eval_once=True",
  ]
  proc = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                        timeout=900, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:]
  out_dir = os.path.join(train_dir, "radiance_cv", "test_preds")
  psnr = float(open(os.path.join(out_dir, "psnr.txt")).read())
  assert np.isfinite(psnr)
