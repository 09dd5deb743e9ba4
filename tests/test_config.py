"""Tests for the flag/YAML/gin-lite config system."""

import os

import pytest

from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import gin_lite


def test_gin_lite_parses_reference_syntax(tmp_path):
  f = tmp_path / "t.gin"
  f.write_text("""
# comment line
VoxMLP.interp_method = 'linear3'  # trailing comment
VoxMLP.use_direct_output = True
Config.kernel_size = 9
Config.kernel_sigma = 3.0
Config.radiance_weight_name = None
NerfModel.bd_cut_dist = 6.0
PathSampler.normal_radius_scale = 0.1
""")
  b = gin_lite.parse_files_and_bindings([str(f)])
  assert b["VoxMLP.interp_method"] == "linear3"
  assert b["VoxMLP.use_direct_output"] is True
  assert b["Config.kernel_size"] == 9
  assert b["Config.kernel_sigma"] == 3.0
  assert b["Config.radiance_weight_name"] is None
  assert b["NerfModel.bd_cut_dist"] == 6.0


def test_gin_lite_param_overrides(tmp_path):
  f = tmp_path / "t.gin"
  f.write_text("Config.kernel_size = 3\n")
  b = gin_lite.parse_files_and_bindings(
      [str(f)], ["Config.kernel_size = 7",
                 "Config.radiance_weight_name='radiance_x'"])
  assert b["Config.kernel_size"] == 7
  assert b["Config.radiance_weight_name"] == "radiance_x"


def test_gin_lite_rejects_malformed():
  with pytest.raises(ValueError):
    gin_lite.parse_line("not a binding")
  with pytest.raises(ValueError):
    gin_lite.parse_line("Config.kernel_size = foo(")


def test_gin_lite_preserves_hash_in_strings():
  k, v = gin_lite.parse_line("Config.voxel_grid = 'a#b'  # comment")
  assert v == "a#b"


def test_config_from_gin_accepts_none():
  cfg = config_lib.Config.from_gin({"Config.radiance_weight_name": None,
                                    "Config.kernel_size": 5})
  assert cfg.radiance_weight_name is None
  assert cfg.kernel_size == 5
  assert cfg.voxel_grid == "voxelize"


def test_all_scene_configs_parse():
  """Every shipped gin/yaml config parses cleanly."""
  import yaml
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  cfg_dir = os.path.join(repo, "configs")
  names = {os.path.splitext(f)[0] for f in os.listdir(cfg_dir)
           if os.path.isfile(os.path.join(cfg_dir, f))}
  assert len(names) == 9
  for name in names:
    with open(os.path.join(cfg_dir, name + ".yaml")) as f:
      y = yaml.load(f, Loader=yaml.FullLoader)
    assert y["batch_size"] == 1024
    assert y["num_coarse_samples"] == 64
    b = gin_lite.parse_files_and_bindings(
        [os.path.join(cfg_dir, name + ".gin")])
    assert b["VoxMLP.interp_method"] == "linear3"
    cfg = config_lib.Config.from_gin(b)
    assert cfg.kernel_size >= 0


def test_tpu_scene_configs_parse():
  """Each generated TPU variant keeps the scene values + TPU overrides."""
  import yaml
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  cfg_dir = os.path.join(repo, "configs")
  tpu_dir = os.path.join(cfg_dir, "tpu")
  names = sorted(os.path.splitext(f)[0] for f in os.listdir(tpu_dir)
                 if f.endswith(".yaml"))
  assert len(names) == 9
  for name in names:
    with open(os.path.join(tpu_dir, name + ".yaml")) as f:
      y = yaml.load(f, Loader=yaml.FullLoader)
    with open(os.path.join(cfg_dir, name + ".yaml")) as f:
      base = yaml.load(f, Loader=yaml.FullLoader)
    assert y["batching"] == "tile"
    assert y["march_mode"] == "pallas"
    assert y["march_window"] == 0
    assert y["mlp_dtype"] == "bfloat16"
    for key, val in base.items():
      if key not in ("batching",):
        assert y[key] == val, (name, key)
    b = gin_lite.parse_files_and_bindings(
        [os.path.join(tpu_dir, name + ".gin")])
    assert b["VoxMLP.interp_method"] == "linear3"


def test_refractive_rescale_rule():
  from samplenerfro_tpu.utils import grid_io
  assert grid_io.refractive_rescale_factor("configs/glass") == 0.33
  assert grid_io.refractive_rescale_factor("configs/dolphin") == 0.33
  assert grid_io.refractive_rescale_factor(
      "configs/ship_skydome-bkgd_no-partial-reflect_cycles") == 0.5
  assert grid_io.refractive_rescale_factor(
      "configs/torus_skydome-bkgd_cycles") == 0.33
  assert grid_io.refractive_rescale_factor(None) == 0.5


def test_update_flags_cli_wins_over_yaml(tmp_path):
  """Explicit CLI flags beat the yaml overlay; unset flags take yaml values.

  Regression: the yaml used to clobber everything, which made
  `--config=scene --max_steps=<extended>` a silent no-op — the +10k
  all-stage flow (validate_quality.py --all_steps) trained ZERO steps.
  """
  from absl import flags as absl_flags
  fv = absl_flags.FlagValues()
  absl_flags.DEFINE_integer("max_steps", 100, "", flag_values=fv)
  absl_flags.DEFINE_integer("batch_size", 1, "", flag_values=fv)
  absl_flags.DEFINE_string("config", None, "", flag_values=fv)
  (tmp_path / "scene.yaml").write_text("max_steps: 2000\nbatch_size: 64\n")
  fv(["prog", f"--config={tmp_path}/scene", "--max_steps=12000"])
  config_lib.update_flags(fv)
  assert fv.max_steps == 12000  # explicitly passed: CLI wins
  assert fv.batch_size == 64    # not passed: yaml overlay applies
  # Later programmatic assignment still works (no __dict__ shadowing).
  fv.batch_size = 128
  assert fv.batch_size == 128


def test_update_flags_namespace_fallback(tmp_path):
  """Plain-namespace args (tests/tools) still take every yaml value."""
  import types
  args = types.SimpleNamespace(max_steps=100, batch_size=1,
                               config=str(tmp_path / "scene"))
  (tmp_path / "scene.yaml").write_text("max_steps: 2000\nbatch_size: 64\n")
  config_lib.update_flags(args)
  assert args.max_steps == 2000 and args.batch_size == 64
