"""Tests for checkpointing and staged-surgery parameter loading."""

import os

import jax
import numpy as np
from flax.training.train_state import TrainState
from jax import random

from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from tests import helpers


def _make_state(args):
  ndim, nmin, nmax, grid = helpers.make_grid()
  rays = helpers.make_rays()
  model, variables = construct_nerf(
      random.PRNGKey(0), {"rays": rays}, args, ndim, nmin, nmax, grid)
  tx, _, _ = step_lib.create_optimizer(args)
  state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                            tx=tx)
  return model, variables, state


def test_save_restore_roundtrip(tmp_path):
  args = helpers.tiny_args()
  _, _, state = _make_state(args)
  stage_dir = str(tmp_path / "radiance_x")
  os.makedirs(stage_dir)
  state = state.replace(step=7)
  ckpt_lib.save_checkpoint(stage_dir, state, 7)
  assert ckpt_lib.latest_step(stage_dir) == 7

  _, _, fresh = _make_state(args)
  restored = ckpt_lib.restore_checkpoint(stage_dir, fresh)
  assert int(restored.step) == 7
  np.testing.assert_allclose(
      np.array(state.params["coarse_mlp"]["Dense_0"]["kernel"]),
      np.array(restored.params["coarse_mlp"]["Dense_0"]["kernel"]))


def test_stage_surgery_radiance_and_all(tmp_path):
  """Radiance ckpt feeds the MLPs; 'all' ckpt feeds everything."""
  args = helpers.tiny_args()
  _, variables, state = _make_state(args)

  # Save a "radiance" checkpoint with recognizable params.
  bumped = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
  rad_dir = str(tmp_path / "radiance_y")
  all_dir = str(tmp_path / "all")
  os.makedirs(rad_dir)
  os.makedirs(all_dir)
  ckpt_lib.save_checkpoint(rad_dir, state.replace(params=bumped, step=11), 11)
  ckpt_lib.save_checkpoint(all_dir, state.replace(params=bumped, step=13), 13)

  cfg = config_lib.Config(radiance_weight_name="radiance_y",
                          all_weight_name="all")

  merged, step = ckpt_lib.load_stage_variables(
      dict(variables), str(tmp_path), cfg, "radiance_y",
      args.num_fine_samples)
  assert step == 11
  # MLPs updated (+1), path_sampler untouched.
  np.testing.assert_allclose(
      np.array(merged["params"]["coarse_mlp"]["Dense_0"]["kernel"]),
      np.array(variables["params"]["coarse_mlp"]["Dense_0"]["kernel"]) + 1.0)
  np.testing.assert_allclose(
      np.array(merged["params"]["path_sampler"]["so3_mlp"]["Dense_0"]
               ["kernel"]),
      np.array(variables["params"]["path_sampler"]["so3_mlp"]["Dense_0"]
               ["kernel"]))

  merged_all, step = ckpt_lib.load_stage_variables(
      dict(variables), str(tmp_path), cfg, "all", args.num_fine_samples)
  assert step == 13
  np.testing.assert_allclose(
      np.array(merged_all["params"]["path_sampler"]["so3_mlp"]["Dense_0"]
               ["kernel"]),
      np.array(variables["params"]["path_sampler"]["so3_mlp"]["Dense_0"]
               ["kernel"]) + 1.0)


def test_export_reference_roundtrip(tmp_path):
  """Export-to-reference-layout is the exact inverse of the importer.

  The exported file must (a) satisfy is_reference_layout, (b) support the
  reference eval surgery's access pattern (eval.py:124-152:
  ckpt["params"]["params"][subtree]), and (c) round-trip through
  convert_reference_checkpoint to the original params bit-exactly.
  """
  from flax.training import checkpoints as flax_ckpt

  args = helpers.tiny_args()
  _, _, state = _make_state(args)
  out_dir = str(tmp_path / "export")
  os.makedirs(out_dir)
  ckpt_lib.export_reference_checkpoint(out_dir, state.params, 42)

  restored = flax_ckpt.restore_checkpoint(out_dir, None)
  assert ckpt_lib.is_reference_layout(restored)
  inner = restored["params"]["params"]
  assert int(restored["step"]) == 42
  # Reference surgery access pattern: the so3 head lives under
  # path_sampler/scan/idx_model/so3_mlp with contiguous Dense_<i> names
  # (no Dense_out).
  so3 = inner["path_sampler"]["scan"]["idx_model"]["so3_mlp"]
  idxs = sorted(int(k.split("_", 1)[1]) for k in so3)
  assert idxs == list(range(len(idxs))) and "Dense_out" not in so3

  step, params = ckpt_lib.convert_reference_checkpoint(restored)
  assert step == 42
  flat_orig = jax.tree_util.tree_leaves_with_path(
      jax.tree_util.tree_map(np.asarray, dict(state.params)))
  flat_rt = dict(jax.tree_util.tree_leaves_with_path(params))
  assert len(flat_orig) == len(flat_rt)
  for path_key, leaf in flat_orig:
    np.testing.assert_array_equal(leaf, flat_rt[path_key])


def test_surgery_merged_params_usable(tmp_path):
  """Surgery output still runs a forward pass (structure intact)."""
  args = helpers.tiny_args()
  model, variables, state = _make_state(args)
  rad_dir = str(tmp_path / "radiance_z")
  os.makedirs(rad_dir)
  ckpt_lib.save_checkpoint(rad_dir, state, 3)
  cfg = config_lib.Config(radiance_weight_name="radiance_z")
  merged, _ = ckpt_lib.load_stage_variables(
      dict(variables), str(tmp_path), cfg, "radiance_z",
      args.num_fine_samples)
  rays = helpers.make_rays()
  ret, _ = model.apply(
      {"params": merged["params"], "grid": variables["grid"]},
      random.PRNGKey(1), random.PRNGKey(2), rays, False)
  assert np.all(np.isfinite(np.array(ret[-1][0])))
