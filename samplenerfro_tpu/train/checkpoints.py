"""Checkpointing and staged-training parameter surgery.

Behavioral parity targets (reference SampleNeRFRO):
  - save/restore via flax.training.checkpoints with the same on-disk naming
    (checkpoint_<step> msgpack in the stage dir): train.py:322-329,424-427
  - staged checkpoint surgery (radiance ckpt -> radiance MLPs, ior/all ckpt
    -> path_sampler): eval.py:124-152

Param tree layout is kept compatible at the subtree level the surgery
operates on: params/{bkgd_mlp, coarse_mlp, fine_mlp, path_sampler}.
"""

import os
from os import path

import flax
import jax
from flax.training import checkpoints as flax_ckpt


def save_checkpoint(stage_dir, state, step, keep=100):
  """Host-0 checkpoint write from (replicated) state."""
  if jax.process_index() != 0:
    return
  state = jax.device_get(state)
  flax_ckpt.save_checkpoint(os.path.abspath(stage_dir), state, int(step),
                            keep=keep, overwrite=True)


def restore_checkpoint(stage_dir, state):
  """Resume from the latest checkpoint in stage_dir (or return state)."""
  return flax_ckpt.restore_checkpoint(os.path.abspath(stage_dir), state)


def latest_step(stage_dir):
  """Step of the newest checkpoint in the dir, or None."""
  latest = flax_ckpt.latest_checkpoint(os.path.abspath(stage_dir))
  if latest is None:
    return None
  return int(latest.rsplit("_", 1)[-1])


def is_reference_layout(ckpt):
  """True if `ckpt` is a reference-repo checkpoint (eval.py:124-152 layout).

  The reference stores TrainState.params = the whole variables dict, so its
  checkpoints have a double "params" nesting (ckpt["params"]["params"][...])
  and the so3 head under path_sampler/scan/idx_model/so3_mlp
  (rnerf/models.py:91-131, eikonal_utils.py:24, ior_utils.py:148).
  """
  try:
    inner = ckpt["params"]["params"]
  except (KeyError, TypeError):
    return False
  return isinstance(inner, dict) and (
      "coarse_mlp" in inner or "path_sampler" in inner)


def convert_reference_params(inner):
  """Convert a reference params/params subtree to this framework's layout.

  Input: ckpt["params"]["params"] from a reference checkpoint — subtrees
  {bkgd_mlp, coarse_mlp, fine_mlp, path_sampler/scan/idx_model/so3_mlp}.
  The radiance MLPs share our Dense_i naming (models/mlp.py mirrors
  rnerf/model_utils.py:30-140); the so3 head flattens to
  path_sampler/so3_mlp with the final layer renamed Dense_out
  (samplenerfro_tpu/ops/mlp.py layout).
  """
  out = {k: inner[k]
         for k in ("bkgd_mlp", "coarse_mlp", "fine_mlp") if k in inner}
  if "path_sampler" in inner:
    so3 = inner["path_sampler"]["scan"]["idx_model"]["so3_mlp"]
    idxs = sorted(int(k.split("_", 1)[1]) for k in so3)
    last = f"Dense_{idxs[-1]}"
    converted = {k: v for k, v in so3.items() if k != last}
    converted["Dense_out"] = so3[last]
    out["path_sampler"] = {"so3_mlp": converted}
  return out


def convert_reference_checkpoint(ckpt):
  """Reference checkpoint dict -> (step, params tree in our layout)."""
  return int(ckpt["step"]), convert_reference_params(ckpt["params"]["params"])


def export_reference_params(params):
  """Convert our params tree to the reference repo's layout.

  Inverse of convert_reference_params: the radiance MLPs copy through
  (shared Dense_i naming), and path_sampler/so3_mlp re-nests under
  path_sampler/scan/idx_model/so3_mlp with Dense_out renamed back to the
  last Dense_<i> (rnerf/models.py:91-131, ior_utils.py:148).
  """
  params = flax.core.unfreeze(params)
  out = {k: params[k]
         for k in ("bkgd_mlp", "coarse_mlp", "fine_mlp") if k in params}
  if "path_sampler" in params:
    so3 = dict(params["path_sampler"]["so3_mlp"])
    idxs = [int(k.split("_", 1)[1]) for k in so3 if k != "Dense_out"]
    so3[f"Dense_{max(idxs) + 1}"] = so3.pop("Dense_out")
    out["path_sampler"] = {"scan": {"idx_model": {"so3_mlp": so3}}}
  return out


def export_reference_checkpoint(out_dir, params, step, keep=100):
  """Write a reference-layout checkpoint the original code can consume.

  Produces checkpoint_<step> (flax msgpack) under out_dir with the
  double-"params" nesting the reference's eval surgery reads
  (eval.py:124-152: restore_checkpoint(..., None) then
  ckpt["params"]["params"][subtree]). Returns the file path.
  """
  ckpt = {"step": int(step),
          "params": {"params": export_reference_params(params)}}
  return flax_ckpt.save_checkpoint(
      os.path.abspath(out_dir), ckpt, int(step), keep=keep, overwrite=True)


def load_stage_variables(variables, train_dir, cfg, stage, num_fine_samples):
  """Merge pretrained stage checkpoints into a fresh variables tree.

  Mirrors eval.py:124-152 (note: our TrainState.params holds the params
  tree directly, so checkpoints have one less nesting level than the
  reference's state.params = whole-variables layout): radiance/ior stages
  pull the radiance MLPs from
  cfg.radiance_weight_name's checkpoint; the ior stage additionally pulls
  path_sampler from cfg.ior_weight_name; the all stage pulls everything
  from cfg.all_weight_name.

  Returns:
    (variables, step) with the merged params and the checkpoint step.
  """
  variables = flax.core.unfreeze(variables)

  def _restore(name):
    restored = flax_ckpt.restore_checkpoint(
        os.path.abspath(path.join(train_dir, name)), None)
    if restored is None:
      raise FileNotFoundError(
          f"no checkpoint found under {path.join(train_dir, name)}")
    if is_reference_layout(restored):
      # Reference-trained weights: convert on the fly so stage surgery and
      # eval work directly against checkpoints produced by the original code.
      step, params = convert_reference_checkpoint(restored)
      return {"step": step, "params": params}
    return restored

  if stage.startswith("radiance") or stage.startswith("ior"):
    pretrain = _restore(cfg.radiance_weight_name)
    step = int(pretrain["step"])
    src = pretrain["params"]
    variables["params"]["bkgd_mlp"] = src["bkgd_mlp"]
    variables["params"]["coarse_mlp"] = src["coarse_mlp"]
    if num_fine_samples > 0:
      variables["params"]["fine_mlp"] = src["fine_mlp"]
    if stage.startswith("ior"):
      pretrain = _restore(cfg.ior_weight_name)
      step = int(pretrain["step"])
      variables["params"]["path_sampler"] = (
          pretrain["params"]["path_sampler"])
  elif stage.startswith("all"):
    pretrain = _restore(cfg.all_weight_name)
    step = int(pretrain["step"])
    src = pretrain["params"]
    variables["params"]["bkgd_mlp"] = src["bkgd_mlp"]
    variables["params"]["coarse_mlp"] = src["coarse_mlp"]
    if num_fine_samples > 0:
      variables["params"]["fine_mlp"] = src["fine_mlp"]
    variables["params"]["path_sampler"] = src["path_sampler"]
  else:
    raise ValueError(f"unknown stage {stage}")

  return flax.core.freeze(variables), step
