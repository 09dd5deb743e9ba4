"""Single jit-compiled train step, losses, and optimizer assembly.

Behavioral parity targets (reference SampleNeRFRO):
  - loss assembly + Stats: train.py:58-183, rnerf/utils.py:47-64
  - staged optimizer (multi_transform trainability masks): train.py:286-317
  - LR schedules: train.py:270-284

TPU design: one jax.jit train step over a Mesh-sharded ray batch with
replicated params. Reductions (loss means, gradient averaging) become global
automatically under GSPMD — there are no explicit pmean/all_gather calls.
The annealing_rate multiplier is hard-coded to 0.0 exactly as shipped
(train.py:156), which gates sparsity/beta/normal losses off; the live terms
are MSE + coarse MSE + bg boundary + bg smoothness + weight decay.
"""

import functools

import flax
import jax
import jax.numpy as jnp
import optax
from jax import random

from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.utils import metrics


@flax.struct.dataclass
class Stats:
  loss: float
  psnr: float
  loss_c: float
  psnr_c: float
  weight_l2: float
  loss_nrm: float
  loss_sp: float
  annealing_rate: float
  loss_bg: float
  loss_bg_c: float
  loss_bg_smooth: float
  coarse_alpha_target: float
  fine_alpha_target: float
  # Tiled-marcher out-of-window clamp count for this step (0 == the march
  # was exact; always 0 under the scan marcher). Surfaced so training on
  # divergent bundles can't silently clamp interpolations.
  march_oow: int = 0


def param_labels_for_stage(stage, num_fine_samples):
  """Trainable-subtree labels per stage (train.py:286-310)."""
  if stage.startswith("radiance"):
    labels = {"path_sampler": "zero",
              "bkgd_mlp": "adam_lr_scheduler",
              "coarse_mlp": "adam_lr_scheduler"}
    if num_fine_samples > 0:
      labels["fine_mlp"] = "adam_lr_scheduler"
  elif stage.startswith("ior"):
    labels = {"path_sampler": "adam_lr_scheduler",
              "bkgd_mlp": "zero",
              "coarse_mlp": "zero",
              "fine_mlp": "zero"}
  elif stage.startswith("all"):
    labels = {"path_sampler": "adam_lr_scheduler",
              "bkgd_mlp": "adam_lr_scheduler",
              "coarse_mlp": "adam_lr_scheduler"}
    if num_fine_samples > 0:
      labels["fine_mlp"] = "adam_lr_scheduler"
  else:
    raise ValueError(f"unknown stage {stage}")
  return labels


def create_optimizer(args):
  """optax.multi_transform over stage-dependent param groups."""
  learning_rate_fn = functools.partial(
      math_ops.learning_rate_decay,
      lr_init=args.lr_init,
      lr_final=args.lr_final,
      max_steps=args.max_steps,
      lr_delay_steps=args.lr_delay_steps,
      lr_delay_mult=args.lr_delay_mult)
  learning_rate_fn1 = functools.partial(
      math_ops.learning_rate_decay,
      lr_init=args.lr_init,
      lr_final=args.lr_final,
      max_steps=args.max_steps,
      lr_start_steps=args.anneal_delay_steps,
      lr_delay_steps=0,
      lr_delay_mult=args.lr_delay_mult)
  labels = param_labels_for_stage(args.stage, args.num_fine_samples)
  tx = optax.multi_transform(
      {"adam": optax.adam(learning_rate=args.lr_init),
       "adam_lr_scheduler": optax.adam(learning_rate=learning_rate_fn),
       "adam_lr_scheduler1": optax.adam(learning_rate=learning_rate_fn1),
       "zero": optax.set_to_zero()},
      labels)
  return tx, learning_rate_fn, learning_rate_fn1


def _tree_weight_l2(params):
  """Mean-square of all params (train.py:147-153)."""
  sum_sq = jax.tree_util.tree_reduce(
      lambda x, y: x + jnp.sum(y**2), params, initializer=0.0)
  count = jax.tree_util.tree_reduce(
      lambda x, y: x + y.size, params, initializer=0)
  return sum_sq / count


def make_loss_fn(model, args):
  """Build the per-stage loss closure (train.py:75-162).

  The (multi-GB at flagship resolution) IOR grid arrives as a runtime
  argument: closing over device arrays would bake them into the compiled
  executable as literal constants.
  """
  stage = args.stage

  def loss_fn(params, grid_vars, key_0, key_1, key_nrm, batch):
    variables = {"params": params, **grid_vars}
    annealed_alpha = batch["annealed_alpha"]
    beta0 = 1.0
    beta1 = 1.0

    march_oow = jnp.int32(0)
    if stage.startswith("radiance") or stage.startswith("all"):
      rays = batch["rays"]
      (ret, loss_sp), aux = model.apply(variables, key_0, key_1, rays,
                                        args.randomized, annealed_alpha,
                                        mutable=["diagnostics"])
      diag = aux.get("diagnostics", {}).get("path_sampler", {})
      vals = diag.get("march_oow", ())
      if not isinstance(vals, (tuple, list)):
        vals = (vals,)  # sow with reduce_fn stores the reduced value
      for v in vals:
        march_oow = march_oow + v
      if len(ret) not in (1, 2):
        raise ValueError("ret should contain 1 (coarse) or 2 (coarse+fine) "
                         "sets of outputs.")
      rgb, _, _, trans, trans_rgb_bkgd = ret[-1]
      loss = ((rgb - batch["pixels"][..., :3])**2).mean()
      if args.bg_weight > 0:
        mask_bg = trans > 0.5
        loss_bg = ((annealed_alpha > 0)
                   * (mask_bg * jnp.abs(trans_rgb_bkgd
                                        - batch["pixels"][..., :3])).sum()
                   / (jnp.sum(mask_bg) + 1))
      else:
        loss_bg = 0.0
      if args.beta_weight > 0:
        loss_b = (beta0 * math_ops.safe_log(trans)
                  + beta1 * math_ops.safe_log(1 - trans)).mean()
      else:
        loss_b = 0.0
      psnr = metrics.compute_psnr(loss)
      if len(ret) > 1:
        rgb_c, _, _, _, _ = ret[0]
        loss_c = ((rgb_c - batch["pixels"][..., :3])**2).mean()
        psnr_c = metrics.compute_psnr(loss_c)
      else:
        loss_c, psnr_c = 0.0, 0.0
      loss_bg_c, loss_b_c = 0.0, 0.0

      if (not args.use_online_sparsity) and args.sparsity_weight > 0:
        loss_sp, next_cat, next_fat = model.apply(
            variables, batch["pts"], batch["coarse_alpha_target"],
            batch["fine_alpha_target"], method=model.compute_sparsity_loss)
      else:
        next_cat, next_fat = 0.0, 0.0

      if stage.startswith("all") and (
          args.normal_loss_weight + args.normal_smooth_weight) > 0:
        normal_loss, normal_smooth = model.apply(
            variables, batch["pts"], batch["grads"], annealed_alpha, key_nrm,
            method=model.wrapper_compute_normal_loss_and_smooth)
        loss_nrm = (args.normal_loss_weight * normal_loss
                    + args.normal_smooth_weight * normal_smooth)
      else:
        loss_nrm = 0.0

      if args.bg_smooth_weight > 0:
        ps = batch["env_rays"].viewdirs.shape[0]
        rgb_env = model.apply(
            variables, batch["env_rays"].viewdirs.reshape(-1, 3),
            method=model.forward_envmap).reshape(ps, ps, -1)
        loss_bg_smooth = (annealed_alpha > 0) * jnp.mean(
            0.5 * ((rgb_env[1:, :] - rgb_env[:-1, :])**2).reshape(-1)
            + 0.5 * ((rgb_env[:, 1:] - rgb_env[:, :-1])**2).reshape(-1))
      else:
        loss_bg_smooth = 0.0
    elif stage.startswith("ior"):
      normal_loss, normal_smooth = model.apply(
          variables, batch["pts"], batch["grads"], annealed_alpha, key_nrm,
          method=model.wrapper_compute_normal_loss_and_smooth)
      loss_nrm = normal_loss
      del normal_smooth
      loss = psnr = loss_c = psnr_c = loss_sp = 0.0
      loss_b = loss_b_c = loss_bg = loss_bg_c = loss_bg_smooth = 0.0
      next_cat = next_fat = 0.0
    else:
      raise ValueError(f"unknown stage {stage}")

    weight_l2 = _tree_weight_l2(params)

    # Shipped behavior: the annealing gate is 0.0, disabling the
    # sparsity/beta/normal terms (train.py:155-156).
    annealing_rate = 0.0
    stats = Stats(
        loss=loss, psnr=psnr, loss_c=loss_c, psnr_c=psnr_c,
        weight_l2=weight_l2,
        loss_sp=(args.sparsity_weight * annealing_rate * loss_sp
                 + args.beta_weight * annealing_rate * (loss_b + loss_b_c)),
        loss_nrm=annealing_rate * loss_nrm,
        annealing_rate=annealed_alpha,
        coarse_alpha_target=next_cat,
        fine_alpha_target=next_fat,
        loss_bg=args.bg_weight * loss_bg,
        loss_bg_c=args.bg_weight * loss_bg_c,
        loss_bg_smooth=loss_bg_smooth,
        march_oow=march_oow)
    total = (loss + loss_c
             + args.bg_weight * (loss_bg + loss_bg_c)
             + args.sparsity_weight * annealing_rate * loss_sp
             + args.beta_weight * annealing_rate * (loss_b + loss_b_c)
             + annealing_rate * loss_nrm
             + args.bg_smooth_weight * loss_bg_smooth
             + args.weight_decay_mult * weight_l2)
    return total, stats

  return loss_fn


def _make_step_body(model, args):
  """The un-jitted step body: (rng, state, batch, grid) -> (state, stats, rng).

  Shared between the single-step dispatch and the scanned multi-step
  dispatch; the rng evolution (one 4-way split per step) is identical in
  both, so K scanned steps reproduce K sequential dispatches bitwise.
  """
  loss_fn = make_loss_fn(model, args)

  def train_step(rng, state, batch, grid):
    rng, key_0, key_1, key_nrm = random.split(rng, 4)

    (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, grid, key_0, key_1, key_nrm, batch)

    if args.grad_max_val > 0:
      clip_fn = lambda z: jnp.clip(z, -args.grad_max_val, args.grad_max_val)
      grads = jax.tree_util.tree_map(clip_fn, grads)
    if args.grad_max_norm > 0:
      grad_norm = jnp.sqrt(jax.tree_util.tree_reduce(
          lambda x, y: x + jnp.sum(y**2), grads, initializer=0.0))
      mult = jnp.minimum(1, args.grad_max_norm / (1e-7 + grad_norm))
      grads = jax.tree_util.tree_map(lambda z: mult * z, grads)

    new_state = state.apply_gradients(grads=grads)
    return new_state, stats, rng

  return train_step


def make_train_step(model, args, grid_vars, donate=True):
  """Build the jitted train step: (rng, state, batch) -> (state, stats, rng).

  grid_vars is threaded into the jitted function as an argument (not a
  closure): captured device arrays become HLO constants, which at 384^3/
  512^3 grid resolution means a multi-GB executable.
  """
  train_step = _make_step_body(model, args)
  jitted = jax.jit(train_step, donate_argnums=(1,) if donate else ())
  return lambda rng, state, batch: jitted(rng, state, batch, grid_vars)


def make_train_step_multi(model, args, grid_vars, donate=True):
  """Jitted K-step dispatch: (rng, state, stacked_batch) -> (state, stats, rng).

  The batch pytree carries a leading step axis (any K; the scan length is
  baked from the shape at trace time), and the returned Stats leaves are
  [K] per-step values. One dispatch runs K optimizer steps in a lax.scan,
  amortizing the per-call host dispatch overhead (the dominant train-loop
  cost through a remote-TPU tunnel, and a real tail cost on local chips:
  the reference pays it per step via pmap, train.py:333-341). The rng
  chain matches K sequential single-step dispatches bitwise.
  """
  train_step = _make_step_body(model, args)

  def multi_step(rng, state, batch, grid):
    def body(carry, b):
      rng, state = carry
      state, stats, rng = train_step(rng, state, b, grid)
      return (rng, state), stats

    (rng, state), stats = jax.lax.scan(body, (rng, state), batch)
    return state, stats, rng

  jitted = jax.jit(multi_step, donate_argnums=(1,) if donate else ())
  return lambda rng, state, batch: jitted(rng, state, batch, grid_vars)


def make_repair_fns(model, args, grid_vars, mesh=None):
  """Escalation ladder of repair renderers for render_image.

  Chunks the production windowed marcher clamps (bundles that outdrift
  every calibrated window) re-render through this ladder so full-image
  renders are ALWAYS exact. The default ladder is just the window-free
  scan marcher (never clamps).

  MARCH_REPAIR_WINDOW=<w> (with MARCH_REPAIR_REFETCH, default 8) prepends
  an XLA windowed-marcher stage at that window with march_interp=highest
  (bit-exact to scan when clamp-free). Measured NEGATIVE at the 512^3
  eval bench and therefore default-off: the XLA windowed marcher's
  per-refetch window slices go through XLA's serialized-gather path, so
  w64/r2 repaired the same 49 chunks at 1005 s/frame vs 36 s for scan —
  25x SLOWER. The scan fallback and a shorter-refetch pallas calibration
  ladder are the production repair strategy.

  Returns None for non-windowed march modes.
  """
  if getattr(model, "march_mode", "scan") not in ("tiled", "pallas"):
    return None
  import os
  fns = []
  wide_w = int(os.environ.get("MARCH_REPAIR_WINDOW", "0"))
  if wide_w > 0:
    wide_r = int(os.environ.get("MARCH_REPAIR_REFETCH", "8"))
    fns.append(make_render_fn(
        model.clone(march_mode="tiled", march_window=wide_w,
                    march_refetch=wide_r, march_interp="highest",
                    march_skip="off"),
        args, grid_vars, mesh=mesh))
  fns.append(make_render_fn(model.clone(march_mode="scan"), args, grid_vars,
                            mesh=mesh))
  return fns


def make_render_fn(model, args, grid_vars, mesh=None):
  """Jitted deterministic renderer for eval.

  Rendering always computes the MLPs in fp32: `--mlp_dtype=bfloat16` is a
  training-throughput knob (params stay fp32, so the same weights render
  in either dtype); eval should report best-quality numbers — and the
  bf16 render program additionally trips a TPU-backend regalloc
  RET_CHECK (jellyfish lsrav2 live_range_finder) on current toolchains.

  Returns the final-level tuple plus the tiled-marcher window-violation
  count (0 when exact / when the scan marcher ran). Replaces the
  reference's pmapped render_fn + all_gather (eval.py:95-105): under jit
  with sharded ray inputs the outputs come back globally addressable
  single-process; multi-process, outputs are constrained replicated (a
  GSPMD all-gather over ICI) so every host can fetch the full chunk —
  the moral equivalent of the reference's lax.all_gather.
  """
  if getattr(model, "mlp_dtype", "float32") != "float32":
    model = model.clone(mlp_dtype="float32")

  render_core = _make_render_core(model, mesh)
  render_impl = jax.jit(render_core)

  def render_fn(params, key_0, key_1, rays):
    return render_impl(params, grid_vars, key_0, key_1, rays)

  return render_fn


def _make_render_core(model, mesh):
  """Unjitted per-chunk render body shared by the single- and multi-chunk
  dispatch builders (make_render_fn / make_render_fn_multi)."""
  replicate_out = mesh is not None and jax.process_count() > 1

  def render_core(params, grid, key_0, key_1, rays):
    variables = {"params": params, **grid}
    (ret, _), aux = model.apply(variables, key_0, key_1, rays, False,
                                mutable=["diagnostics"])
    diag = aux.get("diagnostics", {}).get("path_sampler", {})
    vals = diag.get("march_oow", ())
    if not isinstance(vals, (tuple, list)):
      vals = (vals,)  # sow with reduce_fn stores the reduced value
    oow = jnp.int32(0)
    for v in vals:
      oow = oow + v
    out = ret[-1] + (oow,)
    if replicate_out:
      from jax.sharding import NamedSharding, PartitionSpec
      out = jax.lax.with_sharding_constraint(
          out, NamedSharding(mesh, PartitionSpec()))
    return out

  return render_core


def make_render_fn_multi(model, args, grid_vars, mesh=None):
  """Jitted K-chunk render dispatch: rays carry a leading chunk axis.

  lax.map over the same render core as make_render_fn — one dispatch
  renders K eval chunks (outputs stacked [K, ...]), amortizing the
  per-call host dispatch latency exactly like make_train_step_multi does
  for training (the dominant per-chunk cost through a remote-TPU tunnel;
  the reference renders chunks strictly synchronously,
  rnerf/utils.py:331-389). Bit-identical per chunk to make_render_fn:
  same keys, same core, the chunk axis is only an execution grouping.
  """
  if getattr(model, "mlp_dtype", "float32") != "float32":
    model = model.clone(mlp_dtype="float32")

  render_core = _make_render_core(model, mesh)

  @jax.jit
  def render_multi_impl(params, grid, key_0, key_1, stacked_rays):
    return jax.lax.map(
        lambda r: render_core(params, grid, key_0, key_1, r), stacked_rays)

  def render_multi_fn(params, key_0, key_1, stacked_rays):
    return render_multi_impl(params, grid_vars, key_0, key_1, stacked_rays)

  return render_multi_fn
