"""Training CLI for the TPU-native refractive NeRF.

Invocation surface matches the reference (train.py, train_nerf.sh:7-12):

  python -m train --data_dir=... --train_dir=... \
      --config=configs/<scene> --gin_file=configs/<scene>.gin --stage=...

TPU-native orchestration: a 1-D device Mesh over the ray batch, one
jit-compiled train step (GSPMD inserts the gradient all-reduce), host-side
threaded data prefetch feeding jax.device_put with NamedShardings, and
orbax/flax checkpoints compatible with the staged-surgery layout.
"""

import functools
import gc
import time
from os import path

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags
from flax.training.train_state import TrainState
from jax import random

from samplenerfro_tpu.data import datasets
from samplenerfro_tpu.data import prefetch
from samplenerfro_tpu.models import construct_nerf
from samplenerfro_tpu.parallel import mesh as mesh_lib
from samplenerfro_tpu.train import checkpoints as ckpt_lib
from samplenerfro_tpu.train import step as step_lib
from samplenerfro_tpu.utils import config as config_lib
from samplenerfro_tpu.utils import grid_io
from samplenerfro_tpu.utils import io as io_lib
from samplenerfro_tpu.utils import metrics
from samplenerfro_tpu.utils import render as render_lib

FLAGS = flags.FLAGS

config_lib.apply_platform_overrides()
config_lib.maybe_initialize_distributed()
config_lib.define_flags()


def main(unused_argv):
  rng = random.PRNGKey(20200823)
  np.random.seed(20201473 + jax.process_index())

  cfg, gin_bindings = config_lib.load_config()
  if FLAGS.config is not None:
    config_lib.update_flags(FLAGS)
  config_lib.apply_matmul_precision(FLAGS.matmul_precision)
  config_lib.resolve_mosaic(FLAGS)
  if FLAGS.batch_size % jax.device_count() != 0:
    raise ValueError("Batch size must be divisible by the number of devices.")
  if FLAGS.train_dir is None:
    raise ValueError("train_dir must be set. None set now.")
  if FLAGS.data_dir is None:
    raise ValueError("data_dir must be set. None set now.")

  dataset = datasets.get_dataset("train", FLAGS)
  val_dataset = datasets.get_dataset("val", FLAGS)

  rng, key = random.split(rng)
  grid, ndim, nmin, nmax = grid_io.load_ior_grid(
      FLAGS.data_dir, cfg, FLAGS.config)

  model, variables = construct_nerf(key, dataset.peek(), FLAGS,
                                    ndim=ndim, nmin=nmin, nmax=nmax,
                                    grid=grid, gin_overrides=gin_bindings)
  print(io_lib.pretty_repr(variables))

  # The tiled marcher needs tile-coherent ray blocks: only valid for the
  # train step when batches are pixel tiles. Rendering reorders pixels into
  # tiles itself, so the render model can always honor --march_mode.
  # --march_window=0 auto-calibrates: the smallest window with zero
  # out-of-window clamps on a few probe batches.
  if FLAGS.march_mode in ("tiled", "pallas") and FLAGS.march_window == 0:
    from samplenerfro_tpu.train import calibrate
    if FLAGS.batching == "tile":
      probe_batches = [next(dataset) for _ in range(4)]
    else:
      # Probe with tile-reordered rays from a validation view.
      probe_batches = calibrate.probe_batches_from_view(
          val_dataset.peek()["rays"], FLAGS.tile_size, FLAGS.batch_size)
    # Persisted per scene in the train dir (next to the flag snapshots):
    # resume/eval/next-stage runs seed the probe ladder with the cached
    # pair instead of re-walking its per-candidate Mosaic compiles; the
    # key hashes the grid CONTENT, so a regenerated grid invalidates it.
    calib_path = path.join(FLAGS.train_dir, "march_calib.json")
    io_lib.makedirs(FLAGS.train_dir)
    model, FLAGS.march_window, FLAGS.march_refetch = calibrate.maybe_autocalibrate(
        model, variables, FLAGS, probe_batches,
        cache_paths=(calib_path,), store_path=calib_path,
        grid_tag=calibrate.grid_content_tag(grid),
        probe_kind="train" if FLAGS.batching == "tile" else "view")
  render_tile = FLAGS.tile_size if FLAGS.march_mode in ("tiled",
                                                        "pallas") else 0
  train_model = model
  if FLAGS.march_mode in ("tiled", "pallas") and FLAGS.batching != "tile":
    train_model = model.clone(march_mode="scan")
  # ("all"-stage training keeps the windowed marchers: the analytic
  # reverse sweep in ops/eikonal_vjp.py supplies the march gradients, so
  # the fused Pallas forward is usable in every stage.)

  if FLAGS.stage.startswith("ior"):
    dataset = datasets.Grid("train", FLAGS, grid, ndim, nmax, nmin)
    extra_dataset = None
  else:
    extra_dataset = datasets.Grid("train", FLAGS, grid, ndim, nmax, nmin)

  mesh = mesh_lib.make_mesh()
  grid_vars = {"grid": mesh_lib.replicate(dict(variables["grid"]), mesh)}

  # Multi-step dispatch: stack K batches and lax.scan the step inside ONE
  # jit call. Training math and the rng chain are identical to K sequential
  # dispatches; only the host-side dispatch overhead is amortized (the
  # dominant loop cost through a remote-TPU tunnel, a tail cost locally).
  K = max(1, FLAGS.steps_per_dispatch)
  if K > 1:
    for name in ("print_every", "save_every", "gc_every", "render_every"):
      val = getattr(FLAGS, name)
      if val > 0 and val % K != 0:
        raise ValueError(f"--{name}={val} must be a multiple of "
                         f"--steps_per_dispatch={K}.")
  make_step = (step_lib.make_train_step_multi if K > 1
               else step_lib.make_train_step)
  train_pstep = make_step(train_model, FLAGS, grid_vars)
  render_fn = step_lib.make_render_fn(model, FLAGS, grid_vars, mesh=mesh)
  render_multi_fn = (
      step_lib.make_render_fn_multi(model, FLAGS, grid_vars, mesh=mesh)
      if FLAGS.render_chunks_per_dispatch > 1 else None)
  # Clamp-free repair ladder for in-loop val renders (utils/render.py):
  # wide-window XLA tiled marcher first, scan as the last resort.
  repair_fns = step_lib.make_repair_fns(model, FLAGS, grid_vars, mesh=mesh)
  tiled_training = train_model.march_mode in ("tiled", "pallas")

  ssim_fn = jax.jit(
      functools.partial(metrics.compute_ssim, max_val=1.0), backend="cpu")

  FLAGS.stage_dir = path.join(FLAGS.train_dir, FLAGS.stage)
  if not io_lib.isdir(FLAGS.stage_dir):
    io_lib.makedirs(FLAGS.stage_dir)
  config_lib.save_flags(FLAGS)
  config_lib.save_config(FLAGS, gin_bindings)

  tx, learning_rate_fn, learning_rate_fn1 = step_lib.create_optimizer(FLAGS)
  state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                            tx=tx)
  del tx, variables

  state = ckpt_lib.restore_checkpoint(FLAGS.stage_dir, state)
  init_step = int(state.step) + 1
  dataset.train_it = init_step - 1
  if FLAGS.render_every > 0:
    val_dataset.test_it = init_step // FLAGS.render_every
  if extra_dataset is not None:
    extra_dataset.train_it = init_step - 1

  state = mesh_lib.replicate(state, mesh)

  summary_writer = None
  if jax.process_index() == 0:
    from flax.metrics import tensorboard
    summary_writer = tensorboard.SummaryWriter(FLAGS.stage_dir)

  rng = rng + jax.process_index()
  keys = random.split(rng, 1)[0]
  gc.disable()
  gc.collect()
  stats_trace = []
  reset_timer = True

  if FLAGS.profile:
    jax.profiler.start_trace(path.join(FLAGS.stage_dir, "profile"))

  # Assemble + device_put batches a couple of steps ahead of the train
  # loop (overlaps host work and H2D transfer with device compute).
  prefetch_step = [init_step - 1]

  def next_host_batch():
    prefetch_step[0] += 1
    step = prefetch_step[0]
    if step > FLAGS.max_steps:
      return None
    batch = next(dataset)
    if extra_dataset is not None:
      batch = {**batch, **next(extra_dataset)}
    batch["annealed_alpha"] = np.float32(
        np.maximum(step - FLAGS.anneal_delay_steps, 0)
        / (FLAGS.anneal_max_steps - FLAGS.anneal_delay_steps))
    batch["coarse_alpha_target"] = np.float32(0.0)
    batch["fine_alpha_target"] = np.float32(0.0)
    return batch

  if K > 1:
    # Dispatch windows align to the global K grid (a resume from an
    # off-grid checkpoint gets one shorter first window, the tail at
    # max_steps one shorter last window; jit re-specializes per length).
    win_start = [init_step]

    def next_host_superbatch():
      s = win_start[0]
      if s > FLAGS.max_steps:
        return None
      end = min(FLAGS.max_steps, ((s - 1) // K + 1) * K)
      win_start[0] = end + 1
      bs = [next_host_batch() for _ in range(end - s + 1)]
      return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *bs)

    batches = prefetch.device_prefetch(next_host_superbatch, mesh, size=3,
                                       stacked=True)
  else:
    batches = prefetch.device_prefetch(next_host_batch, mesh, size=3)

  def dispatch_windows():
    s = init_step
    while s <= FLAGS.max_steps:
      e = min(FLAGS.max_steps, ((s - 1) // K + 1) * K) if K > 1 else s
      yield s, e
      s = e + 1

  oow_trace = []  # device scalars; fetched (and policed) at print cadence
  oow_first_step = init_step
  profile_stopped = False
  for (wstart, step), batch in zip(dispatch_windows(), batches):
    if reset_timer:
      t_loop_start = time.time()
      reset_timer = False
    lr = learning_rate_fn(step)
    state, stats, keys = train_pstep(keys, state, batch)
    if jax.process_index() == 0:
      # Keep device arrays; fetching here would sync every step. Under
      # K-step dispatch each entry's leaves carry a leading step axis.
      stats_trace.append(stats)
    if tiled_training:
      # Window-violation policy: the tiled marcher counts every clamped
      # out-of-window interpolation (ops/eikonal_tiled.py); a nonzero count
      # means the batch's bundles outgrew the calibrated window and results
      # are no longer exact. EVERY step's count is kept (as an unfetched
      # device scalar — no sync) and the accumulated total is policed at
      # print cadence, so violations between prints cannot slip through.
      if not oow_trace:
        oow_first_step = wstart
      oow_trace.append(stats.march_oow)
    if tiled_training and step % FLAGS.print_every == 0:
      first_step = oow_first_step
      oow = int(np.sum(jax.device_get(oow_trace)))
      oow_trace = []
      if oow > 0:
        # The LIVE model is the source of truth for the ladder state (a
        # yaml-configured flag used to shadow FLAGS assignments, which
        # made the ladder ping-pong between the same two rungs).
        cur_window = train_model.march_window
        cur_refetch = train_model.march_refetch
        msg = (f"steps {first_step}..{step}: tiled marcher clamped {oow} "
               f"out-of-window interpolations (window={cur_window}, "
               f"refetch={cur_refetch})")
        if FLAGS.march_oow_action == "fail":
          raise RuntimeError(
              msg + "; rerun with a larger --march_window, "
              "--march_window=0 (auto-calibrate), or --march_mode=scan.")
        if FLAGS.march_oow_action == "fallback":
          # Step DOWN the marcher ladder instead of cliff-dropping to the
          # 3x-slower scan (policy + rationale: calibrate.fallback_rungs).
          # Each rung is compile-probed first: a wide window can fail to
          # COMPILE at flagship grid scale, and a failed width fences all
          # wider rungs (both refetch variants of a failing window fail
          # too) so the walk lands on a feasible narrower short-refetch
          # rung instead of crashing the loop at its next step.
          from samplenerfro_tpu.train import calibrate
          probe_vars = {"params": state.params, **grid_vars}
          rshape = batch["rays"].origins.shape  # shape only, no fetch
          if K > 1:
            rshape = rshape[1:]  # drop the stacked-dispatch axis
          chosen, failed_w = None, None
          for nwin, nref in calibrate.fallback_rungs(cur_window,
                                                     cur_refetch):
            if failed_w is not None and nwin >= failed_w:
              continue
            cand = train_model.clone(march_window=nwin, march_refetch=nref)
            if calibrate.probe_compilable(cand, probe_vars, rshape):
              chosen = (nwin, nref)
              break
            failed_w = nwin if failed_w is None else min(failed_w, nwin)
          if chosen is not None:
            print("WARNING: " + msg + "; stepping down the marcher ladder "
                  f"to window={chosen[0]}, refetch={chosen[1]}.")
            train_model = train_model.clone(march_window=chosen[0],
                                            march_refetch=chosen[1])
          else:
            print("WARNING: " + msg + "; falling back to the exact scan "
                  "marcher for the rest of training.")
            train_model = train_model.clone(march_mode="scan")
            tiled_training = False
          FLAGS.march_window = train_model.march_window
          FLAGS.march_refetch = train_model.march_refetch
          train_pstep = make_step(train_model, FLAGS, grid_vars)
        else:
          print("WARNING: " + msg)
    if step % FLAGS.gc_every == 0:
      gc.collect()

    if FLAGS.profile and step >= init_step + 5 and not profile_stopped:
      jax.block_until_ready(state.params)
      jax.profiler.stop_trace()
      profile_stopped = True

    if jax.process_index() == 0 and step % FLAGS.print_every == 0:
      stats_trace = jax.device_get(stats_trace)
      if K > 1:
        # Unstack each dispatch's [k]-leaved Stats into per-step entries.
        stats_trace = [
            jax.tree_util.tree_map(lambda x: np.asarray(x)[i], st)
            for st in stats_trace
            for i in range(np.asarray(st.loss).shape[0])]
      stats_np = stats_trace[-1]
      summary_writer.scalar("train_loss", stats_np.loss, step)
      summary_writer.scalar("train_psnr", stats_np.psnr, step)
      summary_writer.scalar("train_loss_coarse", stats_np.loss_c, step)
      summary_writer.scalar("train_psnr_coarse", stats_np.psnr_c, step)
      summary_writer.scalar("weight_l2", stats_np.weight_l2, step)
      summary_writer.scalar("train_loss_sp", stats_np.loss_sp, step)
      summary_writer.scalar("train_loss_nrm", stats_np.loss_nrm, step)
      summary_writer.scalar("train_loss_bg", stats_np.loss_bg, step)
      summary_writer.scalar("train_loss_bg_c", stats_np.loss_bg_c, step)
      summary_writer.scalar("train_loss_bg_smooth", stats_np.loss_bg_smooth,
                            step)
      summary_writer.scalar("train_march_oow", stats_np.march_oow, step)
      avg = lambda name: np.mean([getattr(s, name) for s in stats_trace])
      avg_loss = avg("loss")
      avg_loss_c = avg("loss_c")
      avg_loss_bg = avg("loss_bg")
      summary_writer.scalar("train_avg_loss", avg_loss, step)
      summary_writer.scalar("train_avg_psnr", avg("psnr"), step)
      summary_writer.scalar("train_avg_loss_sp", avg("loss_sp"), step)
      summary_writer.scalar("train_avg_loss_nrm", avg("loss_nrm"), step)
      summary_writer.scalar("train_avg_loss_coarse", avg_loss_c, step)
      summary_writer.scalar("train_avg_psnr_coarse", avg("psnr_c"), step)
      summary_writer.scalar("train_avg_loss_bg", avg_loss_bg, step)
      summary_writer.scalar("train_avg_loss_bg_c", avg("loss_bg_c"), step)
      summary_writer.scalar("train_avg_loss_bg_smooth", avg("loss_bg_smooth"),
                            step)
      stats_trace = []
      summary_writer.scalar("learning_rate", lr, step)
      summary_writer.scalar("learning_rate1", learning_rate_fn1(step), step)
      summary_writer.scalar("annealing_rate", stats_np.annealing_rate, step)
      steps_per_sec = FLAGS.print_every / (time.time() - t_loop_start)
      reset_timer = True
      rays_per_sec = FLAGS.batch_size * steps_per_sec
      summary_writer.scalar("train_steps_per_sec", steps_per_sec, step)
      summary_writer.scalar("train_rays_per_sec", rays_per_sec, step)
      precision = int(np.ceil(np.log10(FLAGS.max_steps))) + 1
      print(("{:" + "{:d}".format(precision) + "d}").format(step) +
            f"/{FLAGS.max_steps:d}: " + f"i_loss={stats_np.loss:0.4f}, " +
            f"avg_loss={avg_loss:0.4f}, " + f"avg_loss_c={avg_loss_c:0.4f}, " +
            f"avg_loss_bg={avg_loss_bg:0.4f}, " +
            f"weight_l2={stats_np.weight_l2:0.2e}, " + f"lr={lr:0.2e}, " +
            f"{rays_per_sec:0.0f} rays/sec")
    if step % FLAGS.save_every == 0:
      ckpt_lib.save_checkpoint(FLAGS.stage_dir, state, step)

    if FLAGS.render_every > 0 and step % FLAGS.render_every == 0:
      t_eval_start = time.time()
      val_case = next(val_dataset)
      eval_params = state.params
      pred_color, pred_distance, pred_acc = render_lib.render_image(
          functools.partial(render_fn, eval_params),
          val_case["rays"], keys, FLAGS.dataset == "llff",
          chunk=FLAGS.chunk, mesh=mesh, tile=render_tile,
          chunks_per_dispatch=FLAGS.render_chunks_per_dispatch,
          render_multi_fn=(functools.partial(render_multi_fn, eval_params)
                           if render_multi_fn is not None else None),
          render_exact_fn=(
              [functools.partial(f, eval_params) for f in repair_fns]
              if repair_fns is not None else None))
      if jax.process_index() == 0:
        psnr = metrics.compute_psnr(
            ((pred_color - val_case["pixels"])**2).mean())
        ssim = ssim_fn(pred_color, val_case["pixels"])
        eval_time = time.time() - t_eval_start
        num_rays = int(np.prod(val_case["rays"].directions.shape[:-1]))
        rays_per_sec = num_rays / eval_time
        summary_writer.scalar("test_rays_per_sec", rays_per_sec, step)
        print(f"Eval {step}: {eval_time:0.3f}s., {rays_per_sec:0.0f} rays/sec")
        summary_writer.scalar("test_psnr", psnr, step)
        summary_writer.scalar("test_ssim", ssim, step)
        summary_writer.image("test_pred_color", pred_color, step)
        summary_writer.image("test_pred_disp", pred_distance, step)
        summary_writer.image("test_pred_acc", pred_acc, step)
        summary_writer.image("test_target", val_case["pixels"], step)

  if FLAGS.max_steps % FLAGS.save_every != 0:
    ckpt_lib.save_checkpoint(FLAGS.stage_dir, state, FLAGS.max_steps)


if __name__ == "__main__":
  app.run(main)
