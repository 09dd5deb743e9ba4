"""Worker for the multi-process placement test (tests/test_multiprocess.py).

Runs one train step + one chunked eval render on a global mesh, with this
process contributing only its local rows of the ray batch. Invoked as:

  python tests/mp_worker.py <process_id> <num_processes> <port> <out.npz>

num_processes == 1 skips jax.distributed and serves as the golden
single-process reference; the test asserts the 2-process run reproduces it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
  local_devices = 4 // nproc
  os.environ["JAX_PLATFORMS"] = "cpu"
  os.environ["XLA_FLAGS"] = (
      f"--xla_force_host_platform_device_count={local_devices}")
  os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

  import jax
  jax.config.update("jax_platforms", "cpu")
  if nproc > 1:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
  assert len(jax.devices()) == 4

  import functools

  import numpy as np
  from flax.training.train_state import TrainState
  from jax import random

  import __graft_entry__ as g
  from samplenerfro_tpu.data.rays import Rays
  from samplenerfro_tpu.parallel import mesh as mesh_lib
  from samplenerfro_tpu.train import step as step_lib
  from samplenerfro_tpu.utils import render as render_lib

  # Deterministic model/params on every process (PRNGKey(0) init).
  args, model, variables, batch = g._tiny_setup(batch=8)
  mesh = mesh_lib.make_mesh()

  grid_vars = {"grid": mesh_lib.replicate(dict(variables["grid"]), mesh)}
  tx, _, _ = step_lib.create_optimizer(args)
  state = TrainState.create(apply_fn=model.apply,
                            params=variables["params"], tx=tx)
  state = mesh_lib.replicate(state, mesh)
  tstep = step_lib.make_train_step(model, args, grid_vars, donate=False)

  # Each process contributes its local rows of the ray-sharded keys; the
  # replicated keys (env_rays/pts/grads/scalars) are identical host data.
  per = 8 // nproc
  sl = slice(pid * per, (pid + 1) * per)
  local_batch = dict(batch)
  local_batch["rays"] = jax.tree_util.tree_map(lambda x: x[sl],
                                               batch["rays"])
  local_batch["pixels"] = batch["pixels"][sl]
  dbatch = mesh_lib.put_batch(local_batch, mesh)

  state, stats, _ = tstep(random.PRNGKey(3), state, dbatch)
  loss = float(jax.device_get(stats.loss))

  # Multi-step dispatch from a stacked batch (rays sharded on axis 1,
  # assembled per process via make_array_from_process_local_data when
  # nproc > 1). The scanned first step must reproduce the single-step
  # loss bitwise (same body, same rng schedule).
  tmulti = step_lib.make_train_step_multi(model, args, grid_vars,
                                          donate=False)
  stacked = jax.tree_util.tree_map(
      lambda x: np.stack([np.asarray(x)] * 2), local_batch)
  dstacked = mesh_lib.put_batch(stacked, mesh, stacked=True)
  state0 = TrainState.create(apply_fn=model.apply,
                             params=variables["params"], tx=tx)
  state0 = mesh_lib.replicate(state0, mesh)
  _, mstats, _ = tmulti(random.PRNGKey(3), state0, dstacked)
  multi_loss0 = float(jax.device_get(mstats.loss)[0])

  render_fn = step_lib.make_render_fn(model, args, grid_vars, mesh=mesh)
  rng_ = np.random.RandomState(7)
  d = rng_.randn(4, 6, 3)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  img_rays = Rays(origins=np.zeros((4, 6, 3), np.float32),
                  directions=d.astype(np.float32),
                  viewdirs=d.astype(np.float32),
                  radii=np.full((4, 6, 1), 0.001, np.float32))
  rgb, _, acc = render_lib.render_image(
      functools.partial(render_fn, state.params), img_rays,
      random.PRNGKey(5), False, chunk=8, mesh=mesh)

  # Grouped-dispatch render (K=2 of the 3 full chunks via lax.map, the
  # third through the per-chunk fallback): must be bitwise identical and
  # exercises stacked put_batch + per-host slicing under nproc > 1.
  render_multi = step_lib.make_render_fn_multi(model, args, grid_vars,
                                               mesh=mesh)
  rgb_g, _, acc_g = render_lib.render_image(
      functools.partial(render_fn, state.params), img_rays,
      random.PRNGKey(5), False, chunk=8, mesh=mesh,
      chunks_per_dispatch=2,
      render_multi_fn=functools.partial(render_multi, state.params))

  if pid == 0:
    np.savez(out_path, loss=np.float32(loss), rgb=np.asarray(rgb),
             acc=np.asarray(acc), multi_loss0=np.float32(multi_loss0),
             rgb_grouped=np.asarray(rgb_g), acc_grouped=np.asarray(acc_g))
  print(f"worker {pid}/{nproc} done loss={loss:.6f}", flush=True)


if __name__ == "__main__":
  main()
