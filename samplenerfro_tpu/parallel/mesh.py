"""Device mesh and sharding layout for data-parallel training.

TPU-native replacement for the reference's pmap scaffolding
(train.py:239-255, rnerf/utils.py:531-547): a 1-D jax.sharding.Mesh over the
ray-batch axis, NamedSharding annotations on batches (sharded) and state
(replicated), and a single jit-compiled train step. XLA GSPMD inserts the
gradient all-reduce over ICI automatically, replacing explicit
lax.pmean / all_gather calls; multi-host runs shard the global batch by
process exactly as the reference does (batch_size // process_count rays per
host, rnerf/datasets.py:85).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="batch"):
  """1-D mesh over all (or given) devices, data-parallel over rays."""
  devices = devices if devices is not None else jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="batch"):
  """Shard the leading (ray) axis across the mesh."""
  return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
  """Fully replicated (params, optimizer state, scalars)."""
  return NamedSharding(mesh, P())


# Top-level batch keys whose arrays are replicated rather than ray-sharded
# (per-patch/aux tensors whose leading axis is NOT the ray axis).
REPLICATED_BATCH_KEYS = ("env_rays", "pts", "grads")


def shard_batch_spec(mesh, batch, axis_name="batch", stacked=False):
  """Build a sharding pytree for a host batch dict.

  Arrays with a leading axis divisible by the mesh size are sharded on that
  axis; scalars and the REPLICATED_BATCH_KEYS subtrees (env-map patches,
  boundary points) are replicated. With stacked=True the batch carries a
  leading step axis (multi-step dispatch): the ray axis is axis 1 and the
  step axis is never sharded.
  """
  n = mesh.devices.size
  ray_axis = 1 if stacked else 0
  data_sh = (NamedSharding(mesh, P(None, axis_name)) if stacked
             else batch_sharding(mesh, axis_name))
  repl = replicated_sharding(mesh)

  def spec(x):
    if (hasattr(x, "shape") and x.ndim >= ray_axis + 1
        and x.shape[ray_axis] > 0 and x.shape[ray_axis] % n == 0):
      return data_sh
    return repl

  if isinstance(batch, dict):
    return {k: (jax.tree_util.tree_map(lambda x: repl, v)
                if k in REPLICATED_BATCH_KEYS
                else jax.tree_util.tree_map(spec, v))
            for k, v in batch.items()}
  return jax.tree_util.tree_map(spec, batch)


def put_batch(batch, mesh, axis_name="batch", stacked=False):
  """Transfer a host batch to devices with the standard sharding layout.

  Single-process: a plain device_put with NamedShardings. Multi-process:
  ray-sharded arrays are assembled with
  jax.make_array_from_process_local_data — each process contributes its
  LOCAL rows (datasets already produce batch_size // process_count rays per
  host, matching rnerf/datasets.py:85) — and replicated leaves are
  broadcast from process 0 so every replica is bitwise identical (GSPMD
  requires replicated operands to agree across processes).
  stacked=True: multi-step-dispatch batches with a leading step axis
  (rays sharded on axis 1; see shard_batch_spec).
  """
  shardings = shard_batch_spec(mesh, batch, axis_name, stacked=stacked)
  if jax.process_count() == 1:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), batch, shardings)

  from jax.experimental import multihost_utils

  def put(x, s):
    x = np.asarray(x)
    if s.spec == jax.sharding.PartitionSpec():
      return jax.device_put(multihost_utils.broadcast_one_to_all(x), s)
    return jax.make_array_from_process_local_data(s, x)

  return jax.tree_util.tree_map(put, batch, shardings)


def replicate(tree, mesh):
  """Place a (host or device) pytree fully replicated on the mesh.

  Single-process: device_put with a replicated NamedSharding. Multi-process:
  jax.device_put cannot target non-addressable devices, so the global
  replicated array is assembled from identical process-local copies with
  jax.make_array_from_process_local_data (params/grids are constructed
  deterministically on every process; checkpoint restores read the same
  file).
  """
  repl = replicated_sharding(mesh)
  if jax.process_count() == 1:
    return jax.device_put(tree, repl)
  return jax.tree_util.tree_map(
      lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
      tree)


def local_chunk(rows, mesh):
  """This process's row range [lo, hi) of a globally row-sharded array.

  Assumes make_mesh ordering (jax.devices(): process-major), so each
  process's addressable shards are a contiguous row range.
  """
  per = rows // jax.process_count()
  lo = jax.process_index() * per
  return lo, lo + per
