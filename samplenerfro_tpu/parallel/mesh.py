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


def shard_batch_spec(mesh, batch, axis_name="batch"):
  """Build a sharding pytree for a host batch dict.

  Arrays with a leading axis divisible by the mesh size are sharded on that
  axis; everything else (scalars, small patch tensors) is replicated.
  """
  n = mesh.devices.size
  data_sh = batch_sharding(mesh, axis_name)
  repl = replicated_sharding(mesh)

  def spec(x):
    if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
      return data_sh
    return repl

  return jax.tree_util.tree_map(spec, batch)


def put_batch(batch, mesh, axis_name="batch"):
  """Transfer a host batch to devices with the standard sharding layout."""
  shardings = shard_batch_spec(mesh, batch, axis_name)
  return jax.tree_util.tree_map(
      lambda x, s: jax.device_put(x, s), batch, shardings)
