"""Host->device batch prefetching.

TPU-native equivalent of flax.jax_utils.prefetch_to_device (train.py:336 in
the reference): a daemon thread assembles host batches and jax.device_put's
them with the mesh sharding layout a few steps ahead, so the train loop's
dispatch overlaps with data transfer instead of paying it synchronously.
"""

import queue
import threading

from samplenerfro_tpu.parallel import mesh as mesh_lib


def device_prefetch(batch_fn, mesh, size=2, stacked=False):
  """Iterator of device-resident batches.

  Args:
    batch_fn: callable () -> host batch dict (or None to stop).
    mesh: jax.sharding.Mesh for placement.
    size: prefetch depth.
    stacked: batches carry a leading step axis (multi-step dispatch);
      rays are sharded on axis 1.

  Yields:
    device batches in order.
  """
  q = queue.Queue(size)

  def worker():
    while True:
      batch = batch_fn()
      if batch is None:
        q.put(None)
        return
      q.put(mesh_lib.put_batch(batch, mesh, stacked=stacked))

  t = threading.Thread(target=worker, daemon=True)
  t.start()
  while True:
    item = q.get()
    if item is None:
      return
    yield item
