"""Threaded SDF point sampler for IOR-field pretraining experiments.

Parity with the reference rnerf/ior_utils.py:57-117 (ior_utils.Dataset):
a daemon-thread iterator yielding batches of 3D points labeled with IOR
1.33 inside the proxy mesh / 1.0 outside — half uniform in a +-3 cube,
half near-surface samples (surface + N(0, 0.01) noise), plus up to a
quarter of guaranteed-inside samples appended. Uses the native BVH SDF
core instead of pysdf/trimesh.
"""

import os
import queue
import threading

import numpy as np

import jax

from samplenerfro_tpu.tools import objio
from samplenerfro_tpu.tools import sdf as sdflib


class Dataset(threading.Thread):
  """Iterator of {"samples": [B, 3], "labels": [B, 1]} host batches."""

  def __init__(self, args):
    super().__init__()
    self.queue = queue.Queue(3)
    self.daemon = True
    mesh = objio.load(os.path.join(args.data_dir, "mesh.obj"))
    self.extents = mesh.extents
    self.bounds = mesh.bounds
    self.sdf = sdflib.SDF(mesh.vertices, mesh.faces)
    self.batch_size = args.batch_size // jax.process_count()
    self.start()

  def __iter__(self):
    return self

  def __next__(self):
    return self.queue.get()

  def peek(self):
    import time
    while self.queue.empty():
      time.sleep(0.01)
    return self.queue.queue[0].copy()

  def run(self):
    while True:
      num_samples = self.batch_size // 4
      extent = 3
      rand_sample = np.random.rand(self.batch_size // 2, 3) * extent * 2.0 - extent
      near_sample = self.sdf.sample_surface(num_samples * 2).astype(np.float64)
      near_sample += np.random.normal(scale=0.01, size=(num_samples * 2, 3))
      points = (np.random.random((num_samples, 3)) * self.extents
                + self.bounds[0])
      contained = self.sdf.contains(points)
      surf_sample = points[contained][:num_samples]
      ns = surf_sample.shape[0]
      samples = np.concatenate(
          [rand_sample[:(self.batch_size // 2 - ns)], near_sample], axis=0)
      labels = self.sdf.contains(samples)[..., None]
      labels = np.concatenate(
          [labels.astype(np.float32), np.ones((ns, 1))], axis=0)
      self.queue.put({
          "samples": np.concatenate([samples, surf_sample], axis=0).astype(
              np.float32),
          "labels": np.where(labels > 0.5, 1.33, 1.0).astype(np.float32),
      })
