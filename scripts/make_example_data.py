"""Generate the vendored example_data/ smoke scene (run once, committed).

Reference parity: /root/reference/example_data ships a 1-frame Blender
scene (imgs + transforms_{train,val}.json + voxelize/mesh_*.obj) paired
with configs/example.{yaml,gin}, so the documented first-run CLI
(`python train.py --data_dir example_data --config configs/example.yaml`)
executes from a fresh checkout. This script synthesizes an equivalent
scene with tools/synth.py (exact eikonal ground truth through a Gaussian
IOR blob — no external assets needed) and additionally emits
voxelize/mesh_4_64_1.5_1.165.obj (an isosurface of the blob) so the
voxelizer first-run path (voxelize_mesh.py -> mesh.pkl) can be exercised
on the vendored data too.

Usage: SAMPLENERFRO_FORCE_CPU=1 python scripts/make_example_data.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if os.environ.get("SAMPLENERFRO_FORCE_CPU") == "1":
  jax.config.update("jax_platforms", "cpu")

from samplenerfro_tpu.tools import isosurface, objio, synth  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "example_data")
GRID_N = 64
EXTENT = 1.5


def main():
  synth.make_scene(OUT, n_train=3, n_val=1, n_test=1, res=128,
                   grid_n=GRID_N, extent=EXTENT, num_samples=768, seed=7)
  # Proxy mesh: the blob's n=1.165 isosurface (halfway up the 1.33 peak),
  # named with the reference's mesh_{samples}_{voxels}_{extent}_{ior}.obj
  # pattern (/root/reference/example_data/voxelize/).
  axes = np.linspace(-EXTENT, EXTENT, GRID_N, dtype=np.float32)
  xx, yy, zz = np.meshgrid(axes, axes, axes, indexing="ij")
  vol = 1.0 + 0.33 * np.exp(-(xx**2 + yy**2 + zz**2) / 0.25)
  verts, faces = isosurface.marching_cubes(vol, 1.165)
  # Index space -> world coordinates.
  verts = verts / (GRID_N - 1) * (2 * EXTENT) - EXTENT
  objio.save_obj(os.path.join(OUT, "voxelize",
                              f"mesh_4_{GRID_N}_{EXTENT}_1.165.obj"),
                 verts, faces)
  print(f"wrote {OUT}")


if __name__ == "__main__":
  main()
