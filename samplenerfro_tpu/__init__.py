"""samplenerfro_tpu: TPU-native refractive-object NeRF framework.

A from-scratch reimplementation of the capabilities of SampleNeRFRO
("Sampling Neural Radiance Fields for Refractive Objects", SIGGRAPH Asia 2022)
designed for TPUs: a single jit-compiled train step sharded over ray batches
with jax.sharding Mesh/NamedSharding, a lax.scan (and optionally Pallas-fused)
eikonal curved-ray marcher through a voxelized index-of-refraction field, and
coarse/fine NeRF MLPs sized for the MXU.
"""

__version__ = "0.1.0"
