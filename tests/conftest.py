"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests need
XLA_FLAGS=--xla_force_host_platform_device_count=8; setting it here (before
jax initializes) covers single-process pytest runs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()
