"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests need
XLA_FLAGS=--xla_force_host_platform_device_count=8; setting it here (before
jax initializes) covers single-process pytest runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

# This image has a single CPU core; persistently cache XLA executables so
# repeated test runs skip recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A TPU plugin in this image registers itself via sitecustomize and sets
# jax_platforms programmatically (before conftest runs), so the env var
# alone is not enough — override the config directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
