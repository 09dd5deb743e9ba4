"""Mosaic (Pallas) availability probe for relay-backed TPU environments.

On this environment Pallas kernels compile through a remote-compile HTTP
relay (PALLAS_AXON_REMOTE_COMPILE). When the relay's remote side is down,
the FIRST pallas_call lowering blocks indefinitely inside an HTTP read
with no timeout — a training run or bench silently hangs before its first
step (round-4 post-mortem: a hung compile turned the driver bench into
rc=124 with zero output).

probe() compiles a trivial 1-op kernel in a SUBPROCESS under a wall-clock
timeout, so the main process can demote `march_mode=pallas` to the XLA
windowed marcher (`tiled`) instead of hanging. Results are cached:

  - healthy results in /tmp (TTL: _OK_TTL_S) — a healthy relay is not
    re-probed on every driver start;
  - failures only in-process — an outage is re-probed by the next run.

Controls: SAMPLENERFRO_MOSAIC=1 forces "available" (skip the probe),
=0 forces "unavailable"; SAMPLENERFRO_MOSAIC_PROBE_TIMEOUT overrides the
timeout (seconds; a healthy relay compiles the probe kernel in well under
a minute — the default budgets cold-start jax import plus one compile).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

_PROBE_SRC = """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def k(x_ref, o_ref):
  o_ref[...] = x_ref[...] + 1.0

x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
assert float(y[0, 0]) == 2.0
print("MOSAIC_PROBE_OK")
"""

_OK_TTL_S = 3600.0
_CACHE_FILE = os.path.join(tempfile.gettempdir(), "snr_mosaic_probe.json")
_result = None  # in-process cache (both outcomes)


def _cached_ok():
  try:
    with open(_CACHE_FILE) as f:
      entry = json.load(f)
    return bool(entry.get("ok")) and (
        time.time() - float(entry.get("ts", 0)) < _OK_TTL_S)
  except (OSError, ValueError):
    return False


def _store_ok():
  try:
    with open(_CACHE_FILE, "w") as f:
      json.dump({"ok": True, "ts": time.time()}, f)
  except OSError:
    pass


def probe(timeout=None, verbose=True):
  """True iff a trivial Pallas kernel compiles+runs within `timeout` s."""
  global _result
  force = os.environ.get("SAMPLENERFRO_MOSAIC", "")
  if force == "1":
    return True
  if force == "0":
    return False
  if _result is not None:
    return _result
  if jax_backend_is_cpu():
    # CPU/interpret-mode pallas needs no relay; never gate it.
    _result = True
    return True
  if _cached_ok():
    _result = True
    return True
  if timeout is None:
    timeout = float(os.environ.get(
        "SAMPLENERFRO_MOSAIC_PROBE_TIMEOUT", "300"))
  if verbose:
    print(f"probing mosaic remote-compile relay (timeout {timeout:.0f}s)...",
          flush=True)
  t0 = time.time()
  try:
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE_SRC], timeout=timeout,
        capture_output=True, text=True)
    ok = proc.returncode == 0 and "MOSAIC_PROBE_OK" in proc.stdout
    if not ok and verbose:
      tail = (proc.stderr or "").strip().splitlines()[-3:]
      print("mosaic probe failed:", *tail, sep="\n  ", flush=True)
  except subprocess.TimeoutExpired:
    ok = False
    if verbose:
      print(f"mosaic probe TIMED OUT after {timeout:.0f}s "
            "(remote-compile relay unresponsive)", flush=True)
  if verbose and ok:
    print(f"mosaic relay healthy ({time.time() - t0:.0f}s)", flush=True)
  if ok:
    _store_ok()
  _result = ok
  return ok


def jax_backend_is_cpu():
  import jax  # noqa: PLC0415 (deferred: probe callers may pre-set platforms)
  try:
    return jax.default_backend() == "cpu"
  except RuntimeError:
    return True


def resolve_march_mode(march_mode, timeout=None, verbose=True):
  """Demote 'pallas' to 'tiled' when Mosaic compiles are unavailable.

  Returns (effective_march_mode, mosaic_ok). Non-pallas modes never probe.
  """
  if march_mode != "pallas":
    return march_mode, True
  ok = probe(timeout=timeout, verbose=verbose)
  if ok:
    return march_mode, True
  if verbose:
    print("WARNING: mosaic remote-compile unavailable — demoting "
          "march_mode=pallas to the XLA windowed marcher (tiled). "
          "Set SAMPLENERFRO_MOSAIC=1 to skip the probe and force pallas.",
          flush=True)
  return "tiled", False
