"""Chunked full-image rendering on a device mesh.

Behavioral parity target: rnerf/utils.py:331-389 (render_image), with the
pmap/shard/unshard machinery replaced by jit + NamedSharding: each chunk is
padded to a device multiple, device_put with the ray axis sharded over the
mesh, rendered by the jitted render_fn, and fetched; XLA handles the gather.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.data.rays import namedtuple_map
from samplenerfro_tpu.ops import eikonal_tiled
from samplenerfro_tpu.parallel import mesh as mesh_lib


def render_image(render_fn, rays, rng, normalize_disp, chunk=8192, mesh=None,
                 tile=0, pipeline_depth=8, chunks_per_dispatch=1,
                 render_multi_fn=None, return_oow=False,
                 render_exact_fn=None):
  """Render all pixels of an image in chunks.

  Args:
    render_fn: jitted fn (key_0, key_1, rays) -> final-level tuple
      (rgb, distance, acc, trans, trans_rgb_bkgd) for flat ray batches.
    rays: Rays with [height, width, C] fields (host or device arrays).
    rng: PRNG key (eval renders are deterministic; keys split once).
    normalize_disp: bool, normalize distance to [0, 1] (LLFF).
    chunk: int, rays per launch.
    mesh: optional jax.sharding.Mesh for multi-device rendering.
    tile: if > 0, permute pixels into tile x tile blocks before chunking
      (feeds the tile-coherent marcher; a pure execution-order change —
      outputs are un-permuted). chunk should be a multiple of tile^2.
    pipeline_depth: chunks kept in flight before fetching results. JAX
      dispatch is asynchronous, so enqueueing chunk k+1 before the
      device_get of chunk k overlaps H2D/compute/D2H across chunks (the
      reference renders chunks strictly synchronously, utils.py:331-389;
      a depth-1 pipeline pays the full dispatch latency per chunk).
    chunks_per_dispatch: when > 1 and render_multi_fn is given, groups of
      K full-size chunks render in ONE dispatch (a lax.map inside one jit
      call — see step_lib.make_render_fn_multi), amortizing the per-call
      host dispatch latency; ragged tails fall back to render_fn.
      Bit-identical outputs in either mode.
    render_multi_fn: jitted (key_0, key_1, stacked_rays [K, n, C]) ->
      stacked outputs; required when chunks_per_dispatch > 1.
    render_exact_fn: optional repair renderer (same signature as
      render_fn), or a LIST of them forming an escalation ladder. Chunks
      the windowed marcher clamped are re-rendered and replaced — the
      window is a speed optimization, never a correctness compromise:
      bundles that outdrift every calibrated window (caustic bundles
      through a strong refractive object can diverge unboundedly) take
      the repair path, everything else keeps the fused-kernel rate. With
      a ladder, a chunk a repair stage STILL clamps escalates to the next
      stage (train/step.py make_repair_fns: the XLA windowed marcher at a
      wide Mosaic-uncompilable window first — ~5x faster than scan and
      bit-exact to it at march_interp=highest when clamp-free — then the
      truly window-free scan marcher as the last resort).

  Returns:
    (rgb [h, w, 3], distance [h, w, 1], acc [h, w, 1]) numpy arrays; with
    return_oow=True a 4th element: the total out-of-window clamp count the
    windowed marcher reported across all chunks (0 == render was exact).
  """
  height, width = rays[0].shape[:2]
  num_rays = height * width
  rays = namedtuple_map(lambda r: np.asarray(r).reshape((num_rays, -1)), rays)

  inv_perm = None
  if tile > 0:
    perm, inv_perm = eikonal_tiled.tile_order(height, width, tile)
    rays = namedtuple_map(lambda r: r[perm], rays)

  _, key_0, key_1 = jax.random.split(rng, 3)
  total_oow = 0
  n_devices = mesh.devices.size if mesh is not None else 1
  pad_multiple = n_devices
  if tile > 0:
    pad_multiple = int(np.lcm(n_devices, tile * tile))
  results = []
  pending = collections.deque()  # entries: (stacked?, outs, paddings tuple)
  inflight = [0]

  chunk_oows = []  # per-chunk clamp counts, aligned with `results`

  def drain_one():
    nonlocal total_oow
    stacked, outs, paddings = pending.popleft()
    inflight[0] -= len(paddings)
    rgb, distance, acc, oow = jax.device_get(outs)
    if not stacked:
      rgb, distance, acc = rgb[None], distance[None], acc[None]
      oow = np.asarray(oow)[None]
    for k, padding in enumerate(paddings):
      total_oow += int(oow[k])
      chunk_oows.append(int(oow[k]))
      r_, d_, a_ = rgb[k], distance[k], acc[k]
      if padding:
        r_, d_, a_ = r_[:-padding], d_[:-padding], a_[:-padding]
      results.append((r_, d_, a_))

  def prep_chunk(i):
    """Slice/pad/host-slice one chunk; returns (host chunk rays, padding)."""
    chunk_rays = namedtuple_map(lambda r: r[i:i + chunk], rays)
    chunk_size = chunk_rays[0].shape[0]
    rays_remaining = chunk_size % pad_multiple
    padding = (pad_multiple - rays_remaining) if rays_remaining != 0 else 0
    if padding:
      chunk_rays = namedtuple_map(
          lambda r: np.pad(r, ((0, padding), (0, 0)), mode="edge"), chunk_rays)
    if mesh is not None and jax.process_count() > 1:
      # Per-host ray slicing (rnerf/utils.py:366-368): every process loads
      # the full image but contributes only its local rows to the global
      # sharded array.
      lo, hi = mesh_lib.local_chunk(chunk_rays[0].shape[0], mesh)
      chunk_rays = namedtuple_map(lambda r: r[lo:hi], chunk_rays)
    return chunk_rays, padding

  starts = list(range(0, num_rays, chunk))
  k_group = max(1, int(chunks_per_dispatch)) if render_multi_fn else 1
  gi = 0
  while gi < len(starts):
    group = starts[gi:gi + k_group]
    if k_group > 1 and len(group) == k_group and group[-1] + chunk <= num_rays:
      # K equal-size chunks in one dispatch (lax.map inside one jit call).
      prepped = [prep_chunk(i) for i in group]
      chunk_trees = [c for c, _ in prepped]
      stacked_rays = type(chunk_trees[0])(
          *[np.stack(cols) for cols in zip(*chunk_trees)])
      if mesh is not None:
        stacked_rays = mesh_lib.put_batch(stacked_rays, mesh, stacked=True)
      out = render_multi_fn(key_0, key_1, stacked_rays)
      oow = out[5] if len(out) > 5 else jnp.zeros((k_group,), jnp.int32)
      pending.append((True, (out[0], out[1], out[2], oow),
                      tuple(p for _, p in prepped)))
      inflight[0] += k_group
      gi += k_group
    else:
      chunk_rays, padding = prep_chunk(group[0])
      if mesh is not None:
        chunk_rays = mesh_lib.put_batch(chunk_rays, mesh)
      out = render_fn(key_0, key_1, chunk_rays)
      oow = out[5] if len(out) > 5 else 0
      pending.append((False, (out[0], out[1], out[2], oow), (padding,)))
      inflight[0] += 1
      gi += 1
    while inflight[0] >= max(1, pipeline_depth) and pending:
      drain_one()
  while pending:
    drain_one()

  if total_oow > 0 and render_exact_fn is not None:
    # Exact repair: chunks where the windowed marcher clamped (results and
    # starts are aligned one-to-one, in submission order) are re-rendered
    # and replaced. render_exact_fn may be an escalation LADDER of
    # renderers: a chunk a stage still clamps is handed to the next stage
    # (and only the ladder's LAST stage may leave a residual — in practice
    # it is the window-free scan marcher, which never clamps).
    repair_fns = (list(render_exact_fn)
                  if isinstance(render_exact_fn, (list, tuple))
                  else [render_exact_fn])
    dirty = [i for i, c in enumerate(chunk_oows) if c > 0]
    clamped, residual = total_oow, 0
    n_dirty = len(dirty)
    for stage, repair_fn in enumerate(repair_fns):
      if not dirty:
        break
      last_stage = stage == len(repair_fns) - 1
      escalate = []
      rpending = collections.deque()

      def drain_repair():
        nonlocal residual
        i, outs, padding = rpending.popleft()
        r_, d_, a_, oow = jax.device_get(outs)
        oow = int(oow)
        if oow > 0 and not last_stage:
          escalate.append(i)  # still clamped: keep the original, escalate
          return
        residual += oow
        if padding:
          r_, d_, a_ = r_[:-padding], d_[:-padding], a_[:-padding]
        results[i] = (r_, d_, a_)

      for i in dirty:
        chunk_rays, padding = prep_chunk(starts[i])
        if mesh is not None:
          chunk_rays = mesh_lib.put_batch(chunk_rays, mesh)
        out = repair_fn(key_0, key_1, chunk_rays)
        oow = out[5] if len(out) > 5 else 0
        rpending.append((i, (out[0], out[1], out[2], oow), padding))
        while len(rpending) >= max(1, pipeline_depth):
          drain_repair()
      while rpending:
        drain_repair()
      if escalate:
        print(f"render_image: repair stage {stage} left {len(escalate)}/"
              f"{len(dirty)} chunks clamped; escalating")
      dirty = escalate
    print(f"render_image: re-rendered {n_dirty}/{len(starts)} clamped "
          f"chunks through the {len(repair_fns)}-stage repair ladder "
          f"({clamped} window clamps repaired)")
    total_oow = residual
  if total_oow > 0:
    print(f"WARNING: tiled marcher clamped {total_oow} out-of-window "
          "interpolations this image; increase --march_window (or use "
          "--march_mode=scan) for exact results.")
  rgb, distance, acc = [np.concatenate(r, axis=0) for r in zip(*results)]
  if inv_perm is not None:
    rgb, distance, acc = rgb[inv_perm], distance[inv_perm], acc[inv_perm]
  if normalize_disp:
    distance = (distance - distance.min()) / (distance.max() - distance.min())
  out = (rgb.reshape((height, width, -1)),
         distance.reshape((height, width, -1)),
         acc.reshape((height, width, -1)))
  return out + (total_oow,) if return_oow else out
