"""On-device probe: is the pallas reverse-sweep so3 grad deviation caused
by ReLU-mask flips from layout-dependent MXU accumulation order?

The fused reverse kernel recomputes the so3 MLP activations as transposed
matmuls (WkT [out, in] @ h [in, R]); XLA autodiff (and stepvjp, which
passes the gate) recomputes them via the forward layout (h [R, in] @ Wk
[in, out]). fp32 HIGHEST matmuls on the MXU are correctly rounded per
element only for a fixed accumulation order — the two layouts may tile
the contraction differently, so activations within ~1 ulp of 0 can land
on opposite sides of the h > 0 ReLU gate. A flipped mask makes a
DISCRETE jump in the parameter cotangent (one whole dh outer-product row
appears/disappears), which shows up first in the bias gradients (pure
sums of dh rows) — exactly the observed grad_pallas_so3 Dense_0 bias
deviation (BENCH_r03.json).

This probe runs both layouts of the so3 forward on the SAME inputs the
selfcheck uses and counts sign disagreements of the pre-activations,
plus the magnitude of the smallest |preact| per layer. If flips > 0 and
the deviation scale matches |w1 @ dh2| per flipped unit, the deviation
is a benign subgradient-choice artifact, not a kernel bug.

Usage: python scripts/debug/probe_so3_relu.py   (real TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import random
from jax.experimental import pallas as pl

from samplenerfro_tpu.ops import eikonal_tiled as eikt
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_kernel as mk
from samplenerfro_tpu.train import selfcheck

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

SO3_KEY = selfcheck.SO3_KEY
grid_n, window, refetch = 128, 16, 8
block_size, s_grad = 256, 192
spec = grid_ops.GridSpec([grid_n] * 3, [-1.5] * 3, [1.5] * 3)
data, data3d = selfcheck._blob_grid3d(spec, grid_n)
o, d = selfcheck._center_tile_rays(block_size)
near, far = 2.0, 6.0
h = (far - near) / (768 - 1)

in_dim = 2 * 3 * SO3_KEY[1]
so3 = fmlp.mlp_init(random.PRNGKey(7), in_dim, net_depth=4, net_width=128,
                    skip_layer=2, num_out_channels=3, output_init_std=1e-2)
alpha = 0.6  # python float: pallas kernels cannot capture traced constants
max_deg = SO3_KEY[1]

# The trajectory positions the selfcheck actually differentiates through.
pred = lambda rp, g: rp * 0  # positions only; pred output irrelevant here
pos = eikt.march_tiled(spec, data3d, o, d, near, h, s_grad,
                       block_size=block_size, window=window,
                       refetch_every=refetch)[0]
pts_t = jnp.transpose(pos.reshape(-1, 3), (1, 0))  # [3, N]

wts_t = tuple(
    jnp.transpose(jnp.asarray(so3[k]["kernel"], jnp.float32), (1, 0))
    for k in ("Dense_0", "Dense_1", "Dense_2", "Dense_3", "Dense_out"))
bstack = jnp.zeros((128, 5), jnp.float32)
for i in range(4):
  bstack = bstack.at[:, i].set(so3[f"Dense_{i}"]["bias"])
bstack = bstack.at[0:3, 4].set(so3["Dense_out"]["bias"])


def preacts_transposed_kernel(p_t):
  """Pre-activations via a Pallas kernel in the bwd kernel's layout."""
  n = p_t.shape[1]

  def kern(p_ref, w0t, w1t, w2t, w3t, woutt, b_ref, o1, o2, o3):
    x = mk._annealed_pe_t(p_ref[:], alpha, max_deg)
    b = b_ref[:]

    def matm(wt, hh):
      return jax.lax.dot_general(
          wt[:], hh, (((1,), (0,)), ((), ())),
          precision=jax.lax.Precision.HIGHEST,
          preferred_element_type=jnp.float32)

    pre1 = matm(w0t, x) + b[:, 0:1]
    h1 = jnp.maximum(pre1, 0.0)
    pre2 = matm(w1t, h1) + b[:, 1:2]
    h2 = jnp.maximum(pre2, 0.0)
    pre3 = matm(w2t, h2) + b[:, 2:3]
    o1[...] = pre1
    o2[...] = pre2
    o3[...] = pre3

  # Chunk the lane axis: 128x49152 fp32 x3 outputs blow the 16 MB scoped
  # VMEM stack in one call.
  chunk = 4096
  call = pl.pallas_call(
      kern,
      out_shape=[jax.ShapeDtypeStruct((128, chunk), jnp.float32)] * 3,
  )
  parts = [call(p_t[:, i:i + chunk], *wts_t, bstack)
           for i in range(0, n, chunk)]
  return [jnp.concatenate(cols, axis=1) for cols in zip(*parts)]


def preacts_xla(p):
  """Pre-activations via the XLA forward layout (autodiff's recompute)."""
  from samplenerfro_tpu.ops import math as math_ops
  x = math_ops.annealed_pos_enc(p, 0, max_deg, alpha=alpha * max_deg)
  pre1 = x @ so3["Dense_0"]["kernel"] + so3["Dense_0"]["bias"]
  h1 = jnp.maximum(pre1, 0.0)
  pre2 = h1 @ so3["Dense_1"]["kernel"] + so3["Dense_1"]["bias"]
  h2 = jnp.maximum(pre2, 0.0)
  pre3 = h2 @ so3["Dense_2"]["kernel"] + so3["Dense_2"]["bias"]
  return pre1, pre2, pre3


k_pre = [np.asarray(a).T for a in preacts_transposed_kernel(pts_t)]
x_pre = [np.asarray(a) for a in jax.jit(preacts_xla)(pos.reshape(-1, 3))]

for i, (a, b) in enumerate(zip(k_pre, x_pre), 1):
  flips = np.sum((a > 0) != (b > 0))
  dev = np.abs(a - b).max()
  near0 = np.abs(b).min()
  print(f"layer {i}: preact max dev {dev:.3e}, relu flips {flips} "
        f"of {a.size} (min |preact| {near0:.3e})")
