"""Eikonal path sampler with a learnable residual-gradient (so3) head.

Behavioral parity targets (reference SampleNeRFRO):
  - PathSampler: rnerf/eikonal_utils.py:52-124
  - VoxMLP residual-rotation head and output branches:
    rnerf/ior_utils.py:123-324
  - normal smoothness loss: rnerf/eikonal_utils.py:84-98

TPU design: the so3 MLP parameters are declared as ONE flax param holding a
pytree (samplenerfro_tpu/ops/mlp.py layout) so the eikonal march can run as a
plain jax.lax.scan closing over those arrays — no nn.scan module lifting.
The IOR grid [n, grad n] lives in the non-trainable 'grid' variable
collection: it is a runtime device input to `apply`, never a traced constant
and never differentiated.

Differences from the reference (intentional):
  - The so3 MLP is only evaluated inside the march when the stage uses its
    output (stage "all"); the reference evaluates and discards it every step.
  - The smoothness loss uses a proper jax PRNG key for the probe offsets; the
    reference calls np.random inside a traced function, freezing the offsets
    at trace time (rnerf/eikonal_utils.py:94).
"""

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from samplenerfro_tpu.ops import eikonal as eik_ops
from samplenerfro_tpu.ops import eikonal_tiled as eik_tiled
from samplenerfro_tpu.ops import eikonal_vjp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.ops import mlp as fmlp
from samplenerfro_tpu.ops.pallas import march_kernel


class PathSampler(nn.Module):
  """Marches curved eikonal ray paths through the IOR grid."""
  num_samples: int
  near: float
  far: float
  stage: str
  step_size: float
  spec: grid_ops.GridSpec
  grid_data: Any = None  # np.ndarray [N^3, 4]; used only at init.

  # VoxMLP-equivalent configuration (gin: VoxMLP.*).
  interp_method: str = "linear3"
  use_direct_output: bool = True
  use_residual: bool = True
  normalized: bool = False
  annealed: bool = True
  min_deg_point: int = 0
  max_deg_point: int = 10
  # gin: PathSampler.normal_radius_scale.
  normal_radius_scale: float = 0.1
  # lax.scan unroll factor for the march.
  unroll: int = 8
  # Tile-coherent marching (ops/eikonal_tiled.py): "scan" always uses the
  # per-ray scan marcher; "tiled" requires spatially-coherent ray blocks
  # (pixel tiles) and interpolates from per-block grid windows (all stages,
  # including the "all"-stage so3 refinement); "pallas" runs the fused
  # Mosaic kernel (ops/pallas/march_kernel.py) when the configuration
  # supports it, falling back to "tiled" otherwise. The "all" stage
  # differentiates the march: its gradients come from the analytic
  # reverse sweep (ops/eikonal_vjp.py), so the fused forward is usable in
  # every stage.
  march_mode: str = "scan"
  tile_block: int = 256
  march_window: int = 16
  march_refetch: int = 8
  # Fused-kernel interpolation matmul precision: "highest" is fp32-exact
  # (bit-parity with the XLA marchers; native fp32 ~20 TF/s on v5e);
  # "default" (single-pass bf16, ~43 TF/s) more than halves the per-step
  # one-hot contraction cost — the march's dominant FLOPs — at a small
  # trajectory perturbation (quality-gated on the synthetic exact-GT
  # scene, scripts/validate_quality.py); "high" (bf16x3) is slower than
  # fp32 on v5e, kept for ablation.
  march_interp: str = "highest"
  # Reverse-sweep Jacobian/param-pass dtype for the differentiable "all"
  # stage (ops/eikonal_vjp.py): float32 matches autodiff exactly;
  # bfloat16 is the fast production path (same precision story as the
  # bf16 radiance MLPs, quality-gate via scripts/validate_quality.py).
  march_bwd_dtype: str = "float32"
  # Reverse-sweep implementation for the "all" stage: stepvjp | passes |
  # pallas (ops/eikonal_vjp.py; all parity-tested vs autodiff). "auto"
  # defers to $EIKVJP_IMPL (default pallas — the fused Mosaic reverse
  # sweep, measured 1.94x stepvjp on the 512^3 all stage; falls back to
  # stepvjp at trace time for unsupported configurations).
  march_bwd_impl: str = "auto"
  # "lean" emits only the densely-consumed pos/dir/arclength channels from
  # the fused kernel and subsamples the jittered coarse points IN-KERNEL
  # (march_kernel.march_tiled_pallas_lean) when the caller passes the
  # jitter indices and no consumer needs the dense n / grad-n trajectory
  # (models/nerf.py gates on use_online_sparsity and the stage).
  march_emit: str = "full"
  # "uniform" predicates away the fused kernel's window DMA + interp
  # matmuls + so3 MLP for windows covered entirely by uniform (free-space)
  # bricks of the IOR grid — there the Euler update is exactly
  # p += h/n_amb * d (march_kernel.uniformity_flags). Exact whenever
  # oow == 0, same as the marcher itself. "off" marches every window.
  march_skip: str = "off"

  def setup(self):
    if self.interp_method != "linear3":
      raise NotImplementedError(self.interp_method)
    if self.annealed:
      in_dim = 2 * 3 * (self.max_deg_point - self.min_deg_point)
    else:
      in_dim = 3 + 2 * 3 * (self.max_deg_point - self.min_deg_point)
    num_out = 3
    self.so3_mlp = self.param(
        "so3_mlp",
        lambda key: fmlp.mlp_init(
            key, in_dim, net_depth=4, net_width=128, skip_layer=2,
            num_out_channels=num_out,
            output_init_std=1e-5 if self.use_residual else None))
    # grid_data=None initializes structure-only placeholders (unit IOR) —
    # construct_nerf fills the real arrays AFTER the jitted model init, so
    # a flagship-scale grid (384^3/512^3, up to 2 GB) is never baked into
    # the init executable as a constant.
    nx, ny, nz = self.spec.ndim

    def _init_flat():
      if self.grid_data is None:
        return jnp.ones((nx * ny * nz, 4), jnp.float32)
      return jnp.asarray(self.grid_data, jnp.float32)

    def _init_3d():
      if self.grid_data is None:
        return jnp.ones((nx, ny, nz * 4), jnp.float32)
      return jnp.asarray(self.grid_data, jnp.float32).reshape(nx, ny, nz * 4)

    self.grid = self.variable("grid", "data", _init_flat)
    # March-layout twin [n, n, n*4] for the windowed/fused marchers: the
    # flat->3D reshape is a full HBM relayout (~6 ms/call for 128^3 on
    # v5e), so it is materialized once here instead of inside every
    # train/render step.
    self.grid3d = self.variable("grid", "data3d", _init_3d)
    # Free-space-skip uniformity flags (march_skip="uniform"): static per
    # scene, so they are HOST-precomputed once (march_kernel.
    # host_skip_flags, installed by construct_nerf alongside the grid) —
    # recomputing them inside the jitted step costs a full pass over the
    # grid per call. The all-zeros init means "no brick is uniform": the
    # skip never fires (exact march) until the real flags are installed.
    self.skip_flags = None
    brick = march_kernel.SKIP_BRICK
    if (self.march_skip == "uniform" and nx == ny == nz
        and nx % brick == 0 and nx // brick >= 2):
      nbk = nx // brick
      self.skip_flags = (
          self.variable("grid", "skip_uni",
                        lambda: jnp.zeros((nbk * nbk, nbk), jnp.float32)),
          self.variable("grid", "skip_namb",
                        lambda: jnp.ones((1, 1), jnp.float32)))

  def _embed(self, x, annealed_alpha):
    if self.annealed:
      return math_ops.annealed_pos_enc(
          x, self.min_deg_point, self.max_deg_point,
          alpha=annealed_alpha * self.max_deg_point)
    return math_ops.pos_enc(x, self.min_deg_point, self.max_deg_point,
                            legacy_posenc_order=True)

  def _apply_head(self, raw_out, condition):
    """Map the raw so3 MLP output + grid gradient to the refined gradient."""
    if self.use_residual:
      if self.normalized:
        raise NotImplementedError()
      if self.use_direct_output:
        return eik_ops.rodrigues_rotate(raw_out, condition)
      return eik_ops.spherical_residual(raw_out, condition)
    if self.normalized and self.use_direct_output:
      return (jnp.linalg.norm(condition + 1e-6, axis=-1, keepdims=True)
              * math_ops.safe_l2_normalize(raw_out))
    raise NotImplementedError()

  def wrapper_grad_mlp(self, x, condition=None, annealed_alpha=1.0):
    """Refined IOR gradient at points x (rnerf/ior_utils.py:225-259)."""
    raw_out = fmlp.mlp_apply(self.so3_mlp, self._embed(x, annealed_alpha))
    return self._apply_head(raw_out, condition)

  def compute_normal_loss_and_smooth(self, ray_pos, idx_grad, annealed_alpha,
                                     rng):
    """Smoothness regularizer on the refined gradient field.

    Parity: rnerf/eikonal_utils.py:84-98 (normal loss returns 0.0; only the
    smoothness term is live), except the probe offsets use `rng`.
    """
    pred_grad = self.wrapper_grad_mlp(ray_pos, condition=idx_grad,
                                      annealed_alpha=annealed_alpha)
    factor = math_ops.safe_l2_norm(idx_grad)
    offsets = (jax.random.normal(rng, ray_pos.shape)
               * self.normal_radius_scale
               * jnp.asarray(self.spec.ndelta)[None, None])
    pred_grad_rand = self.wrapper_grad_mlp(
        ray_pos + offsets, condition=idx_grad, annealed_alpha=annealed_alpha)
    smoothness = jnp.sum(jnp.abs((pred_grad - pred_grad_rand) / factor),
                         axis=-1, keepdims=True).mean()
    return 0.0, smoothness

  def __call__(self, origins, directions, annealed_alpha, jitter=None):
    """March paths; returns (pos, unit dirs, arclength, n, grad n).

    Shapes: [batch, S, 3], [batch, S, 3], [batch, S], [batch, S, 1],
    [batch, S, 3] with S = num_samples. Parity: rnerf/eikonal_utils.py:100-124.

    When `jitter` ([num_coarse] int32 dense indices of the per-bin coarse
    subsample) is passed, a SIXTH element is returned: either
    (sub_pos, sub_dir, sub_dist) produced in-kernel (march_emit="lean",
    fused marcher) or None, in which case the caller gathers from the
    dense trajectory as usual. With lean output, n and grad n are None.
    """
    data = self.grid.value
    use_pred = self.stage.startswith("all")
    so3_params = self.so3_mlp
    # Free-space skip argument for the fused kernel: the precomputed
    # (uni, namb) pair when the grid variables exist (zero per-step
    # cost), else True = recompute in-jit (a full grid pass per call).
    if self.march_skip != "uniform":
      skip_arg = None
    elif self.skip_flags is not None:
      skip_arg = (self.skip_flags[0].value, self.skip_flags[1].value)
    else:
      skip_arg = True

    if (jitter is not None and self.march_emit == "lean" and not use_pred
        and self.march_mode == "pallas" and self.march_window > 0
        and march_kernel.supports_lean(
            self.spec, self.num_samples, origins.shape[0],
            int(jitter.shape[-1]), self.tile_block, self.march_window,
            self.march_refetch)):
      pos, dirs, dist, sub_pos, sub_dir, sub_dist, oow = (
          march_kernel.march_tiled_pallas_lean(
              self.spec, self.grid3d.value, origins, directions, self.near,
              self.step_size, self.num_samples, jitter,
              block_size=self.tile_block, window=self.march_window,
              refetch_every=self.march_refetch,
              interp_precision=self.march_interp,
              skip_uniform=skip_arg))
      self.sow("diagnostics", "march_oow", oow,
               init_fn=lambda: jnp.int32(0),
               reduce_fn=lambda a, b: a + b)
      return (pos, dirs, jax.lax.stop_gradient(dist), None, None,
              (sub_pos, sub_dir, jax.lax.stop_gradient(sub_dist)))

    def _ret(pos, dirs, dist, n, g):
      out = (pos, dirs, dist, n, g)
      return out + ((None,) if jitter is not None else ())

    if use_pred:
      def pred_grad_fn(rp, g):
        raw = fmlp.mlp_apply(so3_params, self._embed(rp, annealed_alpha))
        return self._apply_head(raw, g)
    else:
      pred_grad_fn = None

    if (use_pred and self.march_mode in ("tiled", "pallas")
        and origins.shape[0] % self.tile_block == 0
        and self.march_window > 0 and self.march_bwd_impl == "autodiff"):
      # Gradient-fidelity reference: plain autodiff THROUGH the windowed
      # XLA forward (what the analytic sweeps are parity-tested against;
      # ~3x slower — rematerializes the step chain). A/B knob for
      # isolating backward-implementation effects at matched
      # forward trajectories.
      pos, dirs, dist, n, g, oow = eik_tiled.march_tiled(
          self.spec, self.grid3d.value, origins, directions, self.near,
          self.step_size, self.num_samples, block_size=self.tile_block,
          window=self.march_window, refetch_every=self.march_refetch,
          pred_grad_fn=pred_grad_fn, use_pred_grad=True,
          interp_precision=self.march_interp)
      self.sow("diagnostics", "march_oow", oow,
               init_fn=lambda: jnp.int32(0),
               reduce_fn=lambda a, b: a + b)
      return _ret(pos, dirs, jax.lax.stop_gradient(dist), n, g)

    if (use_pred and self.march_mode in ("tiled", "pallas")
        and origins.shape[0] % self.tile_block == 0
        and self.march_window > 0):
      # "all"-stage windowed march with the ANALYTIC reverse sweep
      # (ops/eikonal_vjp.py): forward runs the fused Pallas kernel when
      # supported (tiled otherwise); backward replays the stored path —
      # no autodiff rematerialization of the 768-step chain.
      march = eikonal_vjp.make_march_allstage(
          self.spec, self.near, self.step_size, self.num_samples,
          self.tile_block, self.march_window, self.march_refetch,
          (self.min_deg_point, self.max_deg_point, self.annealed,
           self.use_residual, self.use_direct_output, self.normalized),
          self.march_mode, bwd_dtype=self.march_bwd_dtype,
          bwd_impl=(None if self.march_bwd_impl == "auto"
                    else self.march_bwd_impl),
          fwd_interp=self.march_interp,
          fwd_skip=(True if self.march_skip == "uniform" else None))
      pos, dirs, dist, n, g, oow = march(
          self.grid3d.value, origins, directions,
          jnp.asarray(annealed_alpha, jnp.float32), so3_params,
          skip_flags=(skip_arg if isinstance(skip_arg, tuple) else ()))
      self.sow("diagnostics", "march_oow", oow,
               init_fn=lambda: jnp.int32(0),
               reduce_fn=lambda a, b: a + b)
      return _ret(pos, dirs, jax.lax.stop_gradient(dist), n, g)

    # The fused kernel implements only the shipped so3 branch (annealed
    # PE from degree 0, Rodrigues residual head).
    pallas_so3_ok = (not use_pred
                     or (self.min_deg_point == 0 and self.annealed
                         and self.use_residual and self.use_direct_output
                         and not self.normalized))
    if (self.march_mode == "pallas" and pallas_so3_ok
        and march_kernel.supports(self.spec, self.num_samples,
                                  origins.shape[0], self.tile_block,
                                  self.march_window, self.march_refetch)):
      pos, dirs, dist, n, g, oow = march_kernel.march_tiled_pallas(
          self.spec, self.grid3d.value, origins, directions, self.near,
          self.step_size, self.num_samples, block_size=self.tile_block,
          window=self.march_window, refetch_every=self.march_refetch,
          so3_params=(so3_params if use_pred else None),
          annealed_alpha=annealed_alpha, max_deg=self.max_deg_point,
          interp_precision=self.march_interp, skip_uniform=skip_arg)
      self.sow("diagnostics", "march_oow", oow,
               init_fn=lambda: jnp.int32(0),
               reduce_fn=lambda a, b: a + b)
      return _ret(pos, dirs, jax.lax.stop_gradient(dist), n, g)

    if (self.march_mode in ("tiled", "pallas")
        and origins.shape[0] % self.tile_block == 0):
      pos, dirs, dist, n, g, oow = eik_tiled.march_tiled(
          self.spec, self.grid3d.value, origins, directions, self.near,
          self.step_size,
          self.num_samples, block_size=self.tile_block,
          window=self.march_window, refetch_every=self.march_refetch,
          pred_grad_fn=pred_grad_fn, use_pred_grad=use_pred,
          interp_precision=self.march_interp)
      self.sow("diagnostics", "march_oow", oow,
               init_fn=lambda: jnp.int32(0),
               reduce_fn=lambda a, b: a + b)
      return _ret(pos, dirs, jax.lax.stop_gradient(dist), n, g)

    pos, dirs, dist, n, g = eik_ops.march(
        self.spec, data, origins, directions, self.near, self.step_size,
        self.num_samples, pred_grad_fn=pred_grad_fn, use_pred_grad=use_pred,
        unroll=self.unroll)
    return _ret(pos, dirs, jax.lax.stop_gradient(dist), n, g)
