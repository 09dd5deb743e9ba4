"""The refractive NeRF model: curved-path sampling + coarse/fine radiance.

Behavioral parity targets (reference SampleNeRFRO):
  - NerfModel.__call__: rnerf/models.py:219-535
  - construct_nerf + activation-range validation: rnerf/models.py:538-618
  - aux methods (sparsity loss, envmap forward, point probe):
    rnerf/models.py:139-217

TPU design notes: one forward pass is a single XLA program; the eikonal
march is a lax.scan (models/path_sampler.py), every MLP eval is a fused
[batch*samples, width] matmul stack, and the fine-resampling re-anchor is a
batched searchsorted (ops/render.py) instead of a per-ray fori_loop. The IPE
(mip) featurization the reference ships commented out is available behind
`use_ipe`.
"""

from typing import Any, Callable

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import random

from samplenerfro_tpu.models import mlp as mlp_modules
from samplenerfro_tpu.models import path_sampler as ps_module
from samplenerfro_tpu.ops.pallas import march_kernel
from samplenerfro_tpu.ops.pallas import mlp_kernel as pallas_mlp
from samplenerfro_tpu.ops import grid as grid_ops
from samplenerfro_tpu.ops import math as math_ops
from samplenerfro_tpu.ops import mip as mip_ops
from samplenerfro_tpu.ops import render as render_ops
from samplenerfro_tpu.ops import sh as sh_ops


class NerfModel(nn.Module):
  """Coarse/fine refractive NeRF with a learned directional background."""
  spec: grid_ops.GridSpec
  grid_data: Any  # np.ndarray [N^3, 4] ([n, grad n]); consumed at init.
  stage: str
  use_fine_sparsity: bool
  use_online_sparsity: bool

  num_coarse_samples: int
  num_fine_samples: int
  use_viewdirs: bool
  sh_deg: int
  near: float
  far: float
  noise_std: float
  net_depth: int
  net_width: int
  net_depth_condition: int
  net_width_condition: int
  net_activation: Callable[..., Any]
  skip_layer: int
  num_rgb_channels: int
  num_sigma_channels: int
  white_bkgd: bool
  min_deg_point: int
  max_deg_point: int
  deg_view: int
  lindisp: bool
  rgb_activation: Callable[..., Any]
  sigma_activation: Callable[..., Any]
  legacy_posenc_order: bool
  rgb_padding: float = 0.001
  sigma_bias: float = -1.0

  num_path_samples: int = 8
  sh_direnc_deg: int = -1

  use_mask_bbox: bool = False
  bd_cut_dist: float = None
  cfg_name: str = None
  use_random_choice: bool = True
  use_ipe: bool = False

  # Path-sampler / VoxMLP configuration (wired from gin bindings).
  ps_interp_method: str = "linear3"
  ps_use_direct_output: bool = True
  ps_use_residual: bool = True
  ps_normalized: bool = False
  ps_annealed: bool = True
  ps_normal_radius_scale: float = 0.1
  ps_unroll: int = 8
  march_mode: str = "scan"
  march_bwd_dtype: str = "float32"
  # "all"-stage reverse-sweep implementation ("auto" defers to
  # $EIKVJP_IMPL); see models/path_sampler.py.
  march_bwd_impl: str = "auto"
  tile_block: int = 256
  march_window: int = 16
  march_refetch: int = 8
  # Fused-march interpolation precision ("highest" fp32-exact | "high"
  # bf16x3 fast path); see models/path_sampler.py.
  march_interp: str = "highest"
  # "lean": fused-march kernel emits only pos/dir/arclength densely and
  # subsamples the jittered coarse points in-kernel (no dense n / grad-n
  # trajectory). Auto-demoted to "full" whenever a consumer needs the
  # dense gradients (online sparsity) or the stage differentiates the
  # march; see models/path_sampler.py.
  march_emit: str = "full"
  # "uniform": fused-march kernel skips DMA/interp/so3 for windows of
  # exactly-uniform free-space IOR bricks; see models/path_sampler.py.
  march_skip: str = "off"
  # Radiance-MLP compute dtype ("float32" | "bfloat16"); params stay fp32.
  mlp_dtype: str = "float32"
  mlp_remat: bool = False
  mlp_kernel: str = "xla"

  def setup(self):
    compute_dtype = jnp.bfloat16 if self.mlp_dtype == "bfloat16" \
        else jnp.float32
    # Rematerialized MLPs recompute activations in the backward pass
    # instead of storing ~200 MB/layer of [batch*samples, width] to HBM;
    # the recompute FLOPs are cheap next to the saved bandwidth.
    mlp_cls = (nn.remat(mlp_modules.NerfMLP) if self.mlp_remat
               else mlp_modules.NerfMLP)
    mk_nerf_mlp = lambda: mlp_cls(
        net_depth=self.net_depth,
        net_width=self.net_width,
        net_depth_condition=self.net_depth_condition,
        net_width_condition=self.net_width_condition,
        net_activation=self.net_activation,
        skip_layer=self.skip_layer,
        num_rgb_channels=self.num_rgb_channels,
        num_sigma_channels=self.num_sigma_channels,
        dtype=compute_dtype)
    self.coarse_mlp = mk_nerf_mlp()
    if self.num_fine_samples > 0:
      self.fine_mlp = mk_nerf_mlp()
    self.bkgd_mlp = mlp_modules.MLP(
        net_width=128, net_depth=4, skip_layer=2,
        num_out_channels=self.num_rgb_channels)

    num_samples = self.num_coarse_samples * self.num_path_samples
    step_size = (self.far - self.near) / (num_samples - 1)
    self.path_sampler = ps_module.PathSampler(
        near=self.near,
        far=self.far,
        stage=self.stage,
        num_samples=num_samples,
        step_size=step_size,
        spec=self.spec,
        grid_data=self.grid_data,
        interp_method=self.ps_interp_method,
        use_direct_output=self.ps_use_direct_output,
        use_residual=self.ps_use_residual,
        normalized=self.ps_normalized,
        annealed=self.ps_annealed,
        normal_radius_scale=self.ps_normal_radius_scale,
        unroll=self.ps_unroll,
        march_mode=self.march_mode,
        march_bwd_dtype=self.march_bwd_dtype,
        march_bwd_impl=self.march_bwd_impl,
        tile_block=self.tile_block,
        march_window=self.march_window,
        march_refetch=self.march_refetch,
        march_interp=self.march_interp,
        # Online sparsity consumes the dense grad-n trajectory (the
        # ||grad n|| > 1e-6 masks below); keep the full emit then.
        march_emit=(self.march_emit
                    if not self.use_online_sparsity else "full"),
        march_skip=self.march_skip)

    self.coarse_step_size = (self.far - self.near) / self.num_coarse_samples
    self.fine_step_size = (self.far - self.near) / (
        self.num_coarse_samples + self.num_fine_samples)

  # ---------------------------------------------------------------------
  # Aux methods (reference parity: rnerf/models.py:139-217)
  # ---------------------------------------------------------------------

  def wrapper_compute_normal_loss_and_smooth(self, ray_pos, idx_grad,
                                             annealed_alpha=1.0, rng=None):
    if rng is None:
      rng = random.PRNGKey(0)
    return self.path_sampler.compute_normal_loss_and_smooth(
        ray_pos, idx_grad, annealed_alpha, rng)

  def _encode_dirs(self, dirs):
    if self.sh_direnc_deg > 0:
      return sh_ops.dir_enc(dirs, self.sh_direnc_deg)
    return math_ops.pos_enc(dirs, 0, self.deg_view, self.legacy_posenc_order)

  def _encode_points(self, pts):
    return math_ops.pos_enc(pts, self.min_deg_point, self.max_deg_point,
                            legacy_posenc_order=self.legacy_posenc_order)

  def compute_sparsity_loss(self, ray_pos, coarse_alpha_target,
                            fine_alpha_target):
    """Offline sparsity loss on boundary probe points (models.py:142-179)."""
    ray_dir = jnp.zeros_like(ray_pos)
    samples_enc = self._encode_points(ray_pos)
    viewdirs_enc = self._encode_dirs(ray_dir)

    if self.use_viewdirs:
      _, raw_sigma = self.coarse_mlp(samples_enc, viewdirs_enc)
    else:
      _, raw_sigma = self.coarse_mlp(samples_enc)
    sigma = self.sigma_activation(raw_sigma + self.sigma_bias)
    alpha = 1 - jnp.exp(-self.coarse_step_size * sigma)
    loss_sp = (jnp.abs(alpha - coarse_alpha_target)).mean()
    next_coarse_alpha_target = alpha.mean()

    next_fine_alpha_target = 0.0
    if self.num_fine_samples > 0 and self.use_fine_sparsity:
      if self.use_viewdirs:
        _, raw_sigma = self.fine_mlp(samples_enc, viewdirs_enc)
      else:
        _, raw_sigma = self.fine_mlp(samples_enc)
      sigma = self.sigma_activation(raw_sigma + self.sigma_bias)
      alpha = 1 - jnp.exp(-self.fine_step_size * sigma)
      loss_sp += (jnp.abs(alpha - fine_alpha_target)).mean()
      next_fine_alpha_target = alpha.mean()
    return loss_sp, next_coarse_alpha_target, next_fine_alpha_target

  def forward_envmap(self, viewdirs):
    """Background envmap color for directions (models.py:181-191)."""
    viewdirs_enc = math_ops.pos_enc(viewdirs, 0, self.deg_view,
                                    self.legacy_posenc_order)
    raw_bkgd = self.bkgd_mlp(viewdirs_enc[:, None])[:, 0]
    bkgd = self.rgb_activation(raw_bkgd)
    return bkgd * (1 + 2 * self.rgb_padding) - self.rgb_padding

  def sample_points(self, pts, viewdirs):
    """Probe (rgb, alpha) at arbitrary points (models.py:193-217)."""
    samples_enc = self._encode_points(pts)
    viewdirs_enc = self._encode_dirs(viewdirs)
    use_fine = self.num_fine_samples > 0
    mlp = self.fine_mlp if use_fine else self.coarse_mlp
    step_size = self.fine_step_size if use_fine else self.coarse_step_size
    if self.use_viewdirs:
      raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc)
    else:
      raw_rgb, raw_sigma = mlp(samples_enc)
    rgb = self.rgb_activation(raw_rgb)
    rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding
    sigma = self.sigma_activation(raw_sigma + self.sigma_bias)
    alpha = 1 - jnp.exp(-step_size * sigma)
    return rgb, alpha

  # ---------------------------------------------------------------------
  # Forward pass
  # ---------------------------------------------------------------------

  def _mask_bbox(self, pos):
    """Inside-proxy-bbox mask over sample positions (models.py:261-283)."""
    nmin, nmax = self.spec.nmin, self.spec.nmax
    return (
        (pos[..., 0] >= nmin[0]) * (pos[..., 0] <= nmax[0]) *
        (pos[..., 1] >= nmin[1]) * (pos[..., 1] <= nmax[1]) *
        (pos[..., 2] >= nmin[2]) * (pos[..., 2] <= nmax[2]))

  def _bd_cut_bbox(self, pos):
    """Scene-specific boundary-cut bbox for real scenes (models.py:485-503)."""
    nmin = list(self.spec.nmin)
    nmax = list(self.spec.nmax)
    if "pen" in self.cfg_name:
      nmax[1] -= 0.6
    elif "ball" in self.cfg_name:
      nmin = [-1, 0.03597, -1]
      nmax = [1, 2.03597, 1]
    elif "glass" in self.cfg_name:
      nmax[1] -= 0.7
    else:
      raise NotImplementedError(self.cfg_name)
    mask = (
        (pos[..., 0] >= nmin[0]) * (pos[..., 0] <= nmax[0]) *
        (pos[..., 1] >= nmin[1]) * (pos[..., 1] <= nmax[1]) *
        (pos[..., 2] >= nmin[2]) * (pos[..., 2] <= nmax[2]))
    # Keep everything from the first in-bbox sample to the end (cumsum from
    # the far side, models.py:503).
    return (jnp.cumsum(mask[:, ::-1], axis=-1) > 0.0)[:, ::-1]

  def _use_fused_mlp(self, samples_enc, viewdirs_enc):
    """Whether _decode should take the fused Pallas MLP path."""
    return (self.mlp_kernel in ("pallas", "pallas_pe")
            and not self.is_initializing()
            and self.use_viewdirs
            and self.sh_deg < 0
            and not self.stage.startswith("all")
            and jax.default_backend() == "tpu"
            and pallas_mlp.supports(
                samples_enc.shape[-1], viewdirs_enc.shape[-1],
                self.net_depth, self.net_width, self.skip_layer,
                self.net_depth_condition, self.net_width_condition,
                self.num_rgb_channels, self.num_sigma_channels))

  def _fused_pe(self):
    """(pts_deg, dirs_deg) for in-kernel featurization, or None.

    mlp_kernel="pallas_pe" computes the classic pos_enc INSIDE the fused
    MLP kernel from raw [N, 3] positions/viewdirs (no [N, feat] HBM
    round-trip); only valid when both encoders are the plain non-legacy
    pos_enc (reference rnerf/model_utils.py:187-214) — IPE, SH dir
    encoding, and the legacy interleaved order fall back to the
    feature-fed kernel.
    """
    if (self.mlp_kernel == "pallas_pe" and not self.use_ipe
        and not self.legacy_posenc_order and self.min_deg_point == 0
        and self.sh_direnc_deg <= 0 and self.deg_view > 0
        and self.max_deg_point > 0):
      return (self.max_deg_point, self.deg_view)
    return None

  def _featurize(self, pos, dirs, dists, radii):
    """Point features: classic PE or (use_ipe) mip cone-Gaussian IPE."""
    if self.use_ipe:
      t_vals = jnp.concatenate([
          dists, dists[..., -1:] + jnp.full_like(dists[..., -1:], 1e-3)],
          axis=-1)
      samples = mip_ops.cast_rays(t_vals, pos, dirs, radii, "cone", self.near)
      return mip_ops.integrated_pos_enc(samples, self.min_deg_point,
                                        self.max_deg_point)
    return self._encode_points(pos)

  def _decode(self, mlp, samples_enc, viewdirs_enc, dirs, key, randomized,
              raw_pts=None):
    """MLP eval + noise + SH decode + activations -> (rgb, sigma).

    raw_pts: raw [nb, ns, 3] sample positions — enables the
    featurize-in-kernel fused path (mlp_kernel="pallas_pe"); `dirs`
    doubles as the raw per-sample viewdirs there.
    """
    if self._use_fused_mlp(samples_enc, viewdirs_enc):
      # Fused Pallas MLP: weights resident in VMEM, activations tiled —
      # no inter-layer HBM traffic (ops/pallas/mlp_kernel.py). Gradients
      # flow to the MLP params only; valid because radiance-stage
      # features come from the frozen path sampler ('all' falls back).
      p = mlp.variables["params"]
      nb, ns, fdim = samples_enc.shape
      pe = self._fused_pe() if raw_pts is not None else None
      if pe is not None:
        x_in = raw_pts.reshape(-1, 3)
        c_in = dirs.reshape(-1, 3)
      else:
        x_in = samples_enc.reshape(-1, fdim)
        c_in = viewdirs_enc.reshape(-1, viewdirs_enc.shape[-1])
      rgb, sigma = pallas_mlp.fused_nerf_mlp(
          p, x_in, c_in,
          net_depth=self.net_depth, net_width=self.net_width,
          skip_layer=self.skip_layer,
          cond_width=self.net_width_condition,
          num_rgb=self.num_rgb_channels,
          num_sigma=self.num_sigma_channels,
          dtype=self.mlp_dtype, pe=pe)
      raw_rgb = rgb.reshape(nb, ns, -1)
      raw_sigma = sigma.reshape(nb, ns, -1)
    elif self.use_viewdirs:
      raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc)
    else:
      raw_rgb, raw_sigma = mlp(samples_enc)
    raw_sigma = render_ops.add_gaussian_noise(key, raw_sigma, self.noise_std,
                                              randomized)
    if self.sh_deg >= 0:
      raw_rgb = sh_ops.eval_sh(
          self.sh_deg,
          raw_rgb.reshape(*raw_rgb.shape[:-1], -1, (self.sh_deg + 1)**2),
          dirs)
    rgb = self.rgb_activation(raw_rgb)
    rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding
    sigma = self.sigma_activation(raw_sigma + self.sigma_bias)
    return rgb, sigma

  def __call__(self, rng_0, rng_1, rays, randomized, annealed_alpha=1.0):
    """Render a batch of rays.

    Args:
      rng_0, rng_1: PRNG keys for coarse/fine sampling noise.
      rays: Rays namedtuple (origins, directions, viewdirs, radii), each
        [batch, ...].
      randomized: bool, stratified/jittered sampling.
      annealed_alpha: float in [0, inf), PE annealing progress.

    Returns:
      (ret, loss_sp): ret is a list of per-level tuples
      (comp_rgb, distance, acc, trans, trans_rgb_bkgd); loss_sp the online
      sparsity loss. Parity: rnerf/models.py:219-535.
    """
    key, rng_0 = random.split(rng_0)
    # Jittered 1-of-num_path_samples subsample per coarse bin
    # (models.py:240-247). Computed before the march so the fused kernel
    # can subsample in-kernel (march_emit="lean"); same key/values as the
    # post-march gather, so rng parity is unchanged.
    jitter = jnp.arange(0, self.num_coarse_samples * self.num_path_samples,
                        self.num_path_samples)
    if self.use_random_choice:
      jitter = jitter + random.randint(
          key, [self.num_coarse_samples], minval=0,
          maxval=self.num_path_samples)

    ray_pos, ray_dir, ray_dist, idx_data, idx_grad, sub = self.path_sampler(
        rays.origins, rays.viewdirs, annealed_alpha, jitter=jitter)

    if sub is not None:
      ray_pos_c, ray_dir_c, ray_dist_c = sub
      idx_grad_c = None
    else:
      ray_pos_c = ray_pos[:, jitter]
      ray_dir_c = ray_dir[:, jitter]
      ray_dist_c = ray_dist[:, jitter]
      idx_grad_c = idx_grad[:, jitter]

    samples_enc = self._featurize(ray_pos_c, ray_dir_c, ray_dist_c, rays.radii)
    mask_bbox = self._mask_bbox(ray_pos_c) if self.use_mask_bbox else None
    viewdirs_enc = self._encode_dirs(ray_dir_c)

    # Background color from the exit direction of each path (models.py:303).
    raw_bkgd = self.bkgd_mlp(viewdirs_enc[:, -1:])[:, 0]
    if self.sh_deg >= 0:
      raw_bkgd = sh_ops.eval_sh(
          self.sh_deg,
          raw_bkgd[:, None].reshape(
              *raw_bkgd[:, None].shape[:-1], -1, (self.sh_deg + 1)**2),
          ray_dir_c[:, -1:])[:, 0]
    bkgd = self.rgb_activation(raw_bkgd)
    bkgd = bkgd * (1 + 2 * self.rgb_padding) - self.rgb_padding

    key, rng_0 = random.split(rng_0)
    rgb, sigma = self._decode(self.coarse_mlp, samples_enc, viewdirs_enc,
                              ray_dir_c, key, randomized,
                              raw_pts=ray_pos_c)

    comp_rgb, disp, acc, weights, alpha, trans, trans_rgb_bkgd = (
        render_ops.volumetric_rendering(
            rgb, sigma, ray_dist_c, ray_dir_c,
            white_bkgd=self.white_bkgd, rgb_bkgd=bkgd, mask_bbox=mask_bbox))

    if self.use_online_sparsity:
      mask = jnp.linalg.norm(idx_grad_c, axis=-1) > 1e-6
      loss_sp = (mask * math_ops.safe_log(alpha)).sum() / (jnp.sum(mask) + 1)
    else:
      loss_sp = 0.0

    ret = [(comp_rgb, disp, acc, trans, trans_rgb_bkgd)]

    if self.num_fine_samples > 0:
      key, rng_1 = random.split(rng_1)
      ray_dist_c_mid = 0.5 * (ray_dist_c[..., 1:] + ray_dist_c[..., :-1])
      ray_dist_c, ray_pos_c, ray_dir_c, idx_grad_c = render_ops.sample_pdf(
          key, ray_dist_c_mid, weights[..., 1:-1],
          ray_pos, ray_dir, ray_dist, idx_grad,
          self.num_fine_samples, randomized, jitter, self.near,
          z_coarse=ray_dist_c)

      samples_enc = self._featurize(ray_pos_c, ray_dir_c, ray_dist_c,
                                    rays.radii)
      mask_bbox = self._mask_bbox(ray_pos_c) if self.use_mask_bbox else None
      viewdirs_enc = self._encode_dirs(ray_dir_c)

      key, rng_1 = random.split(rng_1)
      rgb, sigma = self._decode(self.fine_mlp, samples_enc, viewdirs_enc,
                                ray_dir_c, key, randomized,
                                raw_pts=ray_pos_c)

      comp_rgb, disp, acc, _, alpha, trans, trans_rgb_bkgd = (
          render_ops.volumetric_rendering(
              rgb, sigma, ray_dist_c, ray_dir_c,
              white_bkgd=self.white_bkgd, rgb_bkgd=bkgd, mask_bbox=mask_bbox))

      # Real-scene boundary cut: re-render transmittance/background with the
      # scene bbox masks (models.py:479-524).
      if self.bd_cut_dist is not None:
        assert not self.use_mask_bbox, "'use_mask_bbox' is true"
        cut_mask = self._bd_cut_bbox(ray_pos_c)
        _, _, _, _, _, trans, _ = render_ops.volumetric_rendering(
            rgb, sigma, ray_dist_c, ray_dir_c,
            white_bkgd=self.white_bkgd, rgb_bkgd=None, mask_bbox=cut_mask)
        trans_rgb_bkgd, _, _, _, _, _, _ = render_ops.volumetric_rendering(
            rgb, sigma, ray_dist_c, ray_dir_c,
            white_bkgd=self.white_bkgd, rgb_bkgd=bkgd,
            mask_bbox=(1.0 - cut_mask))
        trans_rgb_bkgd = trans * trans_rgb_bkgd

      if self.use_online_sparsity and self.use_fine_sparsity:
        mask = jnp.linalg.norm(idx_grad_c, axis=-1) > 1e-6
        loss_sp += (mask * math_ops.safe_log(alpha)).sum() / (jnp.sum(mask) + 1)

      ret.append((comp_rgb, disp, acc, trans, trans_rgb_bkgd))
    return ret, loss_sp


def get_model(key, example_batch, args, **kwargs):
  """Model-zoo port (rnerf/models.py:34-39)."""
  model_dict = {"nerf": construct_nerf}
  return model_dict[args.model](key, example_batch, args, **kwargs)


def effective_march_interp(args):
  """Stage-aware march interp precision.

  The radiance stage's single-pass-bf16 interp (--march_interp=default)
  is measured quality-neutral (STATUS.md quality A/B: 30.46 vs 30.36 dB
  @2k, 31.26 vs 31.29 @10k). The 'all' (joint-refinement) stage is
  different: its so3 path-refinement gradient starts in a small-signal
  regime (the radiance stage freezes the so3 head at init), and interp
  rounding noise in the TRAINING trajectories can swamp that signal
  (round-5 investigation: parity-fp32 arm +3.1 dB from +10k joint steps
  vs production-bf16 flat). --march_interp_all overrides the interp
  precision for stages whose name starts with 'all'; 'inherit' keeps
  --march_interp.
  """
  interp = str(getattr(args, "march_interp", "highest"))
  allv = str(getattr(args, "march_interp_all", "inherit"))
  stage = str(getattr(args, "stage", None) or "")
  if stage.startswith("all") and allv != "inherit":
    return allv
  return interp


def construct_nerf(key, example_batch, args, ndim, nmin, nmax, grid,
                   gin_overrides=None):
  """Build the NerfModel and init its variables.

  Args:
    key: PRNG key.
    example_batch: dict with "rays" (device-level batch; leading axis is
      consumed per the reference convention).
    args: flags object (utils/config.py).
    ndim/nmin/nmax: grid dims/bounds from mesh.pkl.
    grid: [N^3, 1] (prefiltered) IOR values, np or jnp array.
    gin_overrides: dict of {"NerfModel.x": v, "VoxMLP.x": v,
      "PathSampler.x": v} bindings from the gin file.

  Returns:
    (model, init_variables) — init_variables holds 'params' and the
    non-trainable 'grid' collection. Parity: rnerf/models.py:538-618.
  """
  import numpy as np

  net_activation = getattr(nn, str(args.net_activation))
  rgb_activation = getattr(nn, str(args.rgb_activation))
  sigma_activation = getattr(nn, str(args.sigma_activation))

  # Validate activation ranges (models.py:554-569).
  x = jnp.exp(jnp.linspace(-90, 90, 1024))
  x = jnp.concatenate([-x[::-1], x], 0)
  rgb = rgb_activation(x)
  if jnp.any(rgb < 0) or jnp.any(rgb > 1):
    raise NotImplementedError(
        "Choice of rgb_activation `{}` produces colors outside of [0, 1]"
        .format(args.rgb_activation))
  sigma = sigma_activation(x)
  if jnp.any(sigma < 0):
    raise NotImplementedError(
        "Choice of sigma_activation `{}` produces negative densities".format(
            args.sigma_activation))
  num_rgb_channels = args.num_rgb_channels
  if args.sh_deg >= 0:
    assert not args.use_viewdirs, (
        "You can only use up to one of: SH or use_viewdirs.")
    num_rgb_channels *= (args.sh_deg + 1)**2

  spec = grid_ops.GridSpec(ndim, nmin, nmax)
  grid_values = np.asarray(grid, np.float32).reshape(-1, 1)
  # Host-side gradient: a device [N^3, 3] intermediate is (8, 128)-tile
  # padded 32x in HBM — fatal at flagship grid resolution.
  grad = grid_ops.central_difference_grad_numpy(spec, grid_values)
  grid_data = np.concatenate([grid_values, grad], axis=-1).astype(np.float32)

  g = dict(gin_overrides or {})
  model = NerfModel(
      min_deg_point=args.min_deg_point,
      max_deg_point=args.max_deg_point,
      deg_view=args.deg_view,
      num_coarse_samples=args.num_coarse_samples,
      num_fine_samples=args.num_fine_samples,
      use_viewdirs=args.use_viewdirs,
      sh_deg=args.sh_deg,
      near=args.near,
      far=args.far,
      noise_std=args.noise_std,
      white_bkgd=args.white_bkgd,
      net_depth=args.net_depth,
      net_width=args.net_width,
      net_depth_condition=args.net_depth_condition,
      net_width_condition=args.net_width_condition,
      skip_layer=args.skip_layer,
      num_rgb_channels=num_rgb_channels,
      num_sigma_channels=args.num_sigma_channels,
      lindisp=args.lindisp,
      net_activation=net_activation,
      rgb_activation=rgb_activation,
      sigma_activation=sigma_activation,
      legacy_posenc_order=args.legacy_posenc_order,
      spec=spec,
      # Init with structure-only placeholder grids (the real arrays are
      # installed below): flagship-scale grid_data inside the jitted init
      # would be baked in as a multi-GB constant.
      grid_data=None,
      stage=args.stage,
      num_path_samples=args.num_path_samples,
      use_fine_sparsity=args.use_fine_sparsity,
      use_online_sparsity=args.use_online_sparsity,
      sh_direnc_deg=args.sh_direnc_deg,
      cfg_name=args.config,
      use_mask_bbox=bool(g.get("NerfModel.use_mask_bbox", False)),
      bd_cut_dist=g.get("NerfModel.bd_cut_dist", None),
      use_ipe=bool(g.get("NerfModel.use_ipe", False)),
      ps_interp_method=g.get("VoxMLP.interp_method", "linear3"),
      ps_use_direct_output=bool(g.get("VoxMLP.use_direct_output", True)),
      ps_use_residual=bool(g.get("VoxMLP.use_residual", True)),
      ps_normalized=bool(g.get("VoxMLP.normalized", False)),
      ps_annealed=bool(g.get("VoxMLP.annealed", True)),
      ps_normal_radius_scale=float(
          g.get("PathSampler.normal_radius_scale", 0.1)),
      ps_unroll=int(getattr(args, "scan_unroll", 8)),
      march_mode=str(getattr(args, "march_mode", "scan")),
      march_bwd_dtype=str(getattr(args, "march_bwd_dtype", "float32")),
      march_bwd_impl=str(getattr(args, "march_bwd_impl", "auto")),
      mlp_dtype=str(getattr(args, "mlp_dtype", "float32")),
      mlp_remat=bool(getattr(args, "mlp_remat", False)),
      mlp_kernel=str(getattr(args, "mlp_kernel", "xla")),
      tile_block=int(getattr(args, "tile_size", 16))**2,
      march_window=int(getattr(args, "march_window", 16)),
      march_refetch=int(getattr(args, "march_refetch", 8)),
      march_interp=effective_march_interp(args),
      march_emit=str(getattr(args, "march_emit", "full")),
      march_skip=str(getattr(args, "march_skip", "off")),
  )

  # Batches are flat [batch, ...] host arrays (no per-device leading axis as
  # in the reference's pmap layout). Test examples come as [h, w, C]; init
  # only needs feature dims, so flatten and trim to a few rays.
  rays = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x).reshape(-1, x.shape[-1])[:4],
      example_batch["rays"])
  key1, key2, key3 = random.split(key, num=3)
  # Jit the init: eager flax init dispatches thousands of tiny ops (the
  # march scan), which is very slow on multi-device backends.
  init_fn = jax.jit(lambda k1, k2, k3, r: model.init(
      k1, rng_0=k2, rng_1=k3, rays=r, randomized=args.randomized))
  init_variables = init_fn(key1, key2, key3, rays)

  # Install the real grid arrays (one H2D transfer each, outside any jit).
  init_variables = flax.core.unfreeze(init_variables)
  gcol = init_variables["grid"]["path_sampler"]
  nx, ny, nz = spec.ndim
  gcol["data"] = jnp.asarray(grid_data, jnp.float32)
  gcol["data3d"] = jnp.asarray(grid_data.reshape(nx, ny, nz * 4), jnp.float32)
  if "skip_uni" in gcol:
    # Free-space-skip uniformity flags (march_skip="uniform"): static per
    # scene, host-precomputed once here instead of a full grid pass
    # inside every jitted march (models/path_sampler.py setup).
    flags = march_kernel.host_skip_flags(grid_data, nx)
    if flags is not None:
      gcol["skip_uni"] = jnp.asarray(flags[0])
      gcol["skip_namb"] = jnp.asarray(flags[1])
  return model, init_variables
