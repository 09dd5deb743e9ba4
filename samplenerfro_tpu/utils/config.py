"""Flag/YAML/gin three-tier config system.

Behavioral parity targets (reference SampleNeRFRO):
  - define_flags (~70 absl flags, same names/defaults): rnerf/utils.py:87-245
  - update_flags (YAML overlay, validated keys): rnerf/utils.py:248-257
  - gin Config dataclass: rnerf/utils.py:75-85
  - flag/config snapshots per stage dir: rnerf/utils.py:260-277

The gin layer is provided by utils/gin_lite.py (same file syntax); parsed
bindings are returned as a dict and threaded into model construction.
"""

import dataclasses
import os
from shutil import copyfile

import yaml
from absl import flags

from samplenerfro_tpu.utils import gin_lite

BASE_DIR = "./"

DATASET_NAMES = ["blender", "llff", "nsvf", "opencv"]


@dataclasses.dataclass
class Config:
  """gin-configurable global config (reference rnerf/utils.py:75-85)."""
  kernel_size: int = 3
  kernel_sigma: float = 1.0
  voxel_grid: str = "voxelize"
  radiance_weight_name: str = "radiance"
  ior_weight_name: str = "ior"
  all_weight_name: str = "all"

  @classmethod
  def from_gin(cls, bindings):
    kwargs = {}
    for f in dataclasses.fields(cls):
      key = f"Config.{f.name}"
      if key in bindings:
        kwargs[f.name] = bindings[key]
    return cls(**kwargs)


def define_flags():
  """Define the training/eval flag surface (names match the reference)."""
  flags.DEFINE_multi_string("gin_file", None,
                            "List of paths to the config files.")
  flags.DEFINE_multi_string(
      "gin_param", None, "Newline separated list of Gin parameter bindings.")

  flags.DEFINE_string("train_dir", None, "where to store ckpts and logs")
  flags.DEFINE_string("stage_dir", None,
                      "where to store ckpts and logs of stage")
  flags.DEFINE_string("data_dir", None, "input data directory.")
  flags.DEFINE_string("config", None,
                      "using config files to set hyperparameters.")

  # Dataset flags.
  flags.DEFINE_enum("dataset", "blender", DATASET_NAMES,
                    "The type of dataset feed to nerf.")
  flags.DEFINE_enum(
      "batching", "single_image", ["single_image", "all_images", "tile"],
      "source of ray sampling when collecting training batch; 'tile' "
      "samples random pixel tiles from one image (enables the tiled "
      "eikonal marcher)")
  flags.DEFINE_bool("white_bkgd", True,
                    "using white color as default background.")
  flags.DEFINE_integer("batch_size", 1024,
                       "the number of rays in a mini-batch (for training).")
  flags.DEFINE_integer("factor", 4,
                       "the downsample factor of images, 0 for no downsample.")
  flags.DEFINE_bool("spherify", False, "set for spherical 360 scenes.")
  flags.DEFINE_bool("render_path", False,
                    "render generated path if set true (llff only).")
  flags.DEFINE_integer("llffhold", 8,
                       "will take every 1/N images as LLFF test set.")
  flags.DEFINE_bool("use_pixel_centers", False,
                    "If True, generate rays through the center of each pixel.")
  flags.DEFINE_string("stage", "radiance", "stage of training strategy")
  flags.DEFINE_integer("skip_frames", 1,
                       "skip per-N images when collecting dataset")

  # Model flags.
  flags.DEFINE_string("model", "nerf", "name of model to use.")
  flags.DEFINE_float("near", 2.0, "near clip of volumetric rendering.")
  flags.DEFINE_float("far", 6.0, "far clip of volumentric rendering.")
  flags.DEFINE_integer("net_depth", 8, "depth of the first part of MLP.")
  flags.DEFINE_integer("net_width", 256, "width of the first part of MLP.")
  flags.DEFINE_integer("net_depth_condition", 1,
                       "depth of the second part of MLP.")
  flags.DEFINE_integer("net_width_condition", 128,
                       "width of the second part of MLP.")
  flags.DEFINE_float("weight_decay_mult", 0, "The multiplier on weight decay")
  flags.DEFINE_integer("skip_layer", 4,
                       "add a skip connection every skip_layer layers.")
  flags.DEFINE_integer("num_rgb_channels", 3, "the number of RGB channels.")
  flags.DEFINE_integer("num_sigma_channels", 1,
                       "the number of density channels.")
  flags.DEFINE_bool("randomized", True, "use randomized stratified sampling.")
  flags.DEFINE_integer("min_deg_point", 0,
                       "Minimum degree of positional encoding for points.")
  flags.DEFINE_integer("max_deg_point", 10,
                       "Maximum degree of positional encoding for points.")
  flags.DEFINE_integer("deg_view", 4,
                       "Degree of positional encoding for viewdirs.")
  flags.DEFINE_integer("num_coarse_samples", 64,
                       "the number of coarse samples on each ray.")
  flags.DEFINE_integer("num_fine_samples", 128,
                       "the number of fine samples on each ray.")
  flags.DEFINE_bool("use_viewdirs", True, "use view directions as condition.")
  flags.DEFINE_integer("sh_deg", -1,
                       "set to use SH output up to given degree, -1=disable.")
  flags.DEFINE_integer("sh_direnc_deg", -1,
                       "If > 0, use SH polynomial directional encoding.")
  flags.DEFINE_float("noise_std", None,
                     "std dev of noise added to regularize sigma output.")
  flags.DEFINE_bool("lindisp", False,
                    "sampling linearly in disparity rather than depth.")
  flags.DEFINE_string("net_activation", "relu",
                      "activation function used within the MLP.")
  flags.DEFINE_string("rgb_activation", "sigmoid",
                      "activation function used to produce RGB.")
  flags.DEFINE_string("sigma_activation", "softplus",
                      "activation function used to produce density.")
  flags.DEFINE_bool("legacy_posenc_order", False,
                    "If True, revert to the legacy PE feature ordering.")

  # Train flags.
  flags.DEFINE_float("lr_init", 5e-4, "The initial learning rate.")
  flags.DEFINE_float("lr_final", 5e-6, "The final learning rate.")
  flags.DEFINE_integer("lr_delay_steps", 2500,
                       "warmup steps with reduced learning rate.")
  flags.DEFINE_float("lr_delay_mult", 0.01,
                     "LR multiplier during the warmup window.")
  flags.DEFINE_float("grad_max_norm", 0.0,
                     "gradient clipping magnitude (disabled if == 0).")
  flags.DEFINE_float("grad_max_val", 0.0,
                     "gradient clipping value (disabled if == 0).")
  flags.DEFINE_integer("max_steps", 1000000,
                       "the number of optimization steps.")
  flags.DEFINE_integer("save_every", 10000,
                       "the number of steps to save a checkpoint.")
  flags.DEFINE_integer("print_every", 100,
                       "the number of steps between tensorboard reports.")
  flags.DEFINE_integer("render_every", 5000,
                       "the number of steps to render a test image.")
  flags.DEFINE_integer("gc_every", 10000,
                       "the number of steps to run garbage collection.")
  flags.DEFINE_integer(
      "steps_per_dispatch", 1,
      "optimizer steps per jitted train dispatch: >1 stacks that many "
      "batches and lax.scans the step inside one jit call, amortizing the "
      "per-call host dispatch overhead (bitwise-identical training; "
      "print/save/render/gc cadences must be multiples of it).")
  flags.DEFINE_integer(
      "render_chunks_per_dispatch", 1,
      "eval-render chunks per jitted dispatch: >1 stacks that many "
      "full-size chunks and lax.maps the render inside one jit call "
      "(bit-identical output), amortizing the per-call host dispatch "
      "overhead; ragged tails render per-chunk.")
  flags.DEFINE_integer("precrop_iters", 0,
                       "number of steps to train on central crops.")
  flags.DEFINE_float("precrop_frac", 0.5,
                     "fraction of img taken for central crops.")
  flags.DEFINE_integer("num_path_samples", 8,
                       "the number of super-sampled eikonal path")
  flags.DEFINE_float("sparsity_weight", 0.0, "sparsity loss weight")
  flags.DEFINE_bool("use_fine_sparsity", False,
                    "also apply sparsity to the fine MLP")
  flags.DEFINE_bool("use_online_sparsity", True,
                    "use in-path sparsity instead of the extra dataset")
  flags.DEFINE_integer("extra_batch_size", 1024,
                       "batch size for extra dataset")
  flags.DEFINE_float("normal_loss_weight", 0.0, "normal loss weight")
  flags.DEFINE_float("normal_smooth_weight", 0.0, "normal smooth weight")
  flags.DEFINE_integer("anneal_delay_steps", 80000,
                       "annealing start step for PE frequency easing")
  flags.DEFINE_integer("anneal_max_steps", 160000,
                       "step at which PE annealing reaches max frequency")
  flags.DEFINE_float("beta_weight", 0.0,
                     "beta distribution prior in Neural Volume")
  flags.DEFINE_float("bg_weight", 0.0,
                     "boundary loss for density regularization")
  flags.DEFINE_float("bg_smooth_weight", 0.0, "envmap smoothness weight")
  flags.DEFINE_integer("bg_patch_size", 0, "envmap patch size")

  # Eval flags.
  flags.DEFINE_bool("eval_once", True,
                    "evaluate once, or keep watching for new checkpoints.")
  flags.DEFINE_bool("save_output", True,
                    "save predicted images to disk if True.")
  flags.DEFINE_integer("chunk", 8192,
                       "the size of chunks for evaluation inferences.")
  flags.DEFINE_bool("eval_train", False, "evaluate the training views")

  # TPU-specific additions (not present in the reference).
  flags.DEFINE_string("matmul_precision", "highest",
                      "jax default matmul precision: highest|float32|"
                      "tensorfloat32|bfloat16_3x|bfloat16|default.")
  flags.DEFINE_bool("profile", False,
                    "capture a jax profiler trace of a few train steps.")
  flags.DEFINE_integer("scan_unroll", 8,
                       "unroll factor for the eikonal march lax.scan.")
  flags.DEFINE_enum("march_mode", "scan", ["scan", "tiled", "pallas"],
                    "eikonal marcher: per-ray scan (reference-parity "
                    "batching), tile-coherent windowed marching, or the "
                    "fused Pallas TPU kernel (tile-ordered ray blocks; "
                    "falls back to tiled/scan where unsupported; the "
                    "'all' training stage uses tiled for march gradients).")
  flags.DEFINE_integer("tile_size", 16,
                       "pixel tile side for the tiled marcher.")
  flags.DEFINE_integer("tile_stride", 1,
                       "pixel stride inside each training tile "
                       "(--batching=tile): stride s spreads the "
                       "tile_size^2 rays over a (tile_size*s)^2 region, "
                       "cutting intra-tile pixel correlation s^2-fold "
                       "while keeping march-block coherence (window "
                       "auto-calibration absorbs the extra drift).")
  flags.DEFINE_bool("tile_images", False,
                    "sample each training tile from an independent image "
                    "(--batching=tile) instead of one image per batch.")
  flags.DEFINE_integer("march_window", 16,
                       "grid-point window side for the tiled marcher; 0 "
                       "auto-calibrates the smallest violation-free window "
                       "on probe batches.")
  flags.DEFINE_integer("march_refetch", 8,
                       "steps between window refetches in the tiled marcher.")
  flags.DEFINE_enum("march_interp", "highest", ["highest", "high",
                                                 "default"],
                    "fused-march interpolation matmul precision: highest "
                    "is fp32-exact (bit-parity with the XLA marchers; "
                    "native fp32 on v5e, ~20 TF/s), high is bf16x3 "
                    "(~14 TF/s - slower than fp32 on v5e, kept for "
                    "ablation), default is single-pass bf16 (~43 TF/s, "
                    "2.15x; quality-gate via validate_quality.py).")
  flags.DEFINE_enum("march_interp_all", "inherit",
                    ["inherit", "highest", "high", "default"],
                    "march interp precision override for the 'all' "
                    "(joint-refinement) stage only: inherit uses "
                    "--march_interp; highest forces fp32-exact "
                    "trajectories there while radiance stages keep the "
                    "fast bf16 interp (the all stage's small-signal so3 "
                    "refinement is sensitive to interp rounding noise; "
                    "see STATUS.md round-5 quality investigation).")
  flags.DEFINE_enum("march_emit", "full", ["full", "lean"],
                    "fused-march output channels: full emits the dense "
                    "[batch, S, 11] trajectory (pos/dir/dist/n/grad-n); "
                    "lean emits only the densely-consumed pos/dir/dist "
                    "and subsamples the jittered coarse points in-kernel "
                    "(auto-demoted to full for online sparsity and the "
                    "'all' stage).")
  flags.DEFINE_enum("march_skip", "off", ["off", "uniform"],
                    "fused-march free-space skip: uniform predicates away "
                    "the window DMA + interp matmuls + so3 MLP for windows "
                    "covered by exactly-uniform IOR bricks (free space), "
                    "where the Euler update is exactly p += h/n_amb * d. "
                    "Exact whenever march_oow == 0. off marches every "
                    "window ($MARCH_SKIP is the env ablation override).")
  flags.DEFINE_enum("march_bwd_dtype", "float32", ["float32", "bfloat16"],
                    "compute dtype of the 'all'-stage analytic reverse "
                    "sweep's batched Jacobian/parameter passes "
                    "(ops/eikonal_vjp.py); float32 matches autodiff "
                    "exactly, bfloat16 is the fast production path.")
  flags.DEFINE_enum("march_bwd_impl", "auto",
                    ["auto", "stepvjp", "passes", "pallas", "autodiff"],
                    "'all'-stage reverse-sweep implementation "
                    "(ops/eikonal_vjp.py): stepvjp (per-step adjoint in "
                    "the reverse scan), passes (batched three-pass XLA "
                    "formulation; measured slower on v5e), pallas (fused "
                    "Mosaic reverse kernel), autodiff (plain jax.grad "
                    "through the windowed forward — the gradient-fidelity "
                    "reference, slow). auto defers to $EIKVJP_IMPL "
                    "(default stepvjp). All parity-tested vs autodiff.")
  flags.DEFINE_enum("mlp_dtype", "float32", ["float32", "bfloat16"],
                    "radiance-MLP compute dtype (params stay fp32); "
                    "bfloat16 is an opt-in fast path, quality-gate it on "
                    "your scene (scripts/validate_quality.py).")
  flags.DEFINE_enum("mlp_kernel", "xla", ["xla", "pallas", "pallas_pe"],
                    "radiance-MLP execution: XLA Dense stack, the fused "
                    "Pallas kernel (weights VMEM-resident, no inter-layer "
                    "HBM traffic), or pallas_pe (additionally computes "
                    "the pos_enc featurization IN-kernel from raw [N,3] "
                    "points/dirs — no feature HBM round-trip; falls back "
                    "to feature-fed when IPE/SH/legacy order is on). "
                    "TPU-only; 'all' stage and SH decoding fall back "
                    "to xla.")
  flags.DEFINE_bool("mlp_remat", False,
                    "rematerialize radiance-MLP activations in the "
                    "backward pass (recompute instead of ~200 MB/layer "
                    "of HBM activation traffic); numerically identical.")
  flags.DEFINE_enum("march_oow_action", "fallback",
                    ["warn", "fail", "fallback"],
                    "what to do when the tiled marcher reports out-of-window "
                    "clamps during training: log a warning only, abort, or "
                    "permanently fall back to the exact scan marcher.")


def update_flags(args):
  """Overlay YAML config onto flags; reject unknown keys.

  Precedence (deliberate improvement over the reference's
  rnerf/utils.py:248-257, where the yaml clobbers everything): a flag the
  user EXPLICITLY passed on the command line wins over the yaml overlay —
  so `--config=scene --max_steps=12000` extends a run without editing the
  scene yaml (the staged all-stage flow and A/B drivers rely on this).
  """
  pth = os.path.join(BASE_DIR, args.config + ".yaml")
  with open(pth, "r") as fin:
    configs = yaml.load(fin, Loader=yaml.FullLoader)
  invalid_args = list(set(configs.keys()) - set(dir(args)))
  if invalid_args:
    raise ValueError(f"Invalid args {invalid_args} in {pth}.")
  # setattr (NOT args.__dict__.update): on absl FlagValues a __dict__
  # write creates an instance attribute that permanently SHADOWS the
  # flag — later `FLAGS.key = value` assignments update the flag but
  # reads keep returning the stale yaml value (this silently broke the
  # march-window fallback ladder and --march_window=0 auto-calibration
  # for yaml-configured keys).
  for k, v in configs.items():
    try:
      if args[k].present:  # explicitly set on the command line
        continue
    except (KeyError, TypeError, AttributeError):
      pass  # not a FlagValues container (tests use plain namespaces)
    setattr(args, k, v)


def load_config(flag_values=None):
  """Parse gin files/params -> (Config, bindings dict)."""
  fv = flag_values if flag_values is not None else flags.FLAGS
  bindings = gin_lite.parse_files_and_bindings(fv.gin_file, fv.gin_param)
  return Config.from_gin(bindings), bindings


def save_flags(args):
  copyfile(os.path.join(BASE_DIR, args.config + ".yaml"),
           os.path.join(args.stage_dir, "flags.yaml"))
  with open(os.path.join(args.stage_dir, "flags.txt"), "w") as f:
    f.write(flags.FLAGS.flags_into_string())


def save_config(args, bindings):
  copyfile(os.path.join(BASE_DIR, args.config + ".gin"),
           os.path.join(args.stage_dir, "config.gin"))
  with open(os.path.join(args.stage_dir, "config.txt"), "w") as f:
    f.write(gin_lite.config_str(bindings))


def apply_platform_overrides():
  """Honor SAMPLENERFRO_FORCE_CPU even when a TPU plugin self-registers.

  Some images register a TPU PJRT plugin via sitecustomize and set
  jax_platforms programmatically; tests/subprocesses that must run on CPU
  set this env var.
  """
  import jax
  if os.environ.get("SAMPLENERFRO_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def maybe_initialize_distributed():
  """Start the multi-process JAX runtime when launched under a coordinator.

  Multi-host TPU pods (or GPU clusters) set JAX coordinator env vars
  (JAX_COORDINATOR_ADDRESS or the TPU pod runtime does it implicitly);
  jax.distributed.initialize is a no-op requirement single-host, so only
  call it when an explicit coordinator is configured.
  """
  import jax
  if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
      "COORDINATOR_ADDRESS"):
    jax.distributed.initialize()


def apply_matmul_precision(precision):
  """Set the session default matmul precision (TPU parity/perf knob)."""
  import jax
  if precision and precision != "default":
    jax.config.update("jax_default_matmul_precision", precision)


def resolve_mosaic(flags_obj):
  """Gate Mosaic-dependent paths when the remote-compile relay is down.

  On relay-backed TPU environments a dead relay makes the FIRST
  pallas_call lowering block forever (utils/mosaic_probe.py). When the
  run wants the fused kernels (march_mode=pallas on a TPU backend), probe
  once; on failure set SAMPLENERFRO_MOSAIC=0 so every capability check
  (ops/pallas/march_kernel.py:mosaic_off) demotes to the XLA tiled
  marcher + stepvjp reverse sweep instead of hanging. Returns True iff
  Mosaic is usable. No-op (True) for non-pallas modes and CPU backends.
  """
  import jax
  if getattr(flags_obj, "march_mode", None) != "pallas":
    return True
  if jax.default_backend() != "tpu":
    return True
  from samplenerfro_tpu.utils import mosaic_probe
  if mosaic_probe.probe():
    return True
  os.environ["SAMPLENERFRO_MOSAIC"] = "0"
  print("WARNING: Mosaic remote-compile relay unavailable — the fused "
        "Pallas march/reverse kernels are disabled for this run; the XLA "
        "tiled marcher and stepvjp reverse sweep take over (slower, same "
        "results). Set SAMPLENERFRO_MOSAIC=1 to force pallas.", flush=True)
  return False
