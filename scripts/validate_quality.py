"""End-to-end quality validation on the synthetic refractive scene.

Generates the scene (exact eikonal ground truth), trains the radiance
stage with a given batching mode, and reports val-view PSNR. Used to
compare iid-pixel vs tile batching and to sanity-check convergence.

Usage: python scripts/validate_quality.py --steps 2000 --batching tile
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG_YAML = """\
dataset: blender
batching: {batching}
factor: 0
batch_size: {batch_size}
num_coarse_samples: 64
num_fine_samples: 128
num_path_samples: 12
use_viewdirs: true
white_bkgd: false
use_pixel_centers: true
randomized: true
max_steps: {steps}
lr_delay_steps: 500
lr_init: 0.0005
render_every: 0
save_every: {steps}
print_every: 100
sh_deg: -1
sh_direnc_deg: -1
sparsity_weight: 0.0
use_online_sparsity: false
extra_batch_size: 16
bg_weight: 0.025
bg_smooth_weight: 1.0
bg_patch_size: 64
anneal_delay_steps: 500
anneal_max_steps: {anneal_max}
net_depth: 8
net_width: 256
chunk: 8192
march_mode: {march_mode}
tile_size: 16
march_window: {march_window}
march_refetch: {march_refetch}
"""

GIN = """\
VoxMLP.interp_method = 'linear3'
VoxMLP.use_direct_output = True
VoxMLP.use_residual = True
VoxMLP.annealed = True
PathSampler.normal_radius_scale = 0.1
Config.kernel_size = 0
Config.kernel_sigma = 1.0
Config.voxel_grid = 'voxelize'
NerfModel.use_mask_bbox = False
"""


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--steps", type=int, default=2000)
  p.add_argument("--batch_size", type=int, default=1024)
  p.add_argument("--batching", default="single_image",
                 choices=["single_image", "tile"])
  p.add_argument("--march_mode", default=None,
                 help="default: tiled when batching=tile else scan")
  p.add_argument("--march_window", type=int, default=16)
  p.add_argument("--march_refetch", type=int, default=8)
  p.add_argument("--workdir", default="/tmp/snr_quality")
  p.add_argument("--skip_scene", action="store_true")
  p.add_argument("--ipe", action="store_true",
                 help="enable mip IPE featurization (NerfModel.use_ipe)")
  p.add_argument("--mlp_dtype", default="float32",
                 choices=["float32", "bfloat16"])
  p.add_argument("--all_steps", type=int, default=0,
                 help="after the radiance stage, seed the joint-refinement "
                 "('all') stage from its checkpoint and train this many "
                 "more steps (reports both PSNRs)")
  p.add_argument("--march_bwd_dtype", default="float32",
                 choices=["float32", "bfloat16"],
                 help="all-stage reverse-sweep dtype (ops/eikonal_vjp.py)")
  p.add_argument("--march_bwd_impl", default="auto",
                 choices=["auto", "stepvjp", "passes", "pallas", "autodiff"],
                 help="all-stage reverse-sweep implementation (gradient-"
                 "fidelity A/B knob; ops/eikonal_vjp.py)")
  p.add_argument("--march_interp", default="highest",
                 choices=["highest", "high", "default"],
                 help="fused-march interpolation precision (A/B knob)")
  p.add_argument("--march_interp_all", default="inherit",
                 choices=["inherit", "highest", "high", "default"],
                 help="all-stage TRAIN interp override (stage-aware knob; "
                 "the all-stage EVAL always renders at highest so arms "
                 "differ only in training precision)")
  p.add_argument("--all_tag", default="",
                 help="suffix for the all-stage dir so multiple all-stage "
                 "arms (e.g. interp A/B) can share one radiance checkpoint")
  p.add_argument("--march_skip", default="off", choices=["off", "uniform"],
                 help="fused-march uniform-window free-space skip (A/B "
                 "knob; exact when march_oow == 0)")
  p.add_argument("--tile_stride", type=int, default=1,
                 help="pixel stride inside each training tile (tile-"
                 "batching decorrelation A/B knob)")
  p.add_argument("--tile_images", action="store_true",
                 help="sample each training tile from an independent image")
  p.add_argument("--steps_per_dispatch", type=int, default=1,
                 help="amortize host dispatch: K train steps per jitted "
                 "call (checkpoint-bit-exact; tests/test_e2e_smoke.py)")
  args = p.parse_args()
  march_mode = args.march_mode or (
      "tiled" if args.batching == "tile" else "scan")

  data_dir = os.path.join(args.workdir, "scene")
  if not args.skip_scene and not os.path.exists(
      os.path.join(data_dir, "transforms_train.json")):
    from samplenerfro_tpu.tools import synth
    print("generating synthetic scene...")
    synth.make_scene(data_dir)

  tag = f"{args.batching}_{march_mode}_w{args.march_window}"
  if args.march_refetch != 8:
    tag += f"_r{args.march_refetch}"
  if args.batch_size != 1024:
    tag += f"_b{args.batch_size}"
  if args.ipe:
    tag += "_ipe"
  if args.mlp_dtype != "float32":
    tag += f"_{args.mlp_dtype}"
  if args.march_interp != "highest":
    tag += f"_interp-{args.march_interp}"
  if args.march_bwd_impl != "auto":
    tag += f"_bwd-{args.march_bwd_impl}"
  if args.march_skip != "off":
    tag += "_skip"
  if args.tile_stride != 1:
    tag += f"_ts{args.tile_stride}"
  if args.tile_images:
    tag += "_timg"
  cfg_base = os.path.join(args.workdir, f"cfg_{tag}")
  with open(cfg_base + ".yaml", "w") as f:
    # Annealing window scales with the budget (the reference anneals over
    # 80% of its 200k-step run); <=2k-step runs keep the round-1/2 anchor
    # schedule for comparability.
    anneal_max = max(2000, int(0.8 * args.steps))
    f.write(CONFIG_YAML.format(batching=args.batching, steps=args.steps,
                               march_mode=march_mode,
                               march_window=args.march_window,
                               march_refetch=args.march_refetch,
                               batch_size=args.batch_size,
                               anneal_max=anneal_max))
    f.write(f"mlp_dtype: {args.mlp_dtype}\n")
  with open(cfg_base + ".gin", "w") as f:
    f.write(GIN)
    if args.ipe:
      f.write("NerfModel.use_ipe = True\n")

  train_dir = os.path.join(args.workdir, f"logs_{tag}")
  stage = "radiance_quality"
  env = dict(os.environ)
  psnr_file = os.path.join(train_dir, stage, "test_preds", "psnr.txt")
  ckpt_file = os.path.join(train_dir, stage, f"checkpoint_{args.steps}")
  radiance_cmds = (
      ("train", "train.py", []),
      ("eval", "eval.py",
       [f"--gin_param=Config.radiance_weight_name='{stage}'",
        "--eval_once=True"]))
  if os.path.exists(psnr_file) and os.path.exists(ckpt_file):
    # Resume semantics: a finished radiance stage (checkpoint at the full
    # budget + recorded PSNR) is reused, so multiple --all_tag arms can
    # share one radiance run.
    print(f"radiance stage complete ({ckpt_file}); skipping to all stage")
    radiance_cmds = ()
  for cmd_name, script, extra in radiance_cmds:
    cmd = [sys.executable, os.path.join(REPO, script),
           f"--data_dir={data_dir}", f"--train_dir={train_dir}",
           f"--config={cfg_base}", f"--gin_file={cfg_base}.gin",
           f"--stage={stage}",
           f"--march_interp={args.march_interp}",
           f"--march_skip={args.march_skip}",
           f"--tile_stride={args.tile_stride}",
           f"--tile_images={str(args.tile_images).lower()}",
           f"--steps_per_dispatch={args.steps_per_dispatch}"] + extra
    print("running", cmd_name, "...")
    proc = subprocess.run(cmd, env=env, cwd=REPO)
    if proc.returncode != 0:
      raise SystemExit(f"{cmd_name} failed")

  print(f"RESULT {tag}: PSNR = {open(psnr_file).read()}")

  if args.all_steps > 0:
    # Joint-refinement stage, seeded from the radiance checkpoint (the
    # staged-training flow: copy the radiance stage dir so the all stage
    # resumes from its params; max_steps extends past the radiance budget).
    import shutil
    all_stage = "all_quality" + (f"_{args.all_tag}" if args.all_tag else "")
    all_dir = os.path.join(train_dir, all_stage)
    if not os.path.exists(all_dir):
      shutil.copytree(os.path.join(train_dir, stage), all_dir)
      shutil.rmtree(os.path.join(all_dir, "test_preds"), ignore_errors=True)
    total = args.steps + args.all_steps
    for cmd_name, script, extra in (
        ("train(all)", "train.py",
         [f"--march_interp_all={args.march_interp_all}"]),
        ("eval(all)", "eval.py",
         [f"--gin_param=Config.all_weight_name='{all_stage}'",
          # Arms differ only in TRAINING precision: the all-stage eval
          # always renders trajectories at fp32-exact interp.
          "--march_interp_all=highest",
          "--eval_once=True"])):
      cmd = [sys.executable, os.path.join(REPO, script),
             f"--data_dir={data_dir}", f"--train_dir={train_dir}",
             f"--config={cfg_base}", f"--gin_file={cfg_base}.gin",
             f"--stage={all_stage}", f"--max_steps={total}",
             f"--save_every={total}",
             f"--march_interp={args.march_interp}",
             f"--march_skip={args.march_skip}",
             f"--tile_stride={args.tile_stride}",
             f"--tile_images={str(args.tile_images).lower()}",
             f"--steps_per_dispatch={args.steps_per_dispatch}",
             f"--march_bwd_dtype={args.march_bwd_dtype}",
             f"--march_bwd_impl={args.march_bwd_impl}"] + extra
      print("running", cmd_name, "...")
      proc = subprocess.run(cmd, env=env, cwd=REPO)
      if proc.returncode != 0:
        raise SystemExit(f"{cmd_name} failed")
    psnr_file = os.path.join(train_dir, all_stage, "test_preds", "psnr.txt")
    print(f"RESULT {tag} all-stage(+{args.all_steps}): "
          f"PSNR = {open(psnr_file).read()}")


if __name__ == "__main__":
  main()
