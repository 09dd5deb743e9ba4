"""Export a trained checkpoint to the reference repo's on-disk layout.

Takes a stage dir written by this framework's train.py and writes a
checkpoint the original SampleNeRFRO code can consume directly
(eval.py:124-152 surgery: restore_checkpoint(..., None) then
ckpt["params"]["params"][subtree]) — the inverse of the reference-layout
importer in samplenerfro_tpu/train/checkpoints.py.

Usage:
  python scripts/export_reference_ckpt.py \
      --stage_dir /path/to/train_dir/<stage> --out_dir /path/to/export
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flax.training import checkpoints as flax_ckpt  # noqa: E402

from samplenerfro_tpu.train import checkpoints as ckpt_lib  # noqa: E402


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--stage_dir", required=True,
                 help="stage dir holding this framework's checkpoint_<step>")
  p.add_argument("--out_dir", required=True,
                 help="directory to write the reference-layout checkpoint")
  p.add_argument("--step", type=int, default=None,
                 help="checkpoint step to export (default: latest)")
  args = p.parse_args()

  prefix = os.path.abspath(args.stage_dir)
  restored = flax_ckpt.restore_checkpoint(prefix, None, step=args.step)
  if restored is None:
    raise FileNotFoundError(f"no checkpoint under {prefix}")
  if ckpt_lib.is_reference_layout(restored):
    raise ValueError(
        f"{prefix} already holds a reference-layout checkpoint; nothing to "
        "export")

  os.makedirs(args.out_dir, exist_ok=True)
  out = ckpt_lib.export_reference_checkpoint(
      args.out_dir, restored["params"], restored["step"])
  print(f"wrote {out}")


if __name__ == "__main__":
  main()
