"""Ground-truth downsampler (reference metric/reference.py).

Exports half-res ground-truth frames next to the predictions for figure
building; CLI flags instead of hardcoded paths.
"""

import argparse
import json
import os

import cv2


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--out_dir", required=True)
  p.add_argument("--transforms_json", required=True)
  p.add_argument("--skip", type=int, default=20)
  args = p.parse_args()

  with open(args.transforms_json, "r") as f:
    data = json.load(f)

  fnames = [os.path.join(os.path.dirname(args.transforms_json),
                         meta["file_path"] + ".png")
            for meta in data["frames"]][::args.skip]
  os.makedirs(args.out_dir, exist_ok=True)
  for i, fn in enumerate(fnames):
    img = cv2.imread(fn, cv2.IMREAD_UNCHANGED)
    h, w = img.shape[:2]
    img = cv2.resize(img, (w // 2, h // 2), interpolation=cv2.INTER_AREA)
    cv2.imwrite(os.path.join(args.out_dir, f"gt_{i:03d}.png"), img)


if __name__ == "__main__":
  main()
