"""Side-by-side comparison strip/video exporter (reference metric/export.py).

Builds horizontal strips of (ground truth | method renders...) per frame
for paper figures, and an mp4 when imageio-ffmpeg is available. CLI flags
instead of hardcoded paths.
"""

import argparse
import json
import os
from glob import glob

import cv2
import numpy as np

from summary import load_img, put_text, save_img


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--data_dir", required=True)
  p.add_argument("--scene", required=True)
  p.add_argument("--log_dir", required=True)
  p.add_argument("--methods", nargs="+", required=True,
                 help="stage dirs under <log_dir>/<scene> to compare")
  p.add_argument("--labels", nargs="+", default=None)
  p.add_argument("--dataset", default="blender", choices=["blender", "opencv"])
  p.add_argument("--white_bkgd", action="store_true")
  p.add_argument("--out_dir", default=None)
  p.add_argument("--preds_dirname", default="test_preds")
  args = p.parse_args()

  labels = args.labels or args.methods
  scene_dir = os.path.join(args.data_dir, args.scene)
  with open(os.path.join(scene_dir, "transforms_test.json")) as f:
    meta = json.load(f)
  if args.dataset == "blender":
    test_fnames = [os.path.join(scene_dir, fr["file_path"] + ".png")
                   for fr in meta["frames"]]
  else:
    test_fnames = [os.path.join(scene_dir, fr["file_path"])
                   for fr in meta["frames"]]

  method_frames = []
  for method in args.methods:
    preds = sorted(glob(os.path.join(
        args.log_dir, args.scene, method, args.preds_dirname, "???.png")))
    assert len(preds) == len(test_fnames), (method, len(preds))
    method_frames.append(preds)

  out_dir = args.out_dir or os.path.join(
      args.log_dir, args.scene, "export")
  os.makedirs(out_dir, exist_ok=True)

  imgs = []
  for i, test_fname in enumerate(test_fnames):
    gt = load_img(test_fname, white_bkgd=args.white_bkgd)
    pred0 = load_img(method_frames[0][i])
    if gt.shape[:2] != pred0.shape[:2]:
      gt = cv2.resize(gt, (pred0.shape[1], pred0.shape[0]),
                      interpolation=cv2.INTER_AREA)
    h = gt.shape[0]
    put_text(gt, "reference")
    strip = [gt, np.ones((h, 5, 3))]
    for label, preds in zip(labels, method_frames):
      im = load_img(preds[i])
      put_text(im, label)
      strip.append(im)
      strip.append(np.ones((h, 5, 3)))
    merged = np.hstack(strip[:-1])
    save_img(os.path.join(out_dir, f"frame_{i:03d}.png"), merged)
    imgs.append((np.clip(merged, 0, 1) * 255).astype(np.uint8))

  try:
    import imageio
    imageio.mimwrite(os.path.join(out_dir, "export.mp4"), imgs)
  except Exception as e:
    print(f"mp4 export skipped ({type(e).__name__}); frames are on disk.")


if __name__ == "__main__":
  main()
