"""Mask-bbox crop exporter for real scenes (reference metric/crop.py).

Central-crops test/pred/mask triplets, then crops to the mask's bounding
rectangle; writes test_crops/ and pred_crops/. Paths come from CLI flags
instead of hardcoded constants.
"""

import argparse
import json
import os
from glob import glob

import cv2


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--pred_root", required=True)
  p.add_argument("--test_root", required=True)
  p.add_argument("--pred_glob", default="???.png")
  args = p.parse_args()

  test_out_root = os.path.join(args.test_root, "test_crops")
  pred_out_root = os.path.join(args.pred_root, "pred_crops")
  os.makedirs(test_out_root, exist_ok=True)
  os.makedirs(pred_out_root, exist_ok=True)

  with open(os.path.join(args.test_root, "calib.json"), "r") as f:
    meta = json.load(f)

  pred_fnames = sorted(glob(os.path.join(args.pred_root, args.pred_glob)))

  for i, frame in enumerate(meta["frames"]):
    _, fname = os.path.split(frame["file_path"])
    test_im = cv2.imread(os.path.join(args.test_root, fname))
    mask_im = cv2.imread(
        os.path.join(args.test_root, "mask_" + fname[:-3] + "png"))[..., 0]
    pred_im = cv2.imread(pred_fnames[i])

    h, w = test_im.shape[:2]
    dh = int(h // 2 * 0.5)
    dw = int(w // 2 * 0.5)
    sl = (slice(h // 2 - dh, h // 2 + dh - 1),
          slice(w // 2 - dw, w // 2 + dw - 1))
    test_im = test_im[sl]
    mask_im = mask_im[sl]

    x, y, bw, bh = cv2.boundingRect(mask_im)
    test_im = test_im[y:(y + bh), x:(x + bw)]
    mask_im = mask_im[y:(y + bh), x:(x + bw)]
    pred_im = pred_im[y:(y + bh), x:(x + bw)]

    cv2.imwrite(os.path.join(test_out_root, f"{i:03d}.png"), test_im)
    cv2.imwrite(os.path.join(test_out_root, f"mask_{i:03d}.png"), mask_im)
    cv2.imwrite(os.path.join(pred_out_root, f"{i:03d}.png"), pred_im)


if __name__ == "__main__":
  main()
