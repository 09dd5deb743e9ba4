"""Two-method per-pixel win/loss comparison maps (reference metric/compare.py).

For each metric (PSNR map, DSSIM map, LPIPS map, FLIP map), marks pixels
where method 1 beats method 2 in warm red (239,138,98), ties within 1e-3 in
neutral (247,247,247), and losses in cool blue (103,169,207); writes
per-frame strips and optionally an mp4 when imageio-ffmpeg is available.
"""

import argparse
import os
from glob import glob

import cv2
import numpy as np
import torch

import flip
import ssim
from summary import (compute_flip, compute_lpips, compute_psnr, load_img,
                     make_lpips_models, put_text, save_img)


def compute_dssim(ssim_model, ref, src):
  err, emap = ssim_model(ref, src)
  emap = (1.0 - emap) / 2.0
  return (1.0 - err.item()) / 2.0, torch.clip(
      emap, 0.0, 1.0).squeeze().cpu().numpy()


def _preds(log_dir, scene, method, preds_dirname):
  return sorted(glob(os.path.join(
      log_dir, scene, method, preds_dirname, "???.png")))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--log_dir", required=True)
  p.add_argument("--data_dir", required=True)
  p.add_argument("--scene", required=True)
  p.add_argument("--method1", required=True)
  p.add_argument("--method2", required=True)
  p.add_argument("--dataset", default="blender", choices=["blender", "opencv"])
  p.add_argument("--white_bkgd", action="store_true")
  p.add_argument("--half", action="store_true", default=True)
  p.add_argument("--preds_dirname", default="test_preds")
  args = p.parse_args()

  import json
  scene_dir = os.path.join(args.data_dir, args.scene)
  with open(os.path.join(scene_dir, "transforms_test.json")) as f:
    meta = json.load(f)
  if args.dataset == "blender":
    test_fnames = [os.path.join(scene_dir, fr["file_path"] + ".png")
                   for fr in meta["frames"]]
  else:
    test_fnames = [os.path.join(scene_dir, fr["file_path"])
                   for fr in meta["frames"]]
  pred_fnames1 = _preds(args.log_dir, args.scene, args.method1,
                        args.preds_dirname)
  pred_fnames2 = _preds(args.log_dir, args.scene, args.method2,
                        args.preds_dirname)
  assert len(test_fnames) == len(pred_fnames1) == len(pred_fnames2)

  out_dir = os.path.join(os.path.dirname(pred_fnames1[0]),
                         f"compare_{args.method2}")
  os.makedirs(out_dir, exist_ok=True)
  out_frame_dir = os.path.join(out_dir, "frame")
  os.makedirs(out_frame_dir, exist_ok=True)

  ssim_model = ssim.SSIM(data_range=1.0).cuda()
  lpips_model0, lpips_model1 = make_lpips_models()

  imgs = []
  for i, (test_fname, f1, f2) in enumerate(
      zip(test_fnames, pred_fnames1, pred_fnames2)):
    test_im = load_img(test_fname, white_bkgd=args.white_bkgd)
    if args.half and args.dataset == "blender":
      test_im = cv2.resize(test_im, (400, 400), interpolation=cv2.INTER_AREA)
    elif args.half:
      h, w = test_im.shape[:2]
      dh, dw = int(h // 2 * 0.5), int(w // 2 * 0.5)
      test_im = test_im[(h // 2 - dh):(h // 2 + dh),
                        (w // 2 - dw):(w // 2 + dw)]
    pred_im1 = load_img(f1)
    pred_im2 = load_img(f2)

    test_batch = torch.FloatTensor(test_im).permute(2, 0, 1)[None]
    pb1 = torch.FloatTensor(pred_im1).permute(2, 0, 1)[None]
    pb2 = torch.FloatTensor(pred_im2).permute(2, 0, 1)[None]

    with torch.no_grad():
      _, psnr_map1 = compute_psnr(test_batch, pb1)
      _, dssim_map1 = compute_dssim(ssim_model, test_batch, pb1)
      _, psnr_map2 = compute_psnr(test_batch, pb2)
      _, dssim_map2 = compute_dssim(ssim_model, test_batch, pb2)
    _, lpips_map1 = compute_lpips(lpips_model0, lpips_model1, test_batch, pb1)
    _, lpips_map2 = compute_lpips(lpips_model0, lpips_model1, test_batch, pb2)
    _, flip_map1 = compute_flip(test_im, pred_im1)
    _, flip_map2 = compute_flip(test_im, pred_im2)

    h, w = test_im.shape[:2]
    merge = []
    for name, map1, map2 in zip(
        ["psnr", "dssim", "lpips", "flip"],
        [psnr_map1, dssim_map1, lpips_map1, flip_map1],
        [psnr_map2, dssim_map2, lpips_map2, flip_map2]):
      non = np.abs(map1 - map2)[..., None] < 1e-3
      pos = (1 - non) * (map1 <= map2)[..., None]
      neg = (1 - non) * (map1 > map2)[..., None]
      im = (np.array([239, 138, 98])[None, None] / 255.0 * pos
            + np.array([247, 247, 247])[None, None] / 255.0 * non
            + np.array([103, 169, 207])[None, None] / 255.0 * neg)
      save_img(os.path.join(out_dir, f"{name}_{i:03d}.png"), im)
      pad_im = np.ones((h, w, 3))
      pad_im[:im.shape[0], :im.shape[1]] = im
      put_text(pad_im, name, (0, 0, 0))
      merge.append(pad_im)
      merge.append(np.ones((h, 5, 3)))
    merge = np.hstack(merge)
    save_img(os.path.join(out_frame_dir, f"frame_{i:03d}.png"), merge)
    imgs.append((np.clip(merge, 0, 1) * 255).astype(np.uint8))

  try:
    import imageio
    imageio.mimwrite(os.path.join(
        args.log_dir, args.scene, f"compare_{args.method1}.mp4"), imgs)
  except Exception as e:
    print(f"mp4 export skipped ({type(e).__name__}); frames are on disk.")


if __name__ == "__main__":
  main()
