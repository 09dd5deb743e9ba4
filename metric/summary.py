"""Offline metric suite: PSNR / SSIM / LPIPS / FLIP over rendered scenes.

Behavioral parity with the reference metric/summary.py: same evaluation
protocol (test split, half-res — Blender INTER_AREA to 400x400, real
central 50% crop — optional mask / bbox-crop variants), same outputs
(errmap PNGs in magma, per-frame side-by-side strips, metric_list.txt and
result.txt with the same fixed-width formatting).

Differences: configuration comes from CLI flags instead of in-file
constants (the in-file defaults match the reference's), everything runs on
CPU or GPU, and LPIPS is computed only when pretrained AlexNet weights are
available locally (this environment has no network egress; the column
reports nan otherwise).
"""

import argparse
import json
import os
from glob import glob

import cv2
import numpy as np
import torch

import flip
import ssim


def put_text(img, text, font_color=(0, 0, 0)):
  font = cv2.FONT_HERSHEY_SIMPLEX
  font_scale = 0.7
  font_thickness = 1
  text_size, _ = cv2.getTextSize(text, font, font_scale, font_thickness)
  org = (5, text_size[1] + 5)
  cv2.putText(img, text, org, font, font_scale, font_color, font_thickness,
              cv2.LINE_AA)


def load_img(fpath, white_bkgd=False):
  """[H, W, 3] float image in [0, 1]."""
  from PIL import Image
  img = np.asarray(Image.open(fpath)).astype(np.float32)
  if white_bkgd and img.shape[-1] == 4:
    img = img[..., :3] * (img[..., -1:] / 255.0) + (255 - img[..., -1:])
  else:
    img = img[..., :3]
  return img / 255.0


def save_img(fpath, img):
  from PIL import Image
  Image.fromarray(
      np.clip(255.0 * img, 0, 255).astype(np.uint8)).save(fpath)


def save_err(fpath, img):
  img = flip.CHWtoHWC(flip.index2color(
      np.clip(255.0 * img, 0.0, 255.0), flip.get_magma_map()))
  save_img(fpath, img)


def compute_psnr(ref, src):
  mse = torch.mean((ref - src)**2)
  err = (-20 * torch.log10(torch.sqrt(mse))).item()
  return err, torch.mean((ref[0] - src[0])**2, axis=0).cpu().numpy()


def compute_ssim(ssim_model, ref, src):
  err, emap = ssim_model(ref, src)
  return err.item(), torch.clip(emap, 0.0, 1.0).squeeze().cpu().numpy()


def make_lpips_models():
  """LPIPS (AlexNet) if pretrained weights are available; else None.

  Prefers the in-repo torch implementation (metric/lpips_torch.py) fed by
  a local weight file ($LPIPS_WEIGHTS or metric/weights/lpips_alex.pth,
  producible offline via scripts/convert_lpips_weights.py); falls back to
  the `lpips` package if installed with cached weights.
  """
  import lpips_torch
  model0 = lpips_torch.load_lpips(spatial=False)
  model1 = lpips_torch.load_lpips(spatial=True)
  if model0 is not None:
    return model0, model1
  try:
    import lpips  # noqa: F401
    model0 = lpips.LPIPS(net="alex", verbose=False)
    model1 = lpips.LPIPS(net="alex", spatial=True, verbose=False)
    return model0, model1
  except Exception as e:  # no package or no cached weights (zero egress)
    print(f"LPIPS unavailable ({type(e).__name__}); reporting nan.")
    return None, None


def compute_lpips(lpips_model0, lpips_model1, ref, src):
  if lpips_model0 is None:
    return float("nan"), np.zeros(ref.shape[-2:], np.float32)
  with torch.no_grad():
    err = lpips_model0(ref, src, normalize=True).item()
    emap = lpips_model1(ref, src, normalize=True)
  return err, torch.clip(emap, 0.0, 1.0).squeeze().cpu().numpy()


def compute_flip(ref, src):
  monitor_distance = 0.3
  monitor_width = 0.5
  monitor_resolution_x = 400
  ppd = monitor_distance * (monitor_resolution_x / monitor_width) * (
      np.pi / 180)
  emap = flip.compute_ldrflip(
      flip.HWCtoCHW(ref), flip.HWCtoCHW(src), ppd)[0]
  return np.mean(emap), emap


def list_test_frames(data_dir, scene, dataset, nsvf, test, mask_or_crop):
  """Ground-truth frame list per dataset flavor (summary.py:126-162)."""
  scene_dir = os.path.join(data_dir, scene)
  mask_fnames = None
  if test:
    if nsvf:
      test_fnames = sorted(glob(os.path.join(scene_dir, "rgb", "2_*.png")))
    elif dataset == "blender":
      with open(os.path.join(scene_dir, "transforms_test.json")) as f:
        data = json.load(f)
      test_fnames = [os.path.join(scene_dir, fr["file_path"] + ".png")
                     for fr in data["frames"]]
      if mask_or_crop:
        mask_fnames = [
            os.path.join(scene_dir, os.path.split(fr["file_path"])[0],
                         "mask_" + os.path.split(fr["file_path"])[1] + ".png")
            for fr in data["frames"]]
    else:  # opencv
      with open(os.path.join(scene_dir, "transforms_test.json")) as f:
        data = json.load(f)
      test_fnames = [os.path.join(scene_dir, fr["file_path"])
                     for fr in data["frames"]]
      if mask_or_crop:
        mask_fnames = [
            os.path.join(
                scene_dir, os.path.split(fr["file_path"])[0], "mask_"
                + os.path.split(fr["file_path"])[1][:-3] + "png")
            for fr in data["frames"]]
  else:
    if nsvf:
      test_fnames = sorted(glob(os.path.join(scene_dir, "rgb", "0_*.png")))
    elif dataset == "blender":
      test_fnames = sorted(
          glob(os.path.join(scene_dir, "train", "*.png")),
          key=lambda s: int(s.split(".")[0].split("_")[-1]))
    else:
      with open(os.path.join(scene_dir, "transforms_train.json")) as f:
        data = json.load(f)
      test_fnames = [os.path.join(scene_dir, fr["file_path"])
                     for fr in data["frames"]]
  return test_fnames, mask_fnames


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--log_dir", required=True)
  p.add_argument("--data_dir", required=True)
  p.add_argument("--method",
                 default="radiance_pe-bkgd_bg-smooth-l2-1.0-ps-128")
  p.add_argument("--scenes", nargs="+", required=True)
  p.add_argument("--dataset", default="blender",
                 choices=["blender", "opencv"])
  p.add_argument("--white_bkgd", action="store_true")
  p.add_argument("--train_split", action="store_true",
                 help="evaluate train renders instead of test")
  p.add_argument("--nsvf", action="store_true")
  p.add_argument("--mip", action="store_true",
                 help="mip-nerf-style prediction layout (color_*.png)")
  p.add_argument("--half", action="store_true", default=True)
  p.add_argument("--no-half", dest="half", action="store_false")
  p.add_argument("--mask", action="store_true")
  p.add_argument("--crop", action="store_true")
  p.add_argument("--preds_dirname", default="test_preds")
  args = p.parse_args()

  ssim_model = ssim.SSIM(data_range=1.0).cuda()
  lpips_model0, lpips_model1 = make_lpips_models()

  for scene in args.scenes:
    test_fnames, mask_fnames = list_test_frames(
        args.data_dir, scene, args.dataset, args.nsvf,
        not args.train_split, args.mask or args.crop)
    preds_dirname = (args.preds_dirname if not args.train_split
                     else "train_preds")
    if args.mip:
      pred_fnames = sorted(glob(os.path.join(
          args.log_dir, scene, preds_dirname, "color_*.png")))
    else:
      pred_fnames = sorted(glob(os.path.join(
          args.log_dir, scene, args.method, preds_dirname, "???.png")))
    print(scene, len(test_fnames), len(pred_fnames))
    assert len(test_fnames) == len(pred_fnames), (
        "test/pred frame count mismatch")

    suffix = ("_mask" if args.mask else "") + ("_crop" if args.crop else "")
    out_errmap_dir = os.path.join(
        os.path.dirname(pred_fnames[0]), "errmap" + suffix)
    os.makedirs(out_errmap_dir, exist_ok=True)
    out_frame_dir = os.path.join(out_errmap_dir, "frame" + suffix)
    os.makedirs(out_frame_dir, exist_ok=True)

    psnr_list, ssim_list, lpips_list, flip_list = [], [], [], []
    out_str = ""
    for i, (test_fname, pred_fname) in enumerate(
        zip(test_fnames, pred_fnames)):
      mask_im = None
      if args.mask or args.crop:
        mask_im = load_img(mask_fnames[i])[:, :, :1]

      test_im = load_img(test_fname, white_bkgd=args.white_bkgd)
      if args.half:
        if args.dataset == "blender":
          test_im = cv2.resize(test_im, (400, 400),
                               interpolation=cv2.INTER_AREA)
          if mask_im is not None:
            mask_im = cv2.resize(mask_im, (400, 400),
                                 interpolation=cv2.INTER_NEAREST)[..., None]
        else:  # central 50% crop for real scenes
          h, w = test_im.shape[:2]
          dh, dw = int(h // 2 * 0.5), int(w // 2 * 0.5)
          sl = np.s_[(h // 2 - dh):(h // 2 + dh), (w // 2 - dw):(w // 2 + dw)]
          test_im = test_im[sl]
          if mask_im is not None:
            mask_im = mask_im[sl]
      pred_im = load_img(pred_fname)

      if args.mask:
        test_im = test_im * mask_im
        pred_im = pred_im * mask_im
      if args.crop:
        x, y, w, h = cv2.boundingRect(
            (mask_im[..., 0] * 255.0).astype(np.uint8))
        test_im = test_im[y:(y + h), x:(x + w)]
        mask_im = mask_im[y:(y + h), x:(x + w)]
        pred_im = pred_im[y:(y + h), x:(x + w)]

      test_batch = torch.FloatTensor(test_im).permute(2, 0, 1)[None]
      pred_batch = torch.FloatTensor(pred_im).permute(2, 0, 1)[None]

      with torch.no_grad():
        psnr_val, psnr_map = compute_psnr(test_batch, pred_batch)
        ssim_val, ssim_map = compute_ssim(ssim_model, test_batch, pred_batch)
      lpips_val, lpips_map = compute_lpips(
          lpips_model0, lpips_model1, test_batch, pred_batch)
      flip_val, flip_map = compute_flip(test_im, pred_im)

      h, w = test_im.shape[:2]
      psnr_list.append(psnr_val)
      ssim_list.append(ssim_val)
      lpips_list.append(lpips_val)
      flip_list.append(flip_val)
      save_err(os.path.join(out_errmap_dir, f"psnr_{i:03d}.png"), psnr_map)
      save_err(os.path.join(out_errmap_dir, f"ssim_{i:03d}.png"), ssim_map)
      save_err(os.path.join(out_errmap_dir, f"lpips_{i:03d}.png"), lpips_map)
      save_err(os.path.join(out_errmap_dir, f"flip_{i:03d}.png"), flip_map)

      merge = [test_im, np.ones((h, 5, 3)), pred_im, np.ones((h, 5, 3))]
      for name in ["psnr", "ssim", "lpips", "flip"]:
        im = load_img(os.path.join(out_errmap_dir, f"{name}_{i:03d}.png"))
        pad_im = np.zeros((h, w, 3))
        pad_im[:im.shape[0], :im.shape[1]] = im
        merge.append(pad_im)
        merge.append(np.ones((h, 5, 3)))
      save_img(os.path.join(out_frame_dir, f"frame_{i:03d}.png"),
               np.hstack(merge))

      out_str += (f"{i:3d}{psnr_val:6.2f}{ssim_val:6.3f}{lpips_val:6.3f}"
                  f"{flip_val:6.3f}\n")

    with open(os.path.join(os.path.dirname(pred_fnames[0]),
                           f"metric_list{suffix}.txt"), "w") as f:
      f.write(out_str)
    with open(os.path.join(os.path.dirname(pred_fnames[0]),
                           f"result{suffix}.txt"), "w") as f:
      f.write(f"{np.mean(psnr_list):6.2f}{np.mean(ssim_list):6.3f}"
              f"{np.mean(lpips_list):6.3f}{np.mean(flip_list):6.3f}\n")


if __name__ == "__main__":
  main()
