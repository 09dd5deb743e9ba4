"""Convert official LPIPS(AlexNet) weights into metric/lpips_torch format.

Run this on a machine WITH network egress and the `lpips` + `torchvision`
packages installed; copy the resulting file into the zero-egress
environment (default target: metric/weights/lpips_alex.pth, or point
$LPIPS_WEIGHTS at it).

    python scripts/convert_lpips_weights.py --out lpips_alex.pth

The file is small (~9 MB): the 5-conv AlexNet trunk plus the 5 linear
calibration heads; classifier layers are dropped.
"""

import argparse

import torch


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--out", default="lpips_alex.pth")
  args = parser.parse_args()

  import lpips  # noqa: PLC0415 - optional, egress-only dependency

  model = lpips.LPIPS(net="alex", verbose=False)

  # torchvision AlexNet feature trunk indices -> our conv names.
  trunk = model.net.slice1, model.net.slice2, model.net.slice3, \
      model.net.slice4, model.net.slice5
  convs = {}
  names = ["conv1", "conv2", "conv3", "conv4", "conv5"]
  idx = 0
  for sl in trunk:
    for layer in sl:
      if isinstance(layer, torch.nn.Conv2d):
        convs[f"{names[idx]}.weight"] = layer.weight.detach().clone()
        convs[f"{names[idx]}.bias"] = layer.bias.detach().clone()
        idx += 1
  assert idx == 5, f"expected 5 convs, found {idx}"

  lin = [l.model[-1].weight.detach().clone() for l in model.lins]
  torch.save({"alexnet": convs, "lin": lin}, args.out)
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
