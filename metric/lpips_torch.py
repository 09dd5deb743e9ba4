"""Self-contained AlexNet-LPIPS in plain torch (no `lpips`/`torchvision`).

The reference computes LPIPS through the `lpips` pip package
(/root/reference/metric/summary.py:115-117), which downloads pretrained
AlexNet + linear-calibration weights at import time. This environment has
no egress, so the metric suite needs an implementation that (a) depends
only on `torch`, and (b) loads weights from a *local* file when one is
available.

Weight file format (produced by scripts/convert_lpips_weights.py on a
machine with egress): a torch.save'd dict
    {"alexnet": {conv state dict, keys conv{1..5}.{weight,bias}},
     "lin": [w0, w1, w2, w3, w4]}   # [1, C, 1, 1] non-negative tensors
Search order: $LPIPS_WEIGHTS, then metric/weights/lpips_alex.pth.

Architecture (reimplemented from the LPIPS paper, Zhang et al. 2018, and
the published reference behavior — not copied code):
  input RGB in [-1, 1] -> per-channel shift/scale -> AlexNet conv stack,
  features tapped after each of the 5 ReLUs -> unit-normalize over
  channels -> squared difference -> 1x1 non-negative linear head ->
  spatial mean (scalar mode) or bilinear-upsampled sum (spatial mode).
"""

import os

import torch
import torch.nn as nn
import torch.nn.functional as F

# Input normalization constants for ImageNet-trained backbones operating on
# [-1, 1] inputs (mean/std re-expressed on that range).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# Channel widths of the 5 tapped AlexNet feature stages.
CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
  """The 5-conv AlexNet feature trunk, returning all 5 post-ReLU taps."""

  def __init__(self):
    super().__init__()
    self.conv1 = nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2)
    self.conv2 = nn.Conv2d(64, 192, kernel_size=5, padding=2)
    self.conv3 = nn.Conv2d(192, 384, kernel_size=3, padding=1)
    self.conv4 = nn.Conv2d(384, 256, kernel_size=3, padding=1)
    self.conv5 = nn.Conv2d(256, 256, kernel_size=3, padding=1)

  def forward(self, x):
    taps = []
    x = F.relu(self.conv1(x))
    taps.append(x)
    x = F.max_pool2d(x, kernel_size=3, stride=2)
    x = F.relu(self.conv2(x))
    taps.append(x)
    x = F.max_pool2d(x, kernel_size=3, stride=2)
    x = F.relu(self.conv3(x))
    taps.append(x)
    x = F.relu(self.conv4(x))
    taps.append(x)
    x = F.relu(self.conv5(x))
    taps.append(x)
    return taps


def _unit_normalize(feat, eps=1e-10):
  norm = torch.sqrt(torch.sum(feat**2, dim=1, keepdim=True))
  return feat / (norm + eps)


class LPIPS(nn.Module):
  """Perceptual distance d(img0, img1); images NCHW RGB in [-1, 1]."""

  def __init__(self, spatial=False):
    super().__init__()
    self.spatial = spatial
    self.net = AlexNetFeatures()
    # 1x1 linear calibration head per tapped stage (bias-free,
    # non-negative weights in the published metric).
    self.lins = nn.ParameterList(
        nn.Parameter(torch.ones(1, c, 1, 1) / c) for c in CHANNELS)
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    self.register_buffer("shift", shift)
    self.register_buffer("scale", scale)
    for p in self.parameters():
      p.requires_grad_(False)

  def load_weight_file(self, path):
    blob = torch.load(path, map_location="cpu")
    self.net.load_state_dict(blob["alexnet"])
    if len(blob["lin"]) != len(self.lins):
      raise ValueError("weight file has wrong number of linear heads")
    for lin, w in zip(self.lins, blob["lin"]):
      lin.data.copy_(w.reshape(lin.shape))
    return self

  @torch.no_grad()
  def forward(self, img0, img1, normalize=False):
    if normalize:  # inputs in [0, 1] -> [-1, 1] (lpips-package convention)
      img0 = img0 * 2 - 1
      img1 = img1 * 2 - 1
    size = img0.shape[2:]
    taps0 = self.net((img0 - self.shift) / self.scale)
    taps1 = self.net((img1 - self.shift) / self.scale)
    total = 0.0
    for f0, f1, lin in zip(taps0, taps1, self.lins):
      diff = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
      val = torch.sum(lin.clamp(min=0) * diff, dim=1, keepdim=True)
      if self.spatial:
        val = F.interpolate(val, size=size, mode="bilinear",
                            align_corners=False)
      else:
        val = val.mean(dim=(2, 3), keepdim=True)
      total = total + val
    return total


def default_weight_path():
  env = os.environ.get("LPIPS_WEIGHTS")
  if env:
    return env
  return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "weights", "lpips_alex.pth")


def load_lpips(spatial=False, path=None):
  """LPIPS with calibrated weights, or None if no weight file exists."""
  path = path or default_weight_path()
  if not os.path.exists(path):
    return None
  return LPIPS(spatial=spatial).load_weight_file(path).eval()
