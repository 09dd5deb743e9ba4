"""Torch SSIM with per-pixel maps (reference metric/ssim/ssim.py behavior).

Gaussian-window SSIM (11x11, sigma 1.5) matching pytorch-msssim /
tf.image.ssim conventions: returns (mean_ssim, per-pixel map). Runs on CPU
or GPU tensors.
"""

import torch
import torch.nn.functional as F


def _fspecial_gauss_1d(size, sigma):
  coords = torch.arange(size, dtype=torch.float32)
  coords -= size // 2
  g = torch.exp(-(coords**2) / (2 * sigma**2))
  g /= g.sum()
  return g.reshape(1, 1, -1)


def _gaussian_filter(x, win):
  """Separable Gaussian blur for [B, C, H, W]."""
  c = x.shape[1]
  out = F.conv2d(x, win.unsqueeze(2).repeat(c, 1, 1, 1), groups=c)
  out = F.conv2d(out, win.unsqueeze(3).repeat(c, 1, 1, 1), groups=c)
  return out


def ssim_with_map(x, y, data_range=1.0, win_size=11, win_sigma=1.5,
                  k1=0.01, k2=0.03):
  """SSIM between [B, C, H, W] tensors -> (scalar tensor, [B, C, h, w] map)."""
  win = _fspecial_gauss_1d(win_size, win_sigma).to(x.device, x.dtype)
  c1 = (k1 * data_range)**2
  c2 = (k2 * data_range)**2

  mu1 = _gaussian_filter(x, win)
  mu2 = _gaussian_filter(y, win)
  mu1_sq = mu1.pow(2)
  mu2_sq = mu2.pow(2)
  mu1_mu2 = mu1 * mu2
  sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
  sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
  sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

  cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
  ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
  # Per-pixel map is channel-averaged (one error value per pixel).
  return ssim_map.mean(), ssim_map.mean(dim=1, keepdim=True)


class SSIM(torch.nn.Module):
  """Callable module matching the reference's ssim.SSIM(data_range=...)."""

  def __init__(self, data_range=1.0, win_size=11, win_sigma=1.5):
    super().__init__()
    self.data_range = data_range
    self.win_size = win_size
    self.win_sigma = win_sigma

  def forward(self, x, y):
    return ssim_with_map(x, y, data_range=self.data_range,
                         win_size=self.win_size, win_sigma=self.win_sigma)

  def cuda(self):  # keep the reference call-site working on CPU-only boxes
    if torch.cuda.is_available():
      return super().cuda()
    return self
