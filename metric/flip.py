"""LDR-FLIP perceptual image-difference metric (numpy).

Reimplementation of NVIDIA's FLIP (Andersson et al., "FLIP: A Difference
Evaluator for Alternating Images", HPG 2020) following the published
algorithm, with the same API surface the reference metric suite uses
(metric/flip/flip_api.py): compute_ldrflip, color_space_transform,
HWCtoCHW/CHWtoHWC, index2color, get_magma_map. The HDR-FLIP exposure sweep
is not included (the reference's summary protocol only calls LDR-FLIP with
the paper's 0.3 m / 0.5 m / 400 px viewing condition, metric/summary.py:78).
"""

import cv2
import numpy as np

_REF_ILLUMINANT = np.array([[[0.950428545]], [[1.0]], [[1.088900371]]],
                           np.float32)
_INV_REF_ILLUMINANT = np.array([[[1.052156925]], [[1.0]], [[0.918357670]]],
                               np.float32)

_LINRGB2XYZ = np.array([
    [10135552 / 24577794, 8788810 / 24577794, 4435075 / 24577794],
    [2613072 / 12288897, 8788810 / 12288897, 887015 / 12288897],
    [1425312 / 73733382, 8788810 / 73733382, 70074185 / 73733382],
], np.float32)
_XYZ2LINRGB = np.array([
    [3.241003275, -1.537398934, -0.498615861],
    [-0.969224334, 1.875930071, 0.041554224],
    [0.055639423, -0.204011202, 1.057148933],
], np.float32)


def HWCtoCHW(img):
  return np.rollaxis(img, 2)


def CHWtoHWC(img):
  return np.rollaxis(img, 0, 3)


def _matmul_c(mat, img):
  c, h, w = img.shape
  out = mat @ img.reshape(c, -1)
  return out.reshape(c, h, w)


def color_space_transform(input_color, fromSpace2toSpace):
  """Color transforms on CxHxW arrays (same names as the NVIDIA API)."""
  if fromSpace2toSpace == "srgb2linrgb":
    limit = 0.04045
    return np.where(input_color > limit,
                    np.power((input_color + 0.055) / 1.055, 2.4),
                    input_color / 12.92)
  if fromSpace2toSpace == "linrgb2srgb":
    limit = 0.0031308
    return np.where(input_color > limit,
                    1.055 * (input_color ** (1.0 / 2.4)) - 0.055,
                    12.92 * input_color)
  if fromSpace2toSpace == "linrgb2xyz":
    return _matmul_c(_LINRGB2XYZ, input_color)
  if fromSpace2toSpace == "xyz2linrgb":
    return _matmul_c(_XYZ2LINRGB, input_color)
  if fromSpace2toSpace == "xyz2ycxcz":
    xyz = input_color * _INV_REF_ILLUMINANT
    y = 116 * xyz[1:2] - 16
    cx = 500 * (xyz[0:1] - xyz[1:2])
    cz = 200 * (xyz[1:2] - xyz[2:3])
    return np.concatenate((y, cx, cz), 0)
  if fromSpace2toSpace == "ycxcz2xyz":
    y = (input_color[0:1] + 16) / 116
    cx = input_color[1:2] / 500
    cz = input_color[2:3] / 200
    xyz = np.concatenate((y + cx, y, y - cz), 0)
    return xyz * _REF_ILLUMINANT
  if fromSpace2toSpace == "xyz2lab":
    xyz = input_color * _INV_REF_ILLUMINANT
    delta = 6 / 29
    factor = 1 / (3 * delta * delta)
    xyz = np.where(xyz > delta**3, np.cbrt(xyz), factor * xyz + 4 / 29)
    l = 116 * xyz[1:2] - 16
    a = 500 * (xyz[0:1] - xyz[1:2])
    b = 200 * (xyz[1:2] - xyz[2:3])
    return np.concatenate((l, a, b), 0)
  if fromSpace2toSpace == "srgb2ycxcz":
    return color_space_transform(
        color_space_transform(
            color_space_transform(input_color, "srgb2linrgb"),
            "linrgb2xyz"), "xyz2ycxcz")
  if fromSpace2toSpace == "ycxcz2linrgb":
    return color_space_transform(
        color_space_transform(input_color, "ycxcz2xyz"), "xyz2linrgb")
  if fromSpace2toSpace == "linrgb2lab":
    return color_space_transform(
        color_space_transform(input_color, "linrgb2xyz"), "xyz2lab")
  raise ValueError(f"undefined color transform {fromSpace2toSpace}")


def generate_spatial_filter(pixels_per_degree, channel):
  """CSF-derived Gaussian-sum filter per opponent channel."""
  params = {
      "A": (1, 0.0047, 0, 1e-5),
      "RG": (1, 0.0053, 0, 1e-5),
      "BY": (34.1, 0.04, 13.5, 0.025),
  }
  a1, b1, a2, b2 = params[channel]
  max_scale_parameter = 0.04  # max over all channels' b parameters
  r = int(np.ceil(3 * np.sqrt(max_scale_parameter / (2 * np.pi**2))
                  * pixels_per_degree))
  delta_x = 1.0 / pixels_per_degree
  x, y = np.meshgrid(range(-r, r + 1), range(-r, r + 1))
  z = ((x * delta_x)**2 + (y * delta_x)**2).astype(np.float32)
  s = (a1 * np.sqrt(np.pi / b1) * np.exp(-np.pi**2 * z / b1)
       + a2 * np.sqrt(np.pi / b2) * np.exp(-np.pi**2 * z / b2))
  return s / np.sum(s)


def _filter2d(img2d, kernel):
  return cv2.filter2D(img2d, ddepth=-1, kernel=kernel,
                      borderType=cv2.BORDER_REPLICATE)


def spatial_filter(img, s_a, s_rg, s_by):
  """CSF-filter a YCxCz image, return clamped linear RGB."""
  out = np.stack([
      _filter2d(img[0], s_a),
      _filter2d(img[1], s_rg),
      _filter2d(img[2], s_by),
  ]).astype(np.float32)
  return np.clip(color_space_transform(out, "ycxcz2linrgb"), 0.0, 1.0)


def hunt_adjustment(img):
  """Hunt adjustment in L*a*b* (scale chroma by 0.01 L)."""
  l = img[0:1]
  return np.concatenate([l, 0.01 * l * img[1:2], 0.01 * l * img[2:3]], 0)


def hyab(reference, test):
  delta = reference - test
  return np.abs(delta[0:1]) + np.linalg.norm(delta[1:3], axis=0)


def redistribute_errors(power_delta_e_hyab, cmax):
  pc = 0.4
  pt = 0.95
  pccmax = pc * cmax
  return np.where(
      power_delta_e_hyab < pccmax,
      (pt / pccmax) * power_delta_e_hyab,
      pt + ((power_delta_e_hyab - pccmax) / (cmax - pccmax)) * (1.0 - pt))


def feature_detection(imgy, pixels_per_degree, feature_type):
  """Edge/point detection via normalized Gaussian-derivative filters."""
  w = 0.082
  sd = 0.5 * w * pixels_per_degree
  radius = int(np.ceil(3 * sd))
  x, y = np.meshgrid(range(-radius, radius + 1), range(-radius, radius + 1))
  g = np.exp(-(x**2 + y**2) / (2 * sd * sd))
  if feature_type == "edge":
    gx = -x * g
  else:
    gx = (x**2 / (sd * sd) - 1) * g
  neg = -np.sum(gx[gx < 0])
  pos = np.sum(gx[gx > 0])
  gx = np.where(gx < 0, gx / neg, gx / pos)
  fx = _filter2d(imgy[0], gx)
  fy = _filter2d(imgy[0], np.transpose(gx))
  return np.stack((fx, fy))


def compute_ldrflip(reference, test,
                    pixels_per_degree=(0.7 * 3840 / 0.7) * np.pi / 180):
  """Per-pixel FLIP error (1xHxW in [0, 1]) between sRGB CxHxW images."""
  qc = 0.7
  qf = 0.5

  reference = color_space_transform(
      np.asarray(reference, np.float32), "srgb2ycxcz")
  test = color_space_transform(np.asarray(test, np.float32), "srgb2ycxcz")

  # Color pipeline.
  s_a = generate_spatial_filter(pixels_per_degree, "A")
  s_rg = generate_spatial_filter(pixels_per_degree, "RG")
  s_by = generate_spatial_filter(pixels_per_degree, "BY")
  filtered_reference = spatial_filter(reference, s_a, s_rg, s_by)
  filtered_test = spatial_filter(test, s_a, s_rg, s_by)

  pre_ref = hunt_adjustment(
      color_space_transform(filtered_reference, "linrgb2lab"))
  pre_test = hunt_adjustment(
      color_space_transform(filtered_test, "linrgb2lab"))

  delta_e_hyab = hyab(pre_ref, pre_test)
  hunt_green = hunt_adjustment(color_space_transform(
      np.array([[[0.0]], [[1.0]], [[0.0]]], np.float32), "linrgb2lab"))
  hunt_blue = hunt_adjustment(color_space_transform(
      np.array([[[0.0]], [[0.0]], [[1.0]]], np.float32), "linrgb2lab"))
  cmax = np.power(hyab(hunt_green, hunt_blue), qc)
  delta_e_c = redistribute_errors(np.power(delta_e_hyab, qc), cmax)

  # Feature pipeline.
  reference_y = (reference[0:1] + 16) / 116
  test_y = (test[0:1] + 16) / 116
  edges_ref = feature_detection(reference_y, pixels_per_degree, "edge")
  points_ref = feature_detection(reference_y, pixels_per_degree, "point")
  edges_test = feature_detection(test_y, pixels_per_degree, "edge")
  points_test = feature_detection(test_y, pixels_per_degree, "point")
  delta_e_f = np.maximum(
      np.abs(np.linalg.norm(edges_ref, axis=0)
             - np.linalg.norm(edges_test, axis=0)),
      np.abs(np.linalg.norm(points_test, axis=0)
             - np.linalg.norm(points_ref, axis=0)))
  delta_e_f = np.power((1 / np.sqrt(2)) * delta_e_f, qf)

  return np.power(delta_e_c, 1 - delta_e_f)


def get_magma_map():
  """256x3 magma colormap (via matplotlib)."""
  import matplotlib.cm as cm
  return np.asarray(cm.get_cmap("magma")(np.linspace(0, 1, 256)))[:, :3].T


def index2color(indices, colormap):
  """Map [H, W] byte indices through a 3x256 colormap -> CxHxW colors."""
  indices = np.clip(np.asarray(indices), 0, 255).astype(np.int32)
  return colormap[:, indices]
