"""FLIP perceptual image-difference metric (numpy): LDR + HDR + CLI.

Reimplementation of NVIDIA's FLIP (Andersson et al., "FLIP: A Difference
Evaluator for Alternating Images", HPG 2020; HDR-FLIP, EG 2021) following
the published algorithm, with the same API surface the reference metric
suite uses (metric/flip/flip_api.py): compute_ldrflip, compute_hdrflip,
tone_map, compute_exposure_params, color_space_transform, HWCtoCHW/CHWtoHWC,
index2color, get_magma_map/get_viridis_map. Cross-tested against the
reference's vendored implementation in tests/test_flip_reference.py.

Run as a CLI (python -m metric.flip -r ref.png -t test.png) it mirrors the
core surface of the reference's metric/flip/flip.py: LDR or HDR selected by
file extension, error/exposure-map PNGs, pooled values. The HDR exposure
map is computed vectorized instead of the reference's per-pixel loop
(flip_api.py:596-623) — same first-matching-exposure semantics.
"""

import os

import cv2
import numpy as np

# Constants quantized to float32 exactly as the published implementation
# stores them (flip_api.py:145-183); arithmetic runs in the input dtype.
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
  # Batched over the last axis exactly as flip_api.py:186-188 — the BLAS
  # path (batched vs one wide GEMM) differs by ~1 ulp in float32, which the
  # Lab a/b channels amplify 500x; keep the same op for cross-exactness.
  out = np.matmul(mat, np.transpose(img, (2, 0, 1)))
  return np.transpose(out, (1, 2, 0))


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
    # power(x, 1/3) rather than cbrt: differs by ~1 ulp, amplified 500x by
    # the a/b channels — matched to the published implementation.
    xyz = np.where(xyz > delta**3, np.power(xyz, 1 / 3), factor * xyz + 4 / 29)
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
  """CSF-filter a YCxCz image, return clamped linear RGB.

  The filtered opponent image is quantized to float32 exactly as the
  published implementation's output buffer (flip_api.py:339-342).
  """
  out = np.stack([
      _filter2d(img[0], s_a),
      _filter2d(img[1], s_rg),
      _filter2d(img[2], s_by),
  ]).astype(np.float32)
  return np.clip(color_space_transform(out, "ycxcz2linrgb"), 0.0, 1.0)


def hunt_adjustment(img):
  """Hunt adjustment in L*a*b* (scale chroma by 0.01 L).

  Output quantized to float32 like the published implementation's buffer
  (flip_api.py:361).
  """
  l = img[0:1]
  return np.concatenate([l, 0.01 * l * img[1:2], 0.01 * l * img[2:3]],
                        0).astype(np.float32)


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

  # float64 throughout: matches the published implementation bit-for-bit
  # closely enough for the 4e-6 cross-test (metric evaluation is offline).
  reference = color_space_transform(
      np.asarray(reference, np.float64), "srgb2ycxcz")
  test = color_space_transform(np.asarray(test, np.float64), "srgb2ycxcz")

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


def _mpl_colormap(name):
  import matplotlib
  return np.asarray(matplotlib.colormaps[name](np.linspace(0, 1, 256)))[:, :3]


def get_magma_map():
  """256x3 magma colormap (via matplotlib)."""
  return _mpl_colormap("magma").T


def get_viridis_map():
  """256x3 viridis colormap (HDR-FLIP exposure maps)."""
  return _mpl_colormap("viridis")


def index2color(indices, colormap):
  """Map [H, W] byte indices through a 3x256 colormap -> CxHxW colors."""
  indices = np.clip(np.asarray(indices), 0, 255).astype(np.int32)
  return colormap[:, indices]


# ---------------------------------------------------------------------------
# HDR-FLIP (Andersson et al., "Visualizing Errors in Rendered High Dynamic
# Range Images", Eurographics 2021 short; metric/flip/flip_api.py:65-132,
# 503-693)
# ---------------------------------------------------------------------------

_TONE_COEFFS = {
    # Rational-polynomial coefficients k0..k5 (ACES and exposure-biased
    # Hable; Reinhard handled separately).
    "aces": (0.6 * 0.6 * 2.51, 0.6 * 0.03, 0.0, 0.6 * 0.6 * 2.43,
             0.6 * 0.59, 0.14),
}


def _hable_coeffs():
  a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
  k0, k1, k2 = a * f - a * e, c * b * f - b * e, 0.0
  k3, k4, k5 = a * f, b * f, d * f * f
  w = 11.2
  white_scale = (k3 * w**2 + k4 * w + k5) / (k0 * w**2 + k1 * w + k2)
  return (4 * k0 * white_scale, 2 * k1 * white_scale, k2 * white_scale,
          4 * k3, 2 * k4, k5)


def tone_map(img, exposure, tone_mapper="aces"):
  """Exposure compensation + tone mapping of a nonnegative CxHxW image."""
  x = (2.0 ** exposure) * np.maximum(img, 0.0)
  if tone_mapper == "reinhard":
    y = 0.2126 * x[0:1] + 0.7152 * x[1:2] + 0.0722 * x[2:3]
    return np.clip(x / (1 + y), 0.0, 1.0)
  k0, k1, k2, k3, k4, k5 = (_hable_coeffs() if tone_mapper == "hable"
                            else _TONE_COEFFS["aces"])
  x2 = x * x
  denom = k3 * x2 + k4 * x + k5
  denom = np.where(np.isinf(denom), 1.0, denom)
  return np.clip((k0 * x2 + k1 * x + k2) / denom, 0.0, 1.0)


def compute_exposure_params(reference, tone_mapper="aces", t_max=0.85,
                            t_min=0.85):
  """Start/stop exposures for HDR-FLIP from the reference's luminance."""
  if tone_mapper == "reinhard":
    x_max = t_max / (1 - t_max)
    x_min = t_min / (1 - t_min)
  else:
    k0, k1, k2, k3, k4, k5 = (_hable_coeffs() if tone_mapper == "hable"
                              else _TONE_COEFFS["aces"])

    def solve(t):
      c0 = (k1 - k4 * t) / (k0 - k3 * t)
      c1 = (k2 - k5 * t) / (k0 - k3 * t)
      return -0.5 * c0 + np.sqrt((0.5 * c0) ** 2 - c1)

    x_max, x_min = solve(t_max), solve(t_min)

  y = (0.2126 * reference[0:1] + 0.7152 * reference[1:2]
       + 0.0722 * reference[2:3])
  y_hi = np.amax(y)
  if y_hi == 0:
    return 0.0, 0.0
  start_exposure = np.log2(x_max / y_hi)
  stop_exposure = np.log2(x_min / np.percentile(y, 50))
  return float(start_exposure), float(stop_exposure)


def compute_hdrflip(reference, test,
                    pixels_per_degree=(0.7 * 3840 / 0.7) * np.pi / 180,
                    tone_mapper="aces", start_exposure=None,
                    stop_exposure=None, num_exposures=None):
  """HDR-FLIP between two nonnegative linear-RGB CxHxW images.

  Sweeps `num_exposures` exposures in [start, stop] (auto-derived from the
  reference when None, flip_api.py:503-596), tone-maps both images, takes
  the per-pixel max of the LDR-FLIP maps.

  Returns:
    (hdrflip [H, W], exposure_map [H, W, 3] viridis, all_errors [H, W, N]).
  """
  if start_exposure is None or stop_exposure is None:
    auto_start, auto_stop = compute_exposure_params(reference, tone_mapper)
    start_exposure = auto_start if start_exposure is None else start_exposure
    stop_exposure = auto_stop if stop_exposure is None else stop_exposure
  if num_exposures is None:
    num_exposures = int(max(2, np.ceil(stop_exposure - start_exposure)))
  step = (stop_exposure - start_exposure) / max(num_exposures - 1, 1)

  _, h, w = reference.shape
  all_errors = np.zeros((h, w, num_exposures), np.float32)
  for i in range(num_exposures):
    exposure = start_exposure + i * step
    ref_srgb = color_space_transform(
        tone_map(reference, exposure, tone_mapper), "linrgb2srgb")
    test_srgb = color_space_transform(
        tone_map(test, exposure, tone_mapper), "linrgb2srgb")
    all_errors[:, :, i] = compute_ldrflip(
        ref_srgb, test_srgb, pixels_per_degree)[0]

  hdrflip = np.max(all_errors, axis=2)
  # Exposure map: first exposure index attaining the max error per pixel
  # (vectorized equivalent of flip_api.py:596-623).
  first_idx = np.argmax(all_errors == hdrflip[..., None], axis=2)
  t = first_idx.astype(np.float64) / max(num_exposures - 1, 1)
  exposure_map = get_viridis_map()[np.round(t * 255.0).astype(np.int32)]
  return hdrflip, exposure_map, all_errors


# ---------------------------------------------------------------------------
# CLI (mirrors the core surface of metric/flip/flip.py)
# ---------------------------------------------------------------------------


def weighted_percentile(error_map, percentile):
  """Percentile of the error distribution weighted by error magnitude."""
  error_sorted = np.sort(error_map.flatten())
  weights = np.cumsum(error_sorted)
  if weights[-1] == 0:
    return 0.0
  idx = np.searchsorted(weights, percentile / 100.0 * weights[-1])
  return float(error_sorted[min(idx, error_sorted.size - 1)])


def load_image(path):
  """Load PNG/JPG as sRGB in [0,1] or EXR/HDR as linear RGB, HWC float32."""
  os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
  hdr = os.path.splitext(path)[1].lower() in (".exr", ".hdr")
  flags = (cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH) if hdr \
      else cv2.IMREAD_COLOR
  img = cv2.imread(path, flags)
  if img is None:
    raise FileNotFoundError(path)
  img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
  if not hdr:
    img /= 255.0
  return img, hdr


def save_image(path, img_hwc):
  """Save an HWC float image in [0,1] as PNG."""
  arr = np.clip(np.asarray(img_hwc), 0.0, 1.0)
  if arr.ndim == 2:
    arr = arr[..., None].repeat(3, axis=-1)
  cv2.imwrite(path, cv2.cvtColor((arr * 255).round().astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))


def main(argv=None):
  import argparse
  parser = argparse.ArgumentParser(
      description="FLIP / HDR-FLIP image difference (numpy).")
  parser.add_argument("-r", "--reference", required=True)
  parser.add_argument("-t", "--test", nargs="+", required=True)
  group = parser.add_mutually_exclusive_group()
  group.add_argument("-ppd", "--pixels_per_degree", type=float)
  group.add_argument("-vc", "--viewing_conditions", nargs=3, type=float,
                     metavar=("DIST_M", "WIDTH_M", "WIDTH_PX"),
                     help="distance to monitor, monitor width (m), width (px)")
  parser.add_argument("-tm", "--tone_mapper", default="ACES")
  parser.add_argument("-n", "--num_exposures", type=int)
  parser.add_argument("-cstart", "--start_exposure", type=float)
  parser.add_argument("-cstop", "--stop_exposure", type=float)
  parser.add_argument("-d", "--directory", default="./")
  parser.add_argument("-b", "--basename")
  parser.add_argument("-txt", "--textfile", action="store_true")
  parser.add_argument("-v", "--verbosity", type=int, default=2)
  parser.add_argument("--no_magma", action="store_true")
  parser.add_argument("--no_exposure_map", action="store_true")
  args = parser.parse_args(argv)

  if args.pixels_per_degree is not None:
    ppd = args.pixels_per_degree
  elif args.viewing_conditions is not None:
    dist, width_m, width_px = args.viewing_conditions
    ppd = dist * (width_px / width_m) * np.pi / 180
  else:
    ppd = 0.7 * (3840 / 0.7) * np.pi / 180

  os.makedirs(args.directory, exist_ok=True)
  ref_hwc, ref_hdr = load_image(args.reference)
  ref_name = os.path.splitext(os.path.basename(args.reference))[0]
  results = []
  for test_path in args.test:
    test_hwc, test_hdr = load_image(test_path)
    if ref_hwc.shape != test_hwc.shape:
      raise ValueError(
          f"image sizes differ: {ref_hwc.shape} vs {test_hwc.shape}")
    test_name = os.path.splitext(os.path.basename(test_path))[0]
    hdr = ref_hdr or test_hdr
    reference, test = HWCtoCHW(ref_hwc), HWCtoCHW(test_hwc)

    if hdr:
      tm = args.tone_mapper.lower()
      error_map, exposure_map, _ = compute_hdrflip(
          reference, test, pixels_per_degree=ppd, tone_mapper=tm,
          start_exposure=args.start_exposure,
          stop_exposure=args.stop_exposure,
          num_exposures=args.num_exposures)
      basename = args.basename or f"flip.{ref_name}.{test_name}.{int(ppd)}ppd.hdr.{tm}"
      if not args.no_exposure_map:
        save_image(os.path.join(args.directory,
                                f"{basename}.exposure_map.png"), exposure_map)
    else:
      error_map = compute_ldrflip(reference, test, ppd)[0]
      basename = args.basename or f"flip.{ref_name}.{test_name}.{int(ppd)}ppd.ldr"

    if args.no_magma:
      out = error_map
    else:
      out = CHWtoHWC(index2color(np.round(error_map * 255.0),
                                 get_magma_map()))
    save_image(os.path.join(args.directory, f"{basename}.png"), out)

    pooled = {
        "mean": float(np.mean(error_map)),
        "weighted_median": weighted_percentile(error_map, 50),
        "weighted_quartile1": weighted_percentile(error_map, 25),
        "weighted_quartile3": weighted_percentile(error_map, 75),
        "min": float(np.min(error_map)),
        "max": float(np.max(error_map)),
    }
    if args.textfile:
      with open(os.path.join(args.directory,
                             f"pooled_values.{basename}.txt"), "w") as f:
        for k, v in pooled.items():
          f.write(f"{k}: {v:.6f}\n")
    if args.verbosity > 0:
      print(f"FLIP between {args.reference} and {test_path}:")
      print(f"\tMean: {pooled['mean']:.6f}")
    results.append((test_path, pooled))
  return results


if __name__ == "__main__":
  main()
