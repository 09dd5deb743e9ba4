"""Cross-test metric/flip.py against the reference's vendored NVIDIA FLIP.

The reference vendors the published implementation at
/root/reference/metric/flip/flip_api.py (numpy + cv2; OpenEXR/Imath are
imported only for EXR file IO and are stubbed here). This pins the round-1
claim ("validated to 4e-6 against the published implementation") as a test:
LDR-FLIP, the HDR tone mappers, auto-exposure, and full HDR-FLIP.
"""

import sys
import types

import numpy as np
import pytest

from metric import flip as our_flip


def _load_ref_flip():
  """Load the reference flip package under an isolated module name.

  Importing it as plain `flip` would shadow metric/flip.py for other tests
  (test_metric_suite.py imports it as top-level `flip`), so register the
  package as `ref_nvidia_flip` via importlib instead of sys.path.
  """
  import importlib.util
  pkg_name = "ref_nvidia_flip"
  if pkg_name + ".flip_api" in sys.modules:
    return sys.modules[pkg_name + ".flip_api"]
  for name in ("OpenEXR", "Imath"):
    if name not in sys.modules:
      sys.modules[name] = types.ModuleType(name)
  root = "/root/reference/metric/flip"
  spec = importlib.util.spec_from_file_location(
      pkg_name, root + "/__init__.py", submodule_search_locations=[root])
  pkg = importlib.util.module_from_spec(spec)
  sys.modules[pkg_name] = pkg
  spec.loader.exec_module(pkg)
  return sys.modules[pkg_name + ".flip_api"]


REF = _load_ref_flip()

# The reference metric protocol's viewing condition (metric/summary.py:78):
# 0.3 m monitor width, 0.5 m distance, 400 px.
SUMMARY_PPD = 0.5 * (400 / 0.3) * np.pi / 180


def _srgb_pair(h=40, w=56, seed=0):
  """Structured sRGB CxHxW image pair (gradient + blob + noise)."""
  rng = np.random.RandomState(seed)
  yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
  base = np.stack([
      xx / w,
      yy / h,
      np.exp(-((xx - w / 2)**2 + (yy - h / 2)**2) / (0.1 * h * w)),
  ])
  ref = np.clip(base + 0.05 * rng.rand(3, h, w), 0, 1).astype(np.float32)
  test = np.clip(ref + 0.1 * rng.randn(3, h, w) * base[2], 0, 1).astype(
      np.float32)
  return ref, test


def _hdr_pair(h=32, w=48, seed=1):
  ref, test = _srgb_pair(h, w, seed)
  # Linear HDR with a bright highlight region.
  scale = 1.0 + 20.0 * ref[2:3]
  return (ref**2.2 * scale).astype(np.float32), \
      (test**2.2 * scale).astype(np.float32)


@pytest.mark.parametrize("ppd", [SUMMARY_PPD, (0.7 * 3840 / 0.7) * np.pi / 180])
def test_ldrflip_matches_reference(ppd):
  """Algorithmic equivalence at 4e-6 (both pipelines fed float64).

  The vendored implementation inherits its input dtype; fed float32 it
  carries ~1e-5 of its own rounding noise through the qc/qf power stages,
  so the float32-vs-float64 delta is checked separately below.
  """
  ref_img, test_img = _srgb_pair()
  ours = our_flip.compute_ldrflip(ref_img, test_img, ppd)
  theirs = REF.compute_ldrflip(ref_img.astype(np.float64),
                               test_img.astype(np.float64), ppd)
  assert ours.shape == theirs.shape
  np.testing.assert_allclose(ours, theirs, atol=4e-6)


def test_ldrflip_close_to_reference_float32():
  """Against the reference's float32 path: agree to 2e-5 (its own noise)."""
  ref_img, test_img = _srgb_pair(seed=7)
  ours = our_flip.compute_ldrflip(ref_img, test_img, SUMMARY_PPD)
  theirs = REF.compute_ldrflip(ref_img, test_img, SUMMARY_PPD)
  np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("space", [
    "srgb2linrgb", "linrgb2srgb", "linrgb2xyz", "xyz2ycxcz", "xyz2lab",
    "srgb2ycxcz", "ycxcz2linrgb", "linrgb2lab",
])
def test_color_space_transform_matches_reference(space):
  img = _srgb_pair(seed=2)[0]
  if space.startswith("xyz"):
    img = our_flip.color_space_transform(img, "linrgb2xyz")
  np.testing.assert_allclose(
      our_flip.color_space_transform(img, space),
      REF.color_space_transform(img.copy(), space), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tm", ["aces", "hable", "reinhard"])
@pytest.mark.parametrize("exposure", [-2.0, 0.0, 1.5])
def test_tone_map_matches_reference(tm, exposure):
  hdr, _ = _hdr_pair()
  np.testing.assert_allclose(our_flip.tone_map(hdr, exposure, tm),
                             REF.tone_map(hdr, exposure, tm), atol=1e-6)


@pytest.mark.parametrize("tm", ["aces", "hable", "reinhard"])
def test_exposure_params_match_reference(tm):
  hdr, _ = _hdr_pair(seed=3)
  ours = our_flip.compute_exposure_params(hdr, tm)
  theirs = REF.compute_exposure_params(hdr, tm)
  np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.mark.parametrize("tm", ["aces", "reinhard"])
def test_hdrflip_matches_reference(tm, tmp_path):
  hdr_ref, hdr_test = _hdr_pair(seed=4)
  # float64, as in the LDR cross-test: the float32 path carries the
  # reference's own rounding noise (~2e-5) through the power stages.
  hdr_ref = hdr_ref.astype(np.float64)
  hdr_test = hdr_test.astype(np.float64)
  start, stop = our_flip.compute_exposure_params(hdr_ref, tm)
  num = int(max(2, np.ceil(stop - start)))
  ours_map, ours_exp, _ = our_flip.compute_hdrflip(
      hdr_ref, hdr_test, tone_mapper=tm, start_exposure=start,
      stop_exposure=stop, num_exposures=num)
  theirs_map, theirs_exp = REF.compute_hdrflip(
      hdr_ref, hdr_test, str(tmp_path), "r", "t", "b", True,
      tone_mapper=tm, start_exposure=start, stop_exposure=stop,
      num_exposures=num)
  np.testing.assert_allclose(ours_map, theirs_map, atol=4e-6)
  # Same exposure selection (viridis maps may differ at the 8th decimal of
  # the colormap tables across matplotlib versions; compare selections).
  np.testing.assert_allclose(ours_exp, theirs_exp, atol=1e-2)


def test_colormaps_match_reference():
  """Same tables; ours is 3x256 (index2color convention), theirs 256x3."""
  np.testing.assert_allclose(our_flip.get_magma_map().T, REF.get_magma_map(),
                             atol=1e-12)
  np.testing.assert_allclose(our_flip.get_viridis_map(),
                             REF.get_viridis_map(), atol=1e-12)


# ---------------------------------------------------------------------------
# Golden-image CLI tests (the reference's tests.py protocol,
# metric/flip/tests.py:70-85: run the CLI on committed inputs, filecmp the
# outputs against committed goldens)
# ---------------------------------------------------------------------------

import filecmp
import os
import subprocess

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "flip")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(tmp_path, ref_name, test_name):
  cmd = ["python", "-m", "metric.flip",
         "-r", os.path.join(GOLDEN, ref_name),
         "-t", os.path.join(GOLDEN, test_name),
         "-vc", "0.5", "0.3", "400", "-d", str(tmp_path), "-txt", "-v", "0"]
  subprocess.run(cmd, check=True, cwd=REPO, capture_output=True)


def test_ldrflip_cli_golden(tmp_path):
  _run_cli(tmp_path, "reference.png", "test.png")
  for name in ("flip.reference.test.11ppd.ldr.png",
               "pooled_values.flip.reference.test.11ppd.ldr.txt"):
    assert filecmp.cmp(str(tmp_path / name), os.path.join(GOLDEN, name)), name


def test_hdrflip_cli_golden(tmp_path):
  _run_cli(tmp_path, "reference.hdr", "test.hdr")
  for name in ("flip.reference.test.11ppd.hdr.aces.png",
               "flip.reference.test.11ppd.hdr.aces.exposure_map.png",
               "pooled_values.flip.reference.test.11ppd.hdr.aces.txt"):
    assert filecmp.cmp(str(tmp_path / name), os.path.join(GOLDEN, name)), name
