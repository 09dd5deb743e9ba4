"""COLMAP subprocess wrapper (reference calib/llff/poses/colmap_wrapper.py).

Runs feature extraction, exhaustive matching, and mapping via the `colmap`
binary. Fails with a clear message when colmap is not installed.
"""

import os
import shutil
import subprocess


def run_colmap(basedir, match_type="exhaustive_matcher"):
  if shutil.which("colmap") is None:
    raise RuntimeError(
        "COLMAP binary not found on PATH; install COLMAP to compute poses "
        "for LLFF-style scenes (https://colmap.github.io).")

  logfile_name = os.path.join(basedir, "colmap_output.txt")
  logfile = open(logfile_name, "w")

  feature_extractor_args = [
      "colmap", "feature_extractor",
      "--database_path", os.path.join(basedir, "database.db"),
      "--image_path", os.path.join(basedir, "images"),
      "--ImageReader.single_camera", "1",
  ]
  feat_output = subprocess.check_output(
      feature_extractor_args, universal_newlines=True)
  logfile.write(feat_output)
  print("Features extracted")

  matcher_args = [
      "colmap", match_type,
      "--database_path", os.path.join(basedir, "database.db"),
  ]
  match_output = subprocess.check_output(
      matcher_args, universal_newlines=True)
  logfile.write(match_output)
  print("Features matched")

  sparse_dir = os.path.join(basedir, "sparse")
  if not os.path.exists(sparse_dir):
    os.makedirs(sparse_dir)

  mapper_args = [
      "colmap", "mapper",
      "--database_path", os.path.join(basedir, "database.db"),
      "--image_path", os.path.join(basedir, "images"),
      "--output_path", sparse_dir,
      "--Mapper.num_threads", "16",
      "--Mapper.init_min_tri_angle", "4",
      "--Mapper.multiple_models", "0",
      "--Mapper.extract_colors", "0",
  ]
  map_output = subprocess.check_output(mapper_args, universal_newlines=True)
  logfile.write(map_output)
  logfile.close()
  print("Sparse map created")
  print(f"Finished running COLMAP, see {logfile_name} for logs")
