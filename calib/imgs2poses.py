"""CLI driver: run COLMAP + produce poses_bounds.npy (LLFF pipeline).

Parity with the reference calib/imgs2poses.py.
"""

import argparse

from llff import pose_utils

if __name__ == "__main__":
  parser = argparse.ArgumentParser()
  parser.add_argument("--match_type", type=str, default="exhaustive_matcher",
                      help="exhaustive_matcher or sequential_matcher")
  parser.add_argument("scenedir", type=str,
                      help="input scene directory (with an images/ subdir)")
  args = parser.parse_args()
  if args.match_type not in ("exhaustive_matcher", "sequential_matcher"):
    raise SystemExit("ERROR: matcher type " + args.match_type
                     + " is not valid. Aborting")
  pose_utils.gen_poses(args.scenedir, args.match_type)
