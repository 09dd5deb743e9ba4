"""Shared configuration for the calibration / visual-hull tools.

Edit `root` to point at the scene directory (reference calib/cfg.py).
"""

import numpy as np  # noqa: F401

root = "./data/real/scene"

# ------ Visualizer ------
near = 0.2
far = 1.2
# ------ Visual hull ------
num_voxels = 512
# Fixed carving bounds (AprilTag-cube setups), or None to derive the
# bounding box from the camera poses.
min_point = None
max_point = None
threshold = 0.9
