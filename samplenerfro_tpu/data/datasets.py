"""Host-side dataset loaders with threaded prefetch.

Behavioral parity targets (reference SampleNeRFRO): rnerf/datasets.py:61-776
(Blender / NSVF / OpenCV / LLFF loaders, single_image/all_images batching,
precrop, envmap ray patches, the Grid boundary-point dataset).

TPU notes: batches leave this module as flat host numpy arrays
[batch, ...]; device placement/sharding happens in the training loop via
jax.device_put with a NamedSharding over the ray axis (no per-host reshape
to [local_devices, ...] as pmap needed). Per-host slicing for multi-process
runs is batch_size // process_count, as in the reference.
"""

import json
import os
import queue
import threading
from glob import glob
from os import path

import numpy as np

import jax

from samplenerfro_tpu.data import pose_paths
from samplenerfro_tpu.data import rays as rays_lib
from samplenerfro_tpu.data.rays import Rays, namedtuple_map
from samplenerfro_tpu.ops import grid as grid_ops


def get_dataset(split, args):
  return dataset_dict[args.dataset](split, args)


def _load_image(fname):
  from PIL import Image
  with open(fname, "rb") as imgin:
    return np.array(Image.open(imgin), dtype=np.float32) / 255.0


def _maybe_downsample(image, factor, allow_any=False):
  import cv2
  if factor == 2:
    halfres_h, halfres_w = [hw // 2 for hw in image.shape[:2]]
    return cv2.resize(image, (halfres_w, halfres_h),
                      interpolation=cv2.INTER_AREA)
  if factor > 0 and not allow_any:
    raise ValueError(
        "dataset only supports factor=0 or 2, {} set.".format(factor))
  return image


def _composite_white(images, white_bkgd):
  if white_bkgd:
    return images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
  return images[..., :3]


class Dataset(threading.Thread):
  """Threaded prefetch iterator of training batches / test examples."""

  def __init__(self, split, args):
    super().__init__()
    self.queue = queue.Queue(3)
    self.daemon = True
    self.use_pixel_centers = args.use_pixel_centers
    self.split = split
    self.train_it = 0
    self.test_it = 0
    self.precrop_iters = args.precrop_iters
    self.precrop_frac = args.precrop_frac
    self.patch_size = args.bg_patch_size
    self.tile_size = int(getattr(args, "tile_size", 16))
    self.tile_stride = int(getattr(args, "tile_stride", 1))
    self.tile_images = bool(getattr(args, "tile_images", False))
    if split == "train":
      self._train_init(args)
    elif split in ("val", "test"):
      self._test_init(args)
    else:
      raise ValueError(
          'the split argument should be "train", "val" or "test", set to '
          "{} here.".format(split))
    self.batch_size = args.batch_size // jax.process_count()
    self.batching = args.batching
    self.render_path = args.render_path
    self.start()

  def __iter__(self):
    return self

  def __next__(self):
    """Next batch (train) or example (test) as host numpy arrays."""
    return self.queue.get()

  def peek(self):
    """Copy of the queue front without dequeuing (blocks until ready)."""
    with self.queue.not_empty:
      while not self.queue.queue:
        self.queue.not_empty.wait()
      return self.queue.queue[0].copy()

  def run(self):
    next_func = self._next_train if self.split == "train" else self._next_test
    while True:
      self.queue.put(next_func())

  @property
  def size(self):
    return self.n_examples

  def _train_init(self, args):
    self._load_renderings(args)
    self._generate_rays()
    if args.batching == "all_images":
      self.images = self.images.reshape([-1, 3])
      self.rays = namedtuple_map(
          lambda r: r.reshape([-1, r.shape[-1]]), self.rays)
    elif args.batching in ("single_image", "tile"):
      self.images = self.images.reshape([-1, self.resolution, 3])
      self.rays = namedtuple_map(
          lambda r: r.reshape([-1, self.resolution, r.shape[-1]]), self.rays)
    else:
      raise NotImplementedError(
          f"{args.batching} batching strategy is not implemented.")

  def _test_init(self, args):
    self._load_renderings(args)
    self._generate_rays()

  def _next_train(self):
    if self.batching == "tile":
      return self._next_train_tile()
    if self.batching == "all_images":
      ray_indices = np.random.choice(
          self.rays[0].shape[0], (self.batch_size,), replace=False)
      batch_pixels = self.images[ray_indices]
      batch_rays = namedtuple_map(lambda r: r[ray_indices], self.rays)
    elif self.batching == "single_image":
      image_index = np.random.randint(0, self.n_examples, ())
      if self.train_it < self.precrop_iters:
        dh = int(self.h // 2 * self.precrop_frac)
        dw = int(self.w // 2 * self.precrop_frac)
        coords = np.arange(self.rays[0][0].shape[0]).reshape(
            self.h, self.w)[(self.h // 2 - dh):(self.h // 2 + dh),
                            (self.w // 2 - dw):(self.w // 2 + dw)]
        ray_indices = np.random.choice(
            coords.reshape(-1), (self.batch_size,), replace=False)
      else:
        ray_indices = np.random.choice(
            self.rays[0][0].shape[0], (self.batch_size,), replace=False)
      batch_pixels = self.images[image_index][ray_indices]
      batch_rays = namedtuple_map(
          lambda r: r[image_index][ray_indices], self.rays)
    else:
      raise NotImplementedError(
          f"{self.batching} batching strategy is not implemented.")

    # Envmap smoothness patch rays (rnerf/datasets.py:178-197).
    if self.patch_size > 0:
      image_index = np.random.randint(0, self.n_examples, ())
      if self.train_it < self.precrop_iters:
        dh = int(self.h // 2 * self.precrop_frac)
        dw = int(self.w // 2 * self.precrop_frac)
        coords = np.arange(self.rays[0][0].shape[0]).reshape(
            self.h, self.w)[(self.h // 2 - dh):(self.h // 2 + dh),
                            (self.w // 2 - dw):(self.w // 2 + dw)]
      else:
        coords = np.arange(self.rays[0][0].shape[0]).reshape(self.h, self.w)
      ph, pw = coords.shape
      x = np.random.randint(low=0, high=pw - self.patch_size)
      y = np.random.randint(low=0, high=ph - self.patch_size)
      ray_indices = coords[y:(y + self.patch_size), x:(x + self.patch_size)]
      batch_env_rays = namedtuple_map(
          lambda r: r[image_index][ray_indices], self.rays)
    else:
      batch_env_rays = None

    self.train_it += 1
    return {"pixels": batch_pixels, "rays": batch_rays,
            "env_rays": batch_env_rays}

  def _next_train_tile(self):
    """Sample random pixel tiles (tile-coherent batches).

    Feeds the tiled eikonal marcher (ops/eikonal_tiled.py): each
    consecutive tile_size^2 chunk of the batch is one spatially-coherent
    pixel tile. Opt-in via --batching=tile; the reference's iid-pixel
    sampling is the default.

    Two decorrelation knobs (quality mitigations for the tile-vs-iid
    PSNR gap; both preserve the marcher's block coherence):
      --tile_stride=s samples each tile's tile_size^2 pixels on a
        stride-s lattice covering a (tile_size*s)^2 region — s^2 x less
        pixel-space correlation for ~one window tier of extra march
        drift (absorbed by --march_window=0 auto-calibration).
      --tile_images=1 draws every tile from an independently-sampled
        training image instead of one shared image per batch.
    """
    tile = self.tile_size
    stride = self.tile_stride
    n_tiles = self.batch_size // (tile * tile)
    assert n_tiles * tile * tile == self.batch_size, (
        "batch_size must be a multiple of tile_size^2 for tile batching")
    span = (tile - 1) * stride + 1
    assert span <= self.h and span <= self.w, (
        f"tile_size {tile} at stride {stride} exceeds the {self.h}x{self.w} "
        "image")
    image_index = np.random.randint(0, self.n_examples, ())
    coords = np.arange(self.rays[0][0].shape[0]).reshape(self.h, self.w)
    idx_list, img_list = [], []
    for _ in range(n_tiles):
      x = np.random.randint(0, self.w - span + 1)
      y = np.random.randint(0, self.h - span + 1)
      idx_list.append(coords[y:y + span:stride, x:x + span:stride]
                      .reshape(-1))
      img_list.append(np.random.randint(0, self.n_examples, ())
                      if self.tile_images else image_index)
    if self.tile_images:
      batch_pixels = np.concatenate(
          [self.images[im][idx] for im, idx in zip(img_list, idx_list)])
      batch_rays = namedtuple_map(
          lambda r: np.concatenate(
              [r[im][idx] for im, idx in zip(img_list, idx_list)]),
          self.rays)
    else:
      ray_indices = np.concatenate(idx_list)
      batch_pixels = self.images[image_index][ray_indices]
      batch_rays = namedtuple_map(
          lambda r: r[image_index][ray_indices], self.rays)

    batch_env_rays = None
    if self.patch_size > 0:
      image_index = np.random.randint(0, self.n_examples, ())
      x = np.random.randint(low=0, high=self.w - self.patch_size)
      y = np.random.randint(low=0, high=self.h - self.patch_size)
      env_idx = coords[y:(y + self.patch_size), x:(x + self.patch_size)]
      batch_env_rays = namedtuple_map(
          lambda r: r[image_index][env_idx], self.rays)

    self.train_it += 1
    return {"pixels": batch_pixels, "rays": batch_rays,
            "env_rays": batch_env_rays}

  def _next_test(self):
    idx = self.test_it
    self.test_it = (self.test_it + 1) % self.n_examples
    if self.render_path:
      return {"rays": namedtuple_map(lambda r: r[idx], self.render_rays)}
    return {"pixels": self.images[idx],
            "rays": namedtuple_map(lambda r: r[idx], self.rays)}

  def _generate_rays(self):
    self.rays = rays_lib.generate_pinhole_rays(
        self.w, self.h, self.focal, self.camtoworlds, self.use_pixel_centers)


class Blender(Dataset):
  """Blender transforms_*.json scenes (rnerf/datasets.py:331-370)."""

  def _load_renderings(self, args):
    if args.render_path:
      raise ValueError("render_path cannot be used for the blender dataset.")
    split = "train" if args.eval_train else self.split
    with open(path.join(args.data_dir, f"transforms_{split}.json"), "r") as fp:
      meta = json.load(fp)
    images, cams = [], []
    for i in range(0, len(meta["frames"]), args.skip_frames):
      frame = meta["frames"][i]
      image = _load_image(
          os.path.join(args.data_dir, frame["file_path"] + ".png"))
      image = _maybe_downsample(image, args.factor)
      cams.append(np.array(frame["transform_matrix"], dtype=np.float32))
      images.append(image)
    self.images = _composite_white(np.stack(images, axis=0), args.white_bkgd)
    self.h, self.w = self.images.shape[1:3]
    self.resolution = self.h * self.w
    self.camtoworlds = np.stack(cams, axis=0)
    camera_angle_x = float(meta["camera_angle_x"])
    self.focal = 0.5 * self.w / np.tan(0.5 * camera_angle_x)
    self.n_examples = self.images.shape[0]


class NSVF(Dataset):
  """NSVF-format scenes (rnerf/datasets.py:373-423)."""

  def _load_renderings(self, args):
    if args.render_path:
      raise ValueError("render_path cannot be used for the nsvf dataset.")
    prefix = {"train": 0, "val": 1, "test": 2}
    with open(os.path.join(args.data_dir, "intrinsics.txt"), "r") as fp:
      f, _, _, _ = map(float, fp.readline().split())
    imgfiles = sorted(glob(os.path.join(
        args.data_dir, "rgb", f"{int(prefix[self.split])}_*.png")))
    camfiles = sorted(glob(os.path.join(
        args.data_dir, "pose", f"{int(prefix[self.split])}_*.txt")))
    images, cams = [], []
    for i in range(len(imgfiles)):
      image = _maybe_downsample(_load_image(imgfiles[i]), args.factor)
      images.append(image)
      cam = np.loadtxt(camfiles[i], dtype=np.float32)
      cam[:3, 1:3] *= -1  # flip Y, Z axes
      cams.append(cam)
    self.images = _composite_white(np.stack(images, axis=0), args.white_bkgd)
    self.h, self.w = self.images.shape[1:3]
    self.resolution = self.h * self.w
    self.camtoworlds = np.stack(cams, axis=0)
    self.focal = f * (0.5 if args.factor == 2 else 1.0)
    self.n_examples = self.images.shape[0]


class OpenCV(Dataset):
  """Calibrated real scenes (+z forward; rnerf/datasets.py:426-518)."""

  def _load_renderings(self, args):
    if args.render_path:
      raise ValueError("render_path cannot be used for the opencv dataset.")
    split = "train" if args.eval_train else self.split
    with open(path.join(args.data_dir, f"transforms_{split}.json"), "r") as fp:
      meta = json.load(fp)
    images, cams = [], []
    for i in range(0, len(meta["frames"]), args.skip_frames):
      frame = meta["frames"][i]
      image = _load_image(os.path.join(args.data_dir, frame["file_path"]))
      if args.factor > 0:
        raise ValueError(
            "Opencv dataset does not support factor, {} set.".format(
                args.factor))
      cams.append(np.array(frame["transform_matrix"], dtype=np.float32))
      images.append(image)
    self.images = _composite_white(np.stack(images, axis=0), args.white_bkgd)
    self.h, self.w = self.images.shape[1:3]
    self.resolution = self.h * self.w
    self.camtoworlds = np.stack(cams, axis=0)
    self.cam_mat = meta["cam_mat"]
    self.n_examples = self.images.shape[0]

  def _next_test(self):
    """Central crop of test views (rnerf/datasets.py:466-484)."""
    idx = self.test_it
    self.test_it = (self.test_it + 1) % self.n_examples
    if self.precrop_iters > 0:
      dh = int(self.h // 2 * self.precrop_frac)
      dw = int(self.w // 2 * self.precrop_frac)
    else:
      dh = self.h // 2
      dw = self.w // 2
    sl = np.s_[(self.h // 2 - dh):(self.h // 2 + dh),
               (self.w // 2 - dw):(self.w // 2 + dw)]
    if self.render_path:
      return {"rays": namedtuple_map(lambda r: r[idx][sl], self.render_rays)}
    return {"pixels": self.images[idx][sl],
            "rays": namedtuple_map(lambda r: r[idx][sl], self.rays)}

  def _generate_rays(self):
    self.rays = rays_lib.generate_opencv_rays(
        self.w, self.h, self.cam_mat, self.camtoworlds, self.use_pixel_centers)


class LLFF(Dataset):
  """LLFF forward-facing scenes with NDC rays (rnerf/datasets.py:521-768)."""

  def _load_renderings(self, args):
    imgdir_suffix = ""
    if args.factor > 0:
      imgdir_suffix = "_{}".format(args.factor)
      factor = args.factor
    else:
      factor = 1
    imgdir = path.join(args.data_dir, "images" + imgdir_suffix)
    if not os.path.exists(imgdir):
      raise ValueError("Image folder {} doesn't exist.".format(imgdir))
    imgfiles = [
        path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
        if f.endswith("JPG") or f.endswith("jpg")
    ]
    images = [ _load_image(f) for f in imgfiles ]
    images = np.stack(images, axis=-1)

    with open(path.join(args.data_dir, "poses_bounds.npy"), "rb") as fp:
      poses_arr = np.load(fp)
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])
    if poses.shape[-1] != images.shape[-1]:
      raise RuntimeError("Mismatch between imgs {} and poses {}".format(
          images.shape[-1], poses.shape[-1]))

    poses[:2, 4, :] = np.array(images.shape[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    poses = np.concatenate(
        [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    images = np.moveaxis(images, -1, 0)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    scale = 1.0 / (bds.min() * 0.75)
    poses[:, :3, 3] *= scale
    bds *= scale
    poses = pose_paths.recenter_poses(poses)

    if args.spherify:
      poses, render_poses, bds = pose_paths.spherify_poses(poses, bds)
      if self.split == "test":
        self.render_poses = render_poses
      self.spherify = True
    else:
      self.spherify = False
    if not args.spherify and self.split == "test":
      self.render_poses = pose_paths.spiral_path(poses, bds)

    # Reference hardcodes index ranges for its scenes
    # (rnerf/datasets.py:587-595) — preserved when the scene is large
    # enough; smaller scenes fall back to the standard llffhold split the
    # reference ships commented out.
    if images.shape[0] >= 200:
      if self.split == "train":
        indices = np.arange(100, 200, 1)
      else:
        indices = np.arange(0, 100, 1)
    else:
      i_test = np.arange(images.shape[0])[::args.llffhold]
      if self.split == "train":
        indices = np.array(
            [i for i in np.arange(images.shape[0]) if i not in i_test])
      else:
        indices = i_test
    images = images[indices]
    poses = poses[indices]

    self.images = images
    self.camtoworlds = poses[:, :3, :4]
    self.focal = poses[0, -1, -1]
    self.h, self.w = images.shape[1:3]
    self.resolution = self.h * self.w
    if args.render_path:
      self.n_examples = self.render_poses.shape[0]
    else:
      self.n_examples = images.shape[0]

  def _generate_rays(self):
    if self.split == "test":
      n_render_poses = self.render_poses.shape[0]
      self.camtoworlds = np.concatenate(
          [self.render_poses, self.camtoworlds], axis=0)

    super()._generate_rays()

    if not self.spherify:
      ndc_origins, ndc_directions = rays_lib.convert_to_ndc(
          self.rays.origins, self.rays.directions, self.focal, self.w, self.h)
      mat = ndc_origins
      dx = np.sqrt(np.sum((mat[:, :-1, :, :] - mat[:, 1:, :, :])**2, -1))
      dx = np.concatenate([dx, dx[:, -2:-1, :]], 1)
      dy = np.sqrt(np.sum((mat[:, :, :-1, :] - mat[:, :, 1:, :])**2, -1))
      dy = np.concatenate([dy, dy[:, :, -2:-1]], 2)
      radii = (0.5 * (dx + dy))[..., None] * 2 / np.sqrt(12)
      self.rays = Rays(
          origins=ndc_origins,
          directions=ndc_directions,
          viewdirs=self.rays.directions,
          radii=radii)

    if self.split == "test":
      self.camtoworlds = self.camtoworlds[n_render_poses:]
      split = [np.split(r, [n_render_poses], 0) for r in self.rays]
      split0, split1 = zip(*split)
      self.render_rays = Rays(*split0)
      self.rays = Rays(*split1)

class Grid(Dataset):
  """Boundary-point sampler for sparsity/normal losses.

  Samples 3D points near voxels whose IOR gradient is significant, plus
  trilinear gradient targets (rnerf/datasets.py:245-328).
  """

  def __init__(self, split, args, grid, ndim, nmax, nmin, target=None):
    self.spec = grid_ops.GridSpec(ndim, nmin, nmax)
    self.ndim = ndim
    self.nmax = nmax
    self.nmin = nmin
    self.ndelta = self.spec.ndelta
    grad = np.asarray(grid_ops.central_difference_grad(
        self.spec, np.asarray(grid))).reshape(*self.ndim, 3)
    if target is None:
      self.grid = grad
    else:
      self.grid = np.asarray(grid_ops.central_difference_grad(
          self.spec, np.asarray(target))).reshape(*self.ndim, 3)
    self.candidate_indices = np.stack(
        np.where(np.linalg.norm(grad, axis=-1) > 1e-3), axis=-1)
    self.extra_batch_size = args.extra_batch_size // jax.process_count()
    super().__init__(split, args)

  def _train_init(self, args):
    self.grid = self.grid.reshape(-1, 3)

  def _next_train(self):
    batch_indices = np.random.choice(
        self.candidate_indices.shape[0], self.extra_batch_size)
    batch_pts = self.candidate_indices[batch_indices] / np.array(self.ndim)[None]
    batch_pts = (batch_pts * (np.array(self.nmax)[None]
                              - np.array(self.nmin)[None])
                 + np.array(self.nmin)[None])
    batch_pts += (np.random.uniform(low=-1.0, high=1.0, size=batch_pts.shape)
                  * np.array(self.ndelta)[None])
    batch_grads = grid_ops.trilinear_numpy(self.spec, self.grid, batch_pts)
    return {"pts": batch_pts[:, None].astype(np.float32),
            "grads": batch_grads[:, None].astype(np.float32)}

  def _test_init(self, args):
    raise NotImplementedError()

  def _next_test(self):
    raise NotImplementedError()


dataset_dict = {
    "blender": Blender,
    "llff": LLFF,
    "nsvf": NSVF,
    "opencv": OpenCV,
}
