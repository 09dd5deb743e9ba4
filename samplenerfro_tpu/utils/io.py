"""Small filesystem/image-IO helpers (reference rnerf/utils.py:280-303,474-487)."""

import os

import numpy as np


def save_img(img, pth, to8b=True):
  """Save an image; clips to [0, 1] and quantizes to 8-bit when to8b."""
  from PIL import Image
  with open(pth, "wb") as imgout:
    if to8b:
      Image.fromarray(
          (np.clip(np.array(img), 0.0, 1.0) * 255.0).astype(np.uint8)
      ).save(imgout, "PNG")
    else:
      Image.fromarray(np.array(img)).save(imgout, "PNG")


def isdir(pth):
  return os.path.isdir(pth)


def makedirs(pth):
  os.makedirs(pth, exist_ok=True)


def pretty_repr(variables, num_spaces=4):
  """Indented shape-only repr of a nested params dict (utils.py:305-328)."""
  import jax.numpy as jnp

  def indent(x):
    lines = x.split("\n")
    return "\n".join(" " * num_spaces + l for l in lines[:-1]) + "\n"

  def pretty(x):
    if not isinstance(x, dict):
      if hasattr(x, "shape"):
        return f"{x.shape}"
      if isinstance(x, (list, tuple)):
        return "[" + ", ".join(pretty(v) for v in x) + "]"
      return f"{type(x)}"
    rep = ""
    for key, val in x.items():
      rep += f"{key}: {pretty(val)},\n"
    return "{\n" + indent(rep) + "}" if rep else "{}"

  import flax
  variables = flax.core.unfreeze(variables)
  params = variables.get("params", variables)
  return f"Variables({pretty(params)})"
