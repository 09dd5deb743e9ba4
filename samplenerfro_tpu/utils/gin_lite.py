"""Minimal gin-config-compatible parser.

The reference configures class-level parameters through gin files of the form

    VoxMLP.interp_method = 'linear3'
    Config.kernel_size = 3
    NerfModel.use_mask_bbox = False
    PathSampler.normal_radius_scale = 0.1

(`configs/*.gin`). The real gin package is not available in this image, so
this module parses exactly that subset: `Class.param = <python literal>`
lines, full-line and trailing `#` comments, and `--gin_param` style override
strings. Values are parsed with ast.literal_eval (None, booleans, numbers,
strings, lists, tuples).
"""

import ast


def parse_line(line):
  """Parse one binding line -> (key, value) or None for blanks/comments."""
  # Strip trailing comments outside of string literals (configs only use
  # simple literals, so a conservative split on ' #' is sufficient; a '#'
  # inside quotes is preserved by checking quote balance).
  stripped = line.strip()
  if not stripped or stripped.startswith("#"):
    return None
  if "#" in stripped:
    head = []
    in_str = None
    for ch in stripped:
      if in_str:
        if ch == in_str:
          in_str = None
      elif ch in "'\"":
        in_str = ch
      elif ch == "#":
        break
      head.append(ch)
    stripped = "".join(head).strip()
    if not stripped:
      return None
  if "=" not in stripped:
    raise ValueError(f"malformed gin binding: {line!r}")
  key, _, value = stripped.partition("=")
  key = key.strip()
  value = value.strip()
  if not key or "." not in key:
    raise ValueError(f"malformed gin binding key: {line!r}")
  try:
    parsed = ast.literal_eval(value)
  except (ValueError, SyntaxError) as e:
    raise ValueError(f"cannot parse gin value in {line!r}") from e
  return key, parsed


def parse_files_and_bindings(files, bindings=None):
  """Parse gin files + override strings into a flat {key: value} dict."""
  out = {}
  for fname in files or []:
    with open(fname) as f:
      for line in f:
        kv = parse_line(line)
        if kv is not None:
          out[kv[0]] = kv[1]
  for binding in bindings or []:
    kv = parse_line(binding)
    if kv is not None:
      out[kv[0]] = kv[1]
  return out


def config_str(bindings):
  """Render bindings back to gin text (for the config.txt snapshot)."""
  return "\n".join(f"{k} = {v!r}" for k, v in sorted(bindings.items())) + "\n"
