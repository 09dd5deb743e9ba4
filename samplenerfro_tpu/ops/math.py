"""Safe math helpers and positional encodings.

Behavioral parity targets (reference SampleNeRFRO):
  - safe_* helpers: rnerf/math_utils.py:6-39
  - pos_enc / annealed_pos_enc / cosine window: rnerf/model_utils.py:187-245
TPU notes: trig inputs are range-reduced (safe_sin/safe_cos) because large
arguments NaN on TPU; matmuls that need full fp32 go through `matmul`.
"""

import functools

import jax
import jax.numpy as jnp


def safe_l2_norm(x, eps=1e-6):
  """L2 norm along the last axis with a NaN-free gradient at 0."""
  return jnp.sqrt(jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps))


def safe_l2_normalize(x, eps=1e-6):
  return x / safe_l2_norm(x, eps)


def safe_divide(a, b, eps=1e-6):
  return a / (b + eps)


def safe_log(x, eps=1e-6):
  return jnp.log(jnp.maximum(x, eps))


def matmul(a, b):
  """fp32 matmul: keeps the MXU in full-precision mode regardless of defaults."""
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _safe_trig(x, fn, t=100 * jnp.pi):
  return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_sin(x):
  """sin with range reduction; jnp.sin NaNs on TPU for huge arguments."""
  return _safe_trig(x, jnp.sin)


def safe_cos(x):
  return _safe_trig(x, jnp.cos)


@functools.partial(jax.jit, static_argnames=("min_deg", "max_deg", "legacy_posenc_order"))
def pos_enc(x, min_deg, max_deg, legacy_posenc_order=False, amp=1.0):
  """Concatenate x with sinusoidal features at scales 2^[min_deg, max_deg).

  Matches rnerf/model_utils.py:187-214 including the legacy interleaved
  ordering option. Returns [..., D + 2*D*(max_deg-min_deg)].
  """
  if min_deg == max_deg:
    return x
  scales = jnp.asarray([2**i for i in range(min_deg, max_deg)], dtype=x.dtype)
  if legacy_posenc_order:
    xb = x[..., None, :] * scales[:, None]
    four_feat = jnp.reshape(
        jnp.sin(jnp.stack([xb, xb + 0.5 * jnp.pi], axis=-2)),
        list(x.shape[:-1]) + [-1])
  else:
    xb = jnp.reshape(x[..., None, :] * scales[:, None], list(x.shape[:-1]) + [-1])
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
  return jnp.concatenate([x, amp * four_feat], axis=-1)


def cosine_easing_window(min_freq_log2, max_freq_log2, num_bands, alpha):
  """Nerfies frequency-annealing window (rnerf/model_utils.py:218-234)."""
  if max_freq_log2 is None:
    max_freq_log2 = num_bands - 1.0
  bands = jnp.linspace(min_freq_log2, max_freq_log2, num_bands)
  x = jnp.clip(alpha - bands, 0.0, 1.0)
  return 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))


@functools.partial(jax.jit, static_argnames=("min_deg", "max_deg"))
def annealed_pos_enc(x, min_deg, max_deg, alpha, amp=1.0):
  """Cosine-annealed PE. NOTE: unlike pos_enc, does NOT prepend raw x.

  Matches rnerf/model_utils.py:236-245 (feature order: [sin(xb)*w, cos(xb)*w]
  interleaved per degree along the last-but-one axis, flattened).
  """
  if min_deg == max_deg:
    return x
  scales = jnp.asarray([2**i for i in range(min_deg, max_deg)], dtype=x.dtype)
  xb = x[..., None, :] * scales[:, None]
  window = cosine_easing_window(min_deg, max_deg - 1, max_deg - min_deg, alpha)[:, None]
  four_feat = jnp.reshape(
      jnp.concatenate([jnp.sin(xb) * window, jnp.sin(xb + 0.5 * jnp.pi) * window], axis=-1),
      list(x.shape[:-1]) + [-1])
  return amp * four_feat


def trans_t(t):
  """z-translation pose matrix (rnerf/math_utils.py:42-46)."""
  import numpy as np
  return np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]],
                  dtype=np.float32)


def rot_phi(phi):
  import numpy as np
  return np.array([[1, 0, 0, 0],
                   [0, np.cos(phi), -np.sin(phi), 0],
                   [0, np.sin(phi), np.cos(phi), 0],
                   [0, 0, 0, 1]], dtype=np.float32)


def rot_theta(th):
  import numpy as np
  return np.array([[np.cos(th), 0, -np.sin(th), 0],
                   [0, 1, 0, 0],
                   [np.sin(th), 0, np.cos(th), 0],
                   [0, 0, 0, 1]], dtype=np.float32)


def pose_spherical(theta, phi, radius):
  """Spherical camera pose for virtual orbits (rnerf/math_utils.py:61-66)."""
  import numpy as np
  c2w = trans_t(radius)
  c2w = rot_phi(phi / 180.0 * np.pi) @ c2w
  c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
  c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                 dtype=np.float32) @ c2w
  return c2w


def learning_rate_decay(step, lr_init, lr_final, max_steps, lr_delay_steps=0,
                        lr_delay_mult=1, lr_start_steps=0):
  """Log-lerp decay with warmup and optional delayed start.

  Matches rnerf/utils.py:490-528: reverse-cosine warmup over lr_delay_steps,
  hard zero before lr_start_steps, exp(lerp(log lr_init, log lr_final)).
  """
  if lr_delay_steps > 0:
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
  else:
    delay_rate = 1.0
  start_rate = jnp.clip(step - lr_start_steps, 0, 1)
  t = jnp.clip(jnp.maximum(step - lr_start_steps, 0) / (max_steps - lr_start_steps), 0, 1)
  log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
  return start_rate * delay_rate * log_lerp
