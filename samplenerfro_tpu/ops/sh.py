"""Real spherical harmonics: radiance decoding and directional encoding.

Behavioral parity targets (reference SampleNeRFRO):
  - eval_sh (PlenOctrees SH decode, deg<=4): rnerf/sh.py:55-110
  - dir_enc (tiny-cuda-nn SH direction encoding, bands<=8): rnerf/sh.py:112-204
  - annealed_dir_enc: rnerf/sh.py:210-301

Instead of a hardcoded polynomial listing, the basis is generated from the
standard semi-normalized associated-Legendre recurrence with the
Condon-Shortley phase folded in, which reproduces the reference's hardcoded
polynomials exactly for unit-length directions (all call sites pass normalized
view directions). Band ordering per degree l is m = -l..l, matching the
reference listing.
"""

import math as pymath

import jax.numpy as jnp
import numpy as np


def _k_norm(l, m):
  """SH normalization K(l, m) = sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!)."""
  return pymath.sqrt((2 * l + 1) / (4 * pymath.pi)
                     * pymath.factorial(l - m) / pymath.factorial(l + m))


def sh_basis(num_bands, dirs):
  """Evaluate the real SH basis for bands l = 0..num_bands-1 on unit dirs.

  Args:
    num_bands: int, number of SH bands (degree_max + 1). Supports >= 1.
    dirs: [..., 3] unit direction vectors.

  Returns:
    [..., num_bands**2] basis values ordered (l, m=-l..l).
  """
  x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]

  # Azimuthal polynomials: A_m = Re((x+iy)^m), B_m = Im((x+iy)^m).
  a = [jnp.ones_like(x)]
  b = [jnp.zeros_like(x)]
  for m in range(1, num_bands):
    a.append(x * a[m - 1] - y * b[m - 1])
    b.append(x * b[m - 1] + y * a[m - 1])

  # Semi-normalized associated Legendre p[l][m] = P_l^m(z) / (1-z^2)^(m/2),
  # Condon-Shortley phase included: p[m][m] = (-1)^m (2m-1)!!.
  p = [[None] * num_bands for _ in range(num_bands)]
  for m in range(num_bands):
    pmm = ((-1.0) ** m) * float(np.prod(np.arange(1, 2 * m, 2), dtype=np.float64) or 1.0)
    p[m][m] = jnp.full_like(z, pmm)
    if m + 1 < num_bands:
      p[m + 1][m] = (2 * m + 1) * z * p[m][m]
    for l in range(m + 2, num_bands):
      p[l][m] = ((2 * l - 1) * z * p[l - 1][m] - (l + m - 1) * p[l - 2][m]) / (l - m)

  out = []
  sqrt2 = pymath.sqrt(2.0)
  for l in range(num_bands):
    for m in range(-l, l + 1):
      am = abs(m)
      k = _k_norm(l, am)
      if m == 0:
        out.append(k * p[l][0])
      elif m < 0:
        out.append(sqrt2 * k * p[l][am] * b[am])
      else:
        out.append(sqrt2 * k * p[l][am] * a[am])
  return jnp.stack(out, axis=-1)


def eval_sh(deg, sh, dirs):
  """Decode SH radiance coefficients at unit directions.

  Args:
    deg: int, SH degree in [0, 4] (matches reference support).
    sh: [..., C, (deg+1)**2] SH coefficients.
    dirs: [..., 3] unit directions (broadcastable against sh's batch dims).

  Returns:
    [..., C] decoded values. Parity: rnerf/sh.py:55-110 on unit dirs.
  """
  assert 0 <= deg <= 4
  assert (deg + 1) ** 2 == sh.shape[-1]
  basis = sh_basis(deg + 1, dirs)
  return jnp.einsum("...ck,...k->...c", sh, basis)


def dir_enc(data_in, sh_degree):
  """SH direction encoding (tiny-cuda-nn style).

  Args:
    data_in: [..., 3] unit view directions.
    sh_degree: int in [1, 8], the number of SH bands.

  Returns:
    [..., sh_degree**2]. Parity: rnerf/sh.py:112-204 on unit dirs.
  """
  assert 1 <= sh_degree <= 8
  return sh_basis(sh_degree, data_in)


def cosine_easing_factor(band, alpha):
  """Per-band annealing factor (rnerf/sh.py:206-208)."""
  x = jnp.clip(alpha - band, 0.0, 1.0)
  return 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))


def annealed_dir_enc(data_in, sh_degree, alpha):
  """Frequency-annealed SH direction encoding.

  Each band l is scaled by cosine_easing_factor(l, alpha). Unlike the
  reference listing (rnerf/sh.py:210-301), the factor here multiplies the
  whole basis term including constant offsets (the reference applies it only
  to the leading monomial due to operator precedence); this function is not
  reachable from any shipped config/driver in the reference.
  """
  basis = dir_enc(data_in, sh_degree)
  bands = np.concatenate([np.full(2 * l + 1, l) for l in range(sh_degree)])
  factors = cosine_easing_factor(jnp.asarray(bands, dtype=basis.dtype), alpha)
  return basis * factors
