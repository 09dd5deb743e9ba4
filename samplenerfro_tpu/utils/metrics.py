"""In-loop image metrics: PSNR and tf.image-compatible SSIM.

Behavioral parity targets (reference SampleNeRFRO):
  - compute_psnr: rnerf/utils.py:392-401
  - compute_ssim: rnerf/utils.py:404-471 (11x11 Gaussian window, sigma 1.5)
"""

import jax
import jax.numpy as jnp
import jax.scipy as jsp


def compute_psnr(mse):
  """PSNR for unit-range images from an MSE value."""
  return -10.0 * jnp.log(mse) / jnp.log(10.0)


def compute_ssim(img0, img1, max_val, filter_size=11, filter_sigma=1.5,
                 k1=0.01, k2=0.03, return_map=False):
  """SSIM modeled after tf.image.ssim; separable Gaussian filtering."""
  hw = filter_size // 2
  shift = (2 * hw - filter_size + 1) / 2
  f_i = ((jnp.arange(filter_size) - hw + shift) / filter_sigma)**2
  filt = jnp.exp(-0.5 * f_i)
  filt /= jnp.sum(filt)

  filt_fn1 = lambda z: jsp.signal.convolve2d(z, filt[:, None], mode="valid")
  filt_fn2 = lambda z: jsp.signal.convolve2d(z, filt[None, :], mode="valid")

  num_dims = len(img0.shape)
  map_axes = tuple(list(range(num_dims - 3)) + [num_dims - 1])
  for d in map_axes:
    filt_fn1 = jax.vmap(filt_fn1, in_axes=d, out_axes=d)
    filt_fn2 = jax.vmap(filt_fn2, in_axes=d, out_axes=d)
  filt_fn = lambda z: filt_fn1(filt_fn2(z))

  mu0 = filt_fn(img0)
  mu1 = filt_fn(img1)
  mu00 = mu0 * mu0
  mu11 = mu1 * mu1
  mu01 = mu0 * mu1
  sigma00 = filt_fn(img0**2) - mu00
  sigma11 = filt_fn(img1**2) - mu11
  sigma01 = filt_fn(img0 * img1) - mu01

  sigma00 = jnp.maximum(0.0, sigma00)
  sigma11 = jnp.maximum(0.0, sigma11)
  sigma01 = jnp.sign(sigma01) * jnp.minimum(
      jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))

  c1 = (k1 * max_val)**2
  c2 = (k2 * max_val)**2
  numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
  denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
  ssim_map = numer / denom
  ssim = jnp.mean(ssim_map, list(range(num_dims - 3, num_dims)))
  return ssim_map if return_map else ssim
