"""Image filters as XLA convolutions/reductions: Gaussian blur, erosion,
box soft-masks. These replace the cv2.GaussianBlur / cv2.erode calls of the
paste-back compositor (face_restoration_helper.py:431-494) so the whole
mask pipeline can run batched on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics: if sigma <= 0,
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int,
                  sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur of an NHWC batch with REFLECT_101 borders
    (cv2.GaussianBlur default border)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    # cv2 anchor convention: left/top pad = k//2, right/bottom = k-1-k//2
    p0, p1 = ksize // 2, ksize - 1 - ksize // 2
    c = img.shape[-1]
    x = jnp.pad(img, ((0, 0), (p0, p1), (p0, p1), (0, 0)),
                mode='reflect')
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), 'VALID',
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), 'VALID',
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def erode(mask: jax.Array, ksize: int) -> jax.Array:
    """Morphological erosion with a ksize x ksize all-ones structuring
    element (cv2.erode semantics): min-pool. NHWC float.

    A rectangular structuring element is separable: two 1D min-pools
    (O(2k)/px) replace the naive 2D window (O(k^2)/px) — at the
    compositor's 128-wide erosions that's a ~64x FLOP cut."""
    orig_dtype = mask.dtype
    m = mask.astype(jnp.float32)
    p0, p1 = ksize // 2, ksize - 1 - ksize // 2
    m = -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max, (1, ksize, 1, 1), (1, 1, 1, 1),
        [(0, 0), (p0, p1), (0, 0), (0, 0)])
    m = -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max, (1, 1, ksize, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (p0, p1), (0, 0)])
    return m.astype(orig_dtype)


def dilate(mask: jax.Array, ksize: int) -> jax.Array:
    """Morphological dilation (max-pool, separable). NHWC float."""
    orig_dtype = mask.dtype
    m = mask.astype(jnp.float32)
    p0, p1 = ksize // 2, ksize - 1 - ksize // 2
    m = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, ksize, 1, 1), (1, 1, 1, 1),
        [(0, 0), (p0, p1), (0, 0), (0, 0)])
    m = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 1, ksize, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (p0, p1), (0, 0)])
    return m.astype(orig_dtype)
