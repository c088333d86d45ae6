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


import functools


@functools.lru_cache(maxsize=64)
def _reflect_blur_matrix(n: int, ksize: int, sigma: float) -> np.ndarray:
    """(n, n) matrix applying a 1D Gaussian with REFLECT_101 borders:
    out = S @ in. Border reflection folds into the matrix, so the matmul
    is EXACTLY the padded-conv result (same taps, same weights)."""
    k = gaussian_kernel1d(ksize, sigma).astype(np.float64)
    p0 = ksize // 2
    s = np.zeros((n, n), np.float64)
    for t in range(ksize):
        off = t - p0
        src = np.arange(n) + off
        # BORDER_REFLECT_101: ...cba|abcd|cba...
        src = np.abs(src)
        src = np.where(src >= n, 2 * (n - 1) - src, src)
        s[np.arange(n), np.clip(src, 0, n - 1)] += k[t]
    return s.astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int,
                  sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur of an NHWC batch with REFLECT_101 borders
    (cv2.GaussianBlur default border).

    TPU formulation: each 1D pass is a banded (n, n) matmul instead of a
    depthwise conv — depthwise convs lower onto the VPU (~78 GFLOP/s
    measured for the compositor's 101-tap blurs) while the dense matmul
    rides the MXU (~10x, scripts/bench_composite_pieces.py). The border
    reflection is folded into the matrix, so results match the padded
    conv to f32 rounding."""
    h, w = img.shape[1:3]
    sh = jnp.asarray(_reflect_blur_matrix(h, ksize, float(sigma)))
    sw = jnp.asarray(_reflect_blur_matrix(w, ksize, float(sigma)))
    x = img.astype(jnp.float32)
    x = jnp.einsum('hk,bkwc->bhwc', sh, x)
    x = jnp.einsum('wk,bhkc->bhwc', sw, x)
    return x.astype(img.dtype)


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
