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


# Below this window width the O(k) reduce_window is cheaper than the
# two block scans of the van Herk formulation (scan setup ~= 8 passes).
_VAN_HERK_MIN_K = 16


def _sliding_min_1d(m: jax.Array, ksize: int, axis: int) -> jax.Array:
    """Exact 1D sliding-window minimum in O(log k) ops/px (van Herk /
    Gil-Werman): pad to k-aligned blocks, take prefix- and suffix-min
    scans within each block, and combine two static slices. cv2-style
    centered window [i - k//2, i + (k-1-k//2)]. reduce_window costs
    O(k)/px compares on the VPU — at the compositor's 128-wide erosions
    this is the difference between ~256 and ~20 ops per pixel."""
    n = m.shape[axis]
    p0 = ksize // 2
    nblk = -(-(n + ksize - 1) // ksize)
    total = nblk * ksize
    pad = [(0, 0)] * m.ndim
    pad[axis] = (p0, total - n - p0)
    x = jnp.pad(m, pad, constant_values=jnp.inf)
    shp = list(x.shape)
    shp[axis:axis + 1] = [nblk, ksize]
    xb = x.reshape(shp)
    pre = jax.lax.associative_scan(jnp.minimum, xb, axis=axis + 1)
    suf = jax.lax.associative_scan(jnp.minimum, xb, axis=axis + 1,
                                   reverse=True)
    pre = pre.reshape(x.shape)
    suf = suf.reshape(x.shape)
    # window for output i is padded [i, i+k-1]; it spans <= 2 blocks:
    # suffix-min covers [i, end-of-block], prefix-min [next-block, i+k-1]
    return jnp.minimum(
        jax.lax.slice_in_dim(suf, 0, n, axis=axis),
        jax.lax.slice_in_dim(pre, ksize - 1, ksize - 1 + n, axis=axis))


def erode(mask: jax.Array, ksize: int) -> jax.Array:
    """Morphological erosion with a ksize x ksize all-ones structuring
    element (cv2.erode semantics): min-pool. NHWC float.

    A rectangular structuring element is separable: two 1D min-pools
    (O(2k)/px) replace the naive 2D window (O(k^2)/px); wide windows
    further drop to O(log k)/px via the exact van Herk sliding min."""
    orig_dtype = mask.dtype
    m = mask.astype(jnp.float32)
    if ksize >= _VAN_HERK_MIN_K:
        m = _sliding_min_1d(m, ksize, axis=1)
        m = _sliding_min_1d(m, ksize, axis=2)
    else:
        p0, p1 = ksize // 2, ksize - 1 - ksize // 2
        m = -jax.lax.reduce_window(
            -m, -jnp.inf, jax.lax.max, (1, ksize, 1, 1), (1, 1, 1, 1),
            [(0, 0), (p0, p1), (0, 0), (0, 0)])
        m = -jax.lax.reduce_window(
            -m, -jnp.inf, jax.lax.max, (1, 1, ksize, 1), (1, 1, 1, 1),
            [(0, 0), (0, 0), (p0, p1), (0, 0)])
    return m.astype(orig_dtype)


def dilate(mask: jax.Array, ksize: int) -> jax.Array:
    """Morphological dilation (max-pool, separable; exact van Herk
    sliding max for wide windows). NHWC float."""
    orig_dtype = mask.dtype
    m = mask.astype(jnp.float32)
    if ksize >= _VAN_HERK_MIN_K:
        m = -_sliding_min_1d(-m, ksize, axis=1)
        m = -_sliding_min_1d(-m, ksize, axis=2)
    else:
        p0, p1 = ksize // 2, ksize - 1 - ksize // 2
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, ksize, 1, 1), (1, 1, 1, 1),
            [(0, 0), (p0, p1), (0, 0), (0, 0)])
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 1, ksize, 1), (1, 1, 1, 1),
            [(0, 0), (0, 0), (p0, p1), (0, 0)])
    return m.astype(orig_dtype)
