"""Batched on-device geometry ops: affine warps and similarity-transform
estimation.

Replaces the per-face cv2.warpAffine / cv2.estimateAffinePartial2D calls of
the reference pipeline (facelib/utils/face_restoration_helper.py:319-361)
with batched, jit-compiled XLA: one gather-based bilinear sampler handles
both the crop (image -> 512x512 face) and the inverse paste-back warp.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def warp_affine(img: jax.Array, matrix: jax.Array,
                out_hw: Tuple[int, int],
                border_value=0.0,
                return_coverage: bool = False,
                img_idx: jax.Array = None) -> jax.Array:
    """Bilinear affine warp of one NHWC image batch with per-item 2x3
    matrices (cv2.warpAffine semantics: `matrix` maps SOURCE coords ->
    DEST coords; we invert it internally like cv2 does without
    WARP_INVERSE_MAP).

    img: (B, H, W, C); matrix: (B, 2, 3); returns (B, out_h, out_w, C).
    border: constant.

    return_coverage=True also returns the warp of an all-ones image with
    zero border, (B, out_h, out_w, 1), computed FREE from the same
    weights/validity — the paste-back compositor's square mask without a
    second (expensive) gather pass.

    img_idx (M,) int32: warp M outputs whose m-th source is
    img[img_idx[m]] (matrix then must be (M, 2, 3)). Exactly equivalent
    to warp_affine(img[img_idx], matrix, ...) but the corner-stacked
    gather source is built ONCE over the B distinct images and the
    frame offset rides the gather's linear index — at 4 faces/frame the
    materialized img[img_idx] quadruples the stack bytes for nothing
    (measured 440 ms/chunk align warp, scripts/bench_e2e_stages.py
    --faces-per-frame 4).
    """
    b = matrix.shape[0] if img_idx is not None else img.shape[0]
    out_h, out_w = out_hw

    # full 3x3 then invert: dest->source mapping
    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]], matrix.dtype),
                      (b, 1, 1))
    m33 = jnp.concatenate([matrix, bottom], axis=1)
    inv = jnp.linalg.inv(m33)[:, :2, :]  # (B, 2, 3)

    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing='ij')
    ones = jnp.ones_like(xs)
    dest = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (P, 3)

    src = jnp.einsum('bij,pj->bpi', inv, dest)  # (B, P, 2) = (x, y)
    out, cov = _bilinear_sample(img, src[..., 0], src[..., 1],
                                border_value, img_idx=img_idx)
    out = out.reshape(b, out_h, out_w, img.shape[-1])
    if return_coverage:
        return out, cov.reshape(b, out_h, out_w, 1)
    return out


def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array,
                     border_value=0.0, img_idx: jax.Array = None):
    """Sample img (B,H,W,C) at float coords x,y (B,P) with bilinear
    interpolation and constant border. Returns (values (B,P,C),
    coverage (B,P,1)) where coverage is the same sample of an all-ones
    image with zero border.

    TPU formulation: the four bilinear corners are fetched with ONE
    gather from a corner-stacked image st[b, y0+1, x0+1] =
    [I[y0,x0], I[y0,x0+1], I[y1,x0], I[y1,x1]] (built with cheap static
    shifts) — gather cost on TPU is per-POINT, so one 4C-wide gather
    beats four C-wide ones ~2x (scripts/bench_warp.py). uint8 inputs
    gather as BYTES and interpolate in f32 (exact for u8-origin data,
    ~2.3x over the f32 gather)."""
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # pad 1px all around, then stack the 2x2 corner window for every
    # base coord in [-1, H-1] x [-1, W-1]; zeros outside the image
    # (border handled below via the coverage masks)
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    st = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
        axis=-1)  # (B, H+1, W+1, 4C)
    yy = jnp.clip(y0i + 1, 0, h)
    xx = jnp.clip(x0i + 1, 0, w)
    if img_idx is not None:
        # the m-th output row samples source image img[img_idx[m]]:
        # one flat gather over all B stacked sources, the image offset
        # folded into the linear index — never materializes img[img_idx]
        flat = st.reshape(b * (h + 1) * (w + 1), 4 * c)
        lin = (img_idx.astype(jnp.int32)[:, None] * ((h + 1) * (w + 1))
               + yy * (w + 1) + xx)
        g = flat[lin]
    elif img.dtype.itemsize == 1:
        # uint8: a flat linear-index gather is fastest (9.5 ns/pt vs
        # 10.7 for 2D indices, scripts/bench_warp.py v5/v6)
        flat = st.reshape(st.shape[0], (h + 1) * (w + 1), 4 * c)
        g = jax.vmap(lambda im, ii: im[ii])(flat, yy * (w + 1) + xx)
    else:
        g = jax.vmap(lambda im, yv, xv: im[yv, xv])(st, yy, xx)
    g = g.astype(jnp.float32)

    def mask(yv, xv):
        return ((xv >= 0) & (xv < w) & (yv >= 0)
                & (yv < h))[..., None].astype(jnp.float32)

    m00 = mask(y0i, x0i)
    m01 = mask(y0i, x0i + 1)
    m10 = mask(y0i + 1, x0i)
    m11 = mask(y0i + 1, x0i + 1)
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    out = (g[..., 0:c] * (w00 * m00) + g[..., c:2 * c] * (w01 * m01)
           + g[..., 2 * c:3 * c] * (w10 * m10)
           + g[..., 3 * c:4 * c] * (w11 * m11))
    cov = w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    # constant-border contribution from the out-of-image weight mass
    border = jnp.asarray(border_value, jnp.float32)
    out = out + (1.0 - cov) * border
    return out, cov


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (scale+rotation+translation)
    mapping src points to dst points — the cv2.estimateAffinePartial2D
    analog used for 5-landmark alignment
    (face_restoration_helper.py:335-337). With 5 clean landmark pairs the
    LMEDS robustification of cv2 degenerates to this least-squares solve.

    src, dst: (N, 2) float. Returns 2x3 matrix (numpy, host-side — the
    solve is tiny and happens per detected face).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    # Umeyama closed form with uniform scale
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    diag = np.diag([1.0, d])
    r = u @ diag @ vt
    var_s = (sc ** 2).sum() / n
    scale = np.trace(np.diag(s) @ diag) / var_s
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m


def invert_affine(matrix: np.ndarray, upscale: float = 1.0) -> np.ndarray:
    """Invert a 2x3 affine and scale translation for upsampled output
    (cv2.invertAffineTransform + the x upscale of
    face_restoration_helper.py:351-361)."""
    m33 = np.vstack([matrix, [0.0, 0.0, 1.0]])
    inv = np.linalg.inv(m33)[:2, :]
    # the whole 2x3 scales: output coords grow by `upscale`
    # (face_restoration_helper.py:357-361)
    return inv * upscale
