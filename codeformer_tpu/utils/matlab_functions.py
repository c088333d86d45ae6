"""MATLAB-compatible image functions (reference:
basicsr/utils/matlab_functions.py): `imresize` with cubic interpolation and
antialiasing (exact MATLAB weights), and BT.601 RGB/BGR<->YCbCr converters
used by the Y-channel metrics."""
from __future__ import annotations

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB's cubic kernel (a = -0.5)."""
    absx = np.abs(x)
    absx2 = absx ** 2
    absx3 = absx ** 3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1)
            + (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2)
            * ((absx > 1) & (absx <= 2)))


def _weights_indices(in_length: int, out_length: int, scale: float,
                     antialiasing: bool):
    if scale < 1 and antialiasing:
        kernel_width = 4.0 / scale
    else:
        kernel_width = 4.0
    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :] - 1
    dist = u[:, None] - indices - 1
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # remove zero columns
    nonzero = np.any(weights != 0, axis=0)
    weights = weights[:, nonzero]
    indices = indices[:, nonzero]
    # MATLAB 'symmetric' boundary: -1 -> 0, -2 -> 1; n -> n-1, n+1 -> n-2
    indices = np.where(indices < 0, -indices - 1, indices)
    indices = np.where(indices > in_length - 1,
                       2 * in_length - 1 - indices, indices)
    indices = np.clip(indices, 0, in_length - 1).astype(np.int64)
    return weights, indices


def imresize(img: np.ndarray, scale: float,
             antialiasing: bool = True) -> np.ndarray:
    """MATLAB imresize, cubic kernel, float image HWC or HW in [0, 1]
    (matlab_functions.py:86-166)."""
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    in_h, in_w = img.shape[:2]
    out_h = int(np.ceil(in_h * scale))
    out_w = int(np.ceil(in_w * scale))

    w_h, idx_h = _weights_indices(in_h, out_h, scale, antialiasing)
    w_w, idx_w = _weights_indices(in_w, out_w, scale, antialiasing)

    img = img.astype(np.float64)
    # rows: per-output-row gather (out_h, taps, in_w, C) -> weighted sum
    tmp = np.einsum('ot,otwc->owc', w_h, img[idx_h])
    # cols: (out_h, out_w, taps, C) -> weighted sum
    out = np.einsum('ot,hotc->hoc', w_w, tmp[:, idx_w])
    if squeeze:
        out = out[:, :, 0]
    return out.astype(np.float32)


_YCBCR_MAT = np.array([[65.481, -37.797, 112.0],
                       [128.553, -74.203, -93.786],
                       [24.966, 112.0, -18.214]])


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """float [0,1] or uint8 RGB -> YCbCr (matlab_functions.py:169-202)."""
    img_type = img.dtype
    img = img.astype(np.float64)
    if img_type != np.uint8:
        img *= 255.0
    if y_only:
        out = np.dot(img, _YCBCR_MAT[:, 0]) / 255.0 + 16.0
    else:
        out = np.matmul(img, _YCBCR_MAT) / 255.0 + [16, 128, 128]
    if img_type == np.uint8:
        out = out.round()
    else:
        out /= 255.0
    return out.astype(np.float32 if img_type != np.uint8 else np.uint8)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """BGR variant (matlab_functions.py:205-235)."""
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """YCbCr -> RGB (matlab_functions.py:238-263)."""
    img_type = img.dtype
    img = img.astype(np.float64)
    if img_type != np.uint8:
        img *= 255.0
    inv = np.linalg.inv(_YCBCR_MAT.T / 255.0 * 255.0) * 255.0
    # standard inverse transform
    mat = np.array([[0.00456621, 0.00456621, 0.00456621],
                    [0, -0.00153632, 0.00791071],
                    [0.00625893, -0.00318811, 0]]) * 255.0
    out = np.matmul(img, mat) + [-222.921, 135.576, -276.836]
    if img_type == np.uint8:
        out = out.round()
    else:
        out /= 255.0
    return np.clip(out, 0, 255 if img_type == np.uint8 else 1).astype(
        np.float32 if img_type != np.uint8 else np.uint8)
