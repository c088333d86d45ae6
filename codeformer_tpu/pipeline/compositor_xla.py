"""On-device paste-back compositor — batched XLA version of
FaceRestoreHelper.paste_faces_to_input_image (face_restoration_helper.py:
372-516).

All heavy work (inverse warps of faces + masks, erosions, Gaussian
soft-edges, parse-mask shaping, alpha compositing) runs in ONE jit graph
per (canvas-bucket, n-faces-bucket, edge-kernel) configuration:

  * warps: ops.geometry.warp_affine (gather-based bilinear)
  * erosions: min-pool (ops.filters.erode)
  * fusion edge: the reference sizes its erosion/blur kernels from the
    warped face area (a runtime value). We compute the area host-side from
    the affine determinant (area = face_h*face_w*|det A^-1| — no device
    round trip) and quantize the edge width to multiples of 8, capped at
    64, so kernel sizes stay static and the compile set stays small.
    The quantization shifts the soft edge by <=4px under a 100+px-wide
    blur — visually identical, documented deviation from cv2 parity.
  * faces composite sequentially (later faces overwrite, like the
    reference's loop) via lax.fori_loop over a fixed faces axis.

This is the default compositor; the cv2 transcription in
face_helper.paste_faces_to_input_image remains as the pixel-parity oracle
(compositor='cv2') and as the automatic fallback for inputs this graph
doesn't cover (16-bit, alpha canvas, non-square crop_ratio).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codeformer_tpu.ops.filters import erode, gaussian_blur
from codeformer_tpu.ops.geometry import warp_affine

MASK_COLORMAP = jnp.asarray(
    [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
     0, 255, 0, 0, 0], jnp.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack(m: jax.Array) -> jax.Array:
    """(N, h, w, 1) -> (1, h, w, N): mask filtering runs N-per-lane
    instead of wasting 127/128 VPU lanes on a single channel."""
    return jnp.transpose(m[..., 0], (1, 2, 0))[None]


def _unpack(m: jax.Array) -> jax.Array:
    """(1, h, w, N) -> (N, h, w, 1)."""
    return jnp.transpose(m[0], (2, 0, 1))[..., None]


def _colormap_lookup(parse_ids: jax.Array) -> jax.Array:
    """MASK_COLORMAP[parse_ids] without a gather: the 19-entry map is
    0/255-valued, so a few integer compares replace a 4M-point gather
    (~34 ms -> ~free on TPU, scripts/bench_composite_pieces.py)."""
    zero_ids = np.where(np.asarray(MASK_COLORMAP) == 0)[0]
    is_zero = functools.reduce(
        lambda acc, i: acc | (parse_ids == int(i)), zero_ids,
        jnp.zeros(parse_ids.shape, bool))
    return jnp.where(is_zero, 0.0, 255.0)


def _shape_parse_masks(parse_ids: jax.Array, face_size: int, n: int
                       ) -> jax.Array:
    """parse ids (N,res,res) int32 -> soft parse masks (N,face,face,1)
    in [0,1] (the reference's colormap + double 101-blur + edge zeroing,
    face_restoration_helper.py:458-476), channel-packed for VPU width.

    res == 512 reproduces the reference exactly (kernel 101, sigma 11,
    10px border). Other resolutions (device_pipeline parse_res) scale
    kernel/sigma/border proportionally and bilinearly upsample the soft
    mask — a bounded boundary-shift deviation, see
    DeviceRestorePipeline.__init__ and tests/test_pipeline.py."""
    res = parse_ids.shape[1]
    s = res / 512.0
    ksize = max(int(round(101 * s)) | 1, 3)
    sigma = 11.0 * s
    thres = max(int(round(10 * s)), 1)
    pm = _pack(_colormap_lookup(parse_ids)[..., None])  # (1,res,res,N)
    pm = gaussian_blur(pm, ksize, sigma)
    pm = gaussian_blur(pm, ksize, sigma)
    pm = pm.at[:, :thres, :].set(0).at[:, -thres:, :].set(0)
    pm = pm.at[:, :, :thres].set(0).at[:, :, -thres:].set(0)
    pm = pm / 255.0
    if face_size != res:
        pm = jax.image.resize(pm, (1, face_size, face_size, n), 'linear')
    return _unpack(pm)


@functools.lru_cache(maxsize=64)
def _build_graph(canvas_hw: Tuple[int, int], n_faces: int,
                 face_size: int, upscale: int, w_edge: int,
                 use_parse: bool, draw_box: bool):
    """One compiled compositor for a (canvas, faces, edge-width) config."""
    hc, wc = canvas_hw
    k_erode = max(int(2 * upscale), 1)
    erosion_radius = max(w_edge * 2, 1)
    blur_size = w_edge * 2 + 1

    def run(canvas, faces, inv_affines, parse_ids, border_masks):
        # canvas: (hc, wc, 3) f32; faces: (N, fs, fs, 3) f32 0-255;
        # inv_affines: (N, 2, 3); parse_ids: (N, 512, 512) int32;
        # border_masks: (N, fs, fs, 1) f32 (zeros unless draw_box)
        # ONE fused multi-channel warp: face RGB (+ shaped parse mask)
        # gather together, and the square coverage mask falls out of the
        # same sample weights — warp cost on TPU is per-point, not
        # per-channel (measured ~3x on this stage)
        src = [faces]
        if use_parse:
            src.append(_shape_parse_masks(parse_ids, face_size, n_faces))
        if draw_box:
            src.append(border_masks)
        src = jnp.concatenate(src, axis=-1) if len(src) > 1 else faces
        warped, inv_mask = warp_affine(src, inv_affines, (hc, wc),
                                       return_coverage=True)
        inv_restored = warped[..., :3]

        packed = _pack(inv_mask)  # masks ride the lane dim: (1,hc,wc,N)
        erosion1 = erode(packed, k_erode)
        pasted = _unpack(erosion1) * inv_restored
        inv_mask_center = erode(erosion1, erosion_radius)
        inv_soft_mask = gaussian_blur(inv_mask_center, blur_size)

        if use_parse:
            inv_parse = _pack(warped[..., 3:4])
            inv_soft_mask = jnp.where(inv_parse < inv_soft_mask,
                                      inv_parse, inv_soft_mask)
        inv_soft_mask = _unpack(inv_soft_mask)

        def body(i, acc):
            return (inv_soft_mask[i] * pasted[i]
                    + (1 - inv_soft_mask[i]) * acc)

        out = jax.lax.fori_loop(0, n_faces, body, canvas)

        if draw_box:
            # green box overlay after all faces (reference
            # face_restoration_helper.py:505-512); green = (0,255,0) in
            # both BGR and RGB so no channel flip is needed
            inv_borders = warped[..., -1:]
            green = jnp.asarray([0.0, 255.0, 0.0], jnp.float32)

            def body_box(i, acc):
                return inv_borders[i] * green + (1 - inv_borders[i]) * acc

            out = jax.lax.fori_loop(0, n_faces, body_box, out)
        return out

    return jax.jit(run)


def paste_faces_xla(upsample_img: np.ndarray,
                    restored_faces: List[np.ndarray],
                    inverse_affines: List[np.ndarray],
                    parse_ids: Optional[np.ndarray],
                    upscale: int, draw_box: bool = False) -> np.ndarray:
    """Host wrapper: buckets shapes, quantizes edge widths, runs the
    compiled compositor, returns uint8 BGR."""
    if not restored_faces:
        return upsample_img.astype(np.uint8)
    h, w = upsample_img.shape[:2]
    hc, wc = _round_up(h, 128), _round_up(w, 128)
    n = len(restored_faces)
    nb = 1 << max(0, (n - 1).bit_length())  # next pow2 bucket
    face_size = restored_faces[0].shape[0]

    faces = np.zeros((nb, face_size, face_size, 3), np.float32)
    affines = np.zeros((nb, 2, 3), np.float32)
    # park padded faces off-canvas so their masks never touch it
    affines[:, 0, 2] = -4 * face_size
    affines[:, 0, 0] = affines[:, 1, 1] = 1.0
    pids = np.zeros((nb, 512, 512), np.int32)
    borders = np.zeros((nb, face_size, face_size, 1), np.float32)
    areas = []
    for i, (f, a) in enumerate(zip(restored_faces, inverse_affines)):
        faces[i] = f[..., ::-1].astype(np.float32)  # BGR->RGB
        affines[i] = a
        det = abs(a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0])
        area = face_size * face_size * det
        areas.append(area)
        if parse_ids is not None:
            pids[i] = parse_ids[i]
        if draw_box:
            # border width from the warped-face area (det approximation of
            # the reference's eroded-mask sum, like w_edge below)
            border = int(1400 / np.sqrt(max(area, 1.0)))
            if border > 0:
                borders[i, :, :] = 1.0
                borders[i, border:face_size - border,
                        border:face_size - border] = 0.0
    # single quantized edge width for the batch (max face governs)
    w_edge = int(max(areas) ** 0.5) // 20
    w_edge = min(max((w_edge + 4) // 8 * 8, 4), 64)

    canvas = np.zeros((hc, wc, 3), np.float32)
    canvas[:h, :w] = upsample_img[..., ::-1].astype(np.float32)

    fn = _build_graph((hc, wc), nb, face_size, int(upscale), w_edge,
                      parse_ids is not None, draw_box)
    out = np.asarray(fn(jnp.asarray(canvas), jnp.asarray(faces),
                        jnp.asarray(affines), jnp.asarray(pids),
                        jnp.asarray(borders)))
    out = np.clip(out[:h, :w], 0, 255).astype(np.uint8)
    return out[..., ::-1]  # RGB->BGR
