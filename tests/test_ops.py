"""Golden tests for vision ops vs cv2 / reference math (SURVEY §7 hard part
#1: cv2-equivalence of geometry)."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from codeformer_tpu.ops.anchors import prior_boxes
from codeformer_tpu.ops.filters import dilate, erode, gaussian_blur
from codeformer_tpu.ops.geometry import (estimate_similarity, invert_affine,
                                         warp_affine)
from codeformer_tpu.ops.nms import decode_boxes, decode_landmarks, nms

# FFHQ 512 5-point template (face_restoration_helper.py:86-87)
FACE_TEMPLATE_512 = np.array([
    [192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
    [201.26117, 371.41043], [313.08905, 371.15118]], np.float32)


def test_warp_affine_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 120, 160, 3)).astype(np.float32)
    theta = 0.3
    m = np.array([[np.cos(theta) * 1.2, -np.sin(theta) * 1.2, 10.0],
                  [np.sin(theta) * 1.2, np.cos(theta) * 1.2, -5.0]],
                 np.float32)
    ref = cv2.warpAffine(img[0], m, (80, 96), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    out = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m)[None],
                                 (96, 80)))[0]
    # interiors must match closely; cv2 uses 5-bit fixed-point interp
    diff = np.abs(out - ref)
    assert np.percentile(diff, 99) < 1.0, np.percentile(diff, 99)
    assert diff.mean() < 0.2


def test_warp_affine_gray_border():
    img = np.full((1, 50, 50, 3), 200.0, np.float32)
    m = np.array([[1.0, 0.0, 40.0], [0.0, 1.0, 40.0]], np.float32)
    out = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m)[None],
                                 (50, 50), border_value=135.0))[0]
    assert abs(out[0, 0, 0] - 135.0) < 1e-4  # border region
    assert abs(out[45, 45, 0] - 200.0) < 1e-4  # warped content


def test_warp_affine_img_idx_exact():
    """img_idx indirection must be bit-identical to warping the
    materialized selection img[img_idx] — for uint8 AND float sources,
    with coverage, including repeated and out-of-order indices."""
    rng = np.random.default_rng(5)
    idx = np.array([2, 0, 2, 1, 1, 2], np.int32)
    ms = []
    for k in range(len(idx)):
        th = 0.1 * k - 0.2
        ms.append([[np.cos(th) * (0.8 + 0.1 * k),
                    -np.sin(th), 5.0 * k - 10],
                   [np.sin(th), np.cos(th) * (0.8 + 0.1 * k), 3.0 * k]])
    ms = np.asarray(ms, np.float32)
    for dtype in (np.uint8, np.float32):
        img = rng.uniform(0, 255, (3, 60, 72, 3)).astype(dtype)
        ref, ref_cov = warp_affine(jnp.asarray(img)[jnp.asarray(idx)],
                                   jnp.asarray(ms), (48, 40),
                                   border_value=135.0,
                                   return_coverage=True)
        out, cov = warp_affine(jnp.asarray(img), jnp.asarray(ms),
                               (48, 40), border_value=135.0,
                               return_coverage=True,
                               img_idx=jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(cov), np.asarray(ref_cov))


def test_estimate_similarity_matches_cv2():
    rng = np.random.default_rng(1)
    src = FACE_TEMPLATE_512 + rng.normal(0, 20, (5, 2)).astype(np.float32)
    m_cv, _ = cv2.estimateAffinePartial2D(src, FACE_TEMPLATE_512,
                                          method=cv2.LMEDS)
    m_ours = estimate_similarity(src, FACE_TEMPLATE_512)
    np.testing.assert_allclose(m_ours, m_cv, rtol=1e-3, atol=1e-3)


def test_invert_affine_roundtrip():
    m = estimate_similarity(FACE_TEMPLATE_512 * 0.7 + 3.0,
                            FACE_TEMPLATE_512)
    inv = invert_affine(m, upscale=1.0)
    ref = cv2.invertAffineTransform(m)
    np.testing.assert_allclose(inv, ref, rtol=1e-6, atol=1e-6)


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    ref = cv2.GaussianBlur(img[0], (11, 11), 0)
    out = np.asarray(gaussian_blur(jnp.asarray(img), 11))[0]
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-2)


def test_erode_matches_cv2():
    rng = np.random.default_rng(3)
    mask = (rng.uniform(0, 1, (1, 40, 40, 1)) > 0.5).astype(np.float32)
    kernel = np.ones((5, 5), np.uint8)
    ref = cv2.erode(mask[0, ..., 0], kernel)
    out = np.asarray(erode(jnp.asarray(mask), 5))[0, ..., 0]
    np.testing.assert_array_equal(out, ref)


def test_erode_dilate_van_herk_matches_cv2():
    """Wide windows take the O(log k) van Herk sliding-min path — it
    must stay EXACTLY equal to cv2 for every parity (even/odd k) and
    for non-k-aligned extents (compositor uses k up to 128 on 32-granular
    ROI windows)."""
    rng = np.random.default_rng(5)
    for k in (16, 17, 33, 100, 128):
        for hw in (40, 129, 150):
            mask = rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
            kernel = np.ones((k, k), np.uint8)
            out = np.asarray(erode(jnp.asarray(mask), k))
            out_d = np.asarray(dilate(jnp.asarray(mask), k))
            for b in range(2):
                for c in range(3):
                    ref = cv2.erode(mask[b, ..., c], kernel)
                    np.testing.assert_array_equal(
                        out[b, ..., c], ref, err_msg=f'erode k={k} hw={hw}')
                    ref_d = cv2.dilate(mask[b, ..., c], kernel)
                    np.testing.assert_array_equal(
                        out_d[b, ..., c], ref_d,
                        err_msg=f'dilate k={k} hw={hw}')


def test_nms_matches_numpy_greedy():
    rng = np.random.default_rng(4)
    n = 64
    centers = rng.uniform(20, 80, (n, 2))
    sizes = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    def ref_nms(boxes, scores, thr):
        order = scores.argsort()[::-1]
        keep = []
        while order.size > 0:
            i = order[0]
            keep.append(i)
            xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
            yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
            xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
            yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
            w = np.maximum(0.0, xx2 - xx1)
            h = np.maximum(0.0, yy2 - yy1)
            inter = w * h
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            areas = ((boxes[order[1:], 2] - boxes[order[1:], 0])
                     * (boxes[order[1:], 3] - boxes[order[1:], 1]))
            iou = inter / (area_i + areas - inter)
            order = order[1:][iou <= thr]
        return keep

    expected = ref_nms(boxes, scores, 0.4)
    keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, n)
    got = list(np.asarray(keep)[np.asarray(valid)])
    assert got == expected


def test_prior_boxes_match_reference():
    import sys
    sys.path.insert(0, '/root/repo/tests')
    from torch_ref import load_retinaface_utils
    ru = load_retinaface_utils()
    cfg = {'min_sizes': [[16, 32], [64, 128], [256, 512]],
           'steps': [8, 16, 32], 'clip': False}
    ref = ru.PriorBox(cfg, image_size=(640, 640)).forward().numpy()
    ours = prior_boxes(640, 640)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    # non-square, non-divisible size too
    ref2 = ru.PriorBox(cfg, image_size=(360, 640)).forward().numpy()
    np.testing.assert_allclose(prior_boxes(360, 640), ref2, rtol=1e-6,
                               atol=1e-7)


def test_decode_matches_reference():
    import sys
    sys.path.insert(0, '/root/repo/tests')
    import torch
    from torch_ref import load_retinaface_utils
    ru = load_retinaface_utils()
    rng = np.random.default_rng(5)
    priors = prior_boxes(128, 128)
    loc = rng.normal(0, 0.5, (priors.shape[0], 4)).astype(np.float32)
    landm = rng.normal(0, 0.5, (priors.shape[0], 10)).astype(np.float32)
    ref_boxes = ru.decode(torch.from_numpy(loc), torch.from_numpy(priors),
                          [0.1, 0.2]).numpy()
    ref_landms = ru.decode_landm(torch.from_numpy(landm),
                                 torch.from_numpy(priors),
                                 [0.1, 0.2]).numpy()
    np.testing.assert_allclose(
        np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(priors))),
        ref_boxes, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(decode_landmarks(jnp.asarray(landm),
                                    jnp.asarray(priors))),
        ref_landms, rtol=1e-4, atol=1e-5)
