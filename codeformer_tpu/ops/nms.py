"""Static-shape NMS and box/landmark decoding for the detection stack.

TPU-first rewrite of the reference's detector post-processing
(facelib/detection/retinaface/retinaface_utils.py:253-421): everything runs
on fixed-size padded arrays with masking — no dynamic shapes under jit.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def decode_boxes(loc: jax.Array, priors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """SSD-style box decoding (retinaface_utils.py:253-278).
    loc, priors: (..., N, 4) [cx, cy, w, h] -> (..., N, 4) [x1, y1, x2, y2].
    """
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    sizes = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    tl = centers - sizes / 2
    br = centers + sizes / 2
    return jnp.concatenate([tl, br], axis=-1)


def decode_landmarks(pre: jax.Array, priors: jax.Array,
                     variances=(0.1, 0.2)) -> jax.Array:
    """Decode 5-point landmarks (retinaface_utils.py:281-297).
    pre: (..., N, 10) -> (..., N, 10) absolute (normalized) coords."""
    p = pre.reshape(*pre.shape[:-1], 5, 2)
    out = priors[..., None, :2] + p * variances[0] * priors[..., None, 2:]
    return out.reshape(*pre.shape)


def iou_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU of [x1,y1,x2,y2] boxes: (A, 4) x (B, 4) -> (A, B)."""
    tl = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    br = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0])
              * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0])
              * (boxes_b[:, 3] - boxes_b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-12)


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
        max_out: int) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS over a fixed number of candidates.

    boxes: (N, 4), scores: (N,) — invalid candidates must carry score -inf.
    Returns (keep_indices (max_out,), valid_mask (max_out,)). Indices of
    dropped slots are 0 with valid=False. O(max_out * N) with static shapes
    — maps to a fori_loop of vectorized IoU rows, TPU-friendly for the
    N <= few-thousand candidates a 640px detector produces.
    """
    n = boxes.shape[0]

    def body(i, state):
        keep, valid, live_scores = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > -jnp.inf
        keep = keep.at[i].set(jnp.where(ok, best, 0))
        valid = valid.at[i].set(ok)
        ious = iou_matrix(boxes[best][None], boxes)[0]
        suppress = (ious > iou_threshold) | \
            (jnp.arange(n) == best)
        live_scores = jnp.where(ok & suppress, -jnp.inf, live_scores)
        return keep, valid, live_scores

    keep0 = jnp.zeros((max_out,), jnp.int32)
    valid0 = jnp.zeros((max_out,), bool)
    keep, valid, _ = jax.lax.fori_loop(
        0, max_out, body, (keep0, valid0, scores.astype(jnp.float32)))
    return keep, valid
