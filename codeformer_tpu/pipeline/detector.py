"""Face detection service: jitted RetinaFace graph + static-shape
postprocessing, bucketed by input size.

TPU-first redesign of RetinaFace.detect_faces (retinaface.py:194-239):
decode/filter/top-k/NMS all run on device with fixed shapes; only a
(MAX_FACES, 15) array + valid mask cross back to the host. Input images are
zero-padded up to (64-multiple, 64-multiple) buckets so each bucket compiles
once (persistently cached).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codeformer_tpu.models import RetinaFace
from codeformer_tpu.ops.anchors import prior_boxes
from codeformer_tpu.ops.nms import decode_boxes, decode_landmarks, nms
from codeformer_tpu.utils.checkpoint import init_params_fast, load_checkpoint
from codeformer_tpu.utils.misc import setup_jax

# BGR means subtracted before the backbone (retinaface.py:88)
_MEANS = (104.0, 117.0, 123.0)

WEIGHTS = {
    'retinaface_resnet50': 'weights/facelib/detection_Resnet50_Final.pth',
    'retinaface_mobile0.25':
        'weights/facelib/detection_mobilenet0.25_Final.pth',
    'YOLOv5l': 'weights/facelib/yolov5l-face.pth',
    'YOLOv5n': 'weights/facelib/yolov5n-face.pth',
}


def init_detection_model(model_name: str, checkpoint=None,
                         allow_random: bool = False,
                         dtype=jnp.float32):
    """Factory mirroring facelib/detection/__init__.py:14-22.

    `dtype`: backbone compute precision. float32 matches the reference
    bit-for-bit; bfloat16 roughly halves detection time on TPU with
    sub-pixel box/landmark drift (decode/NMS stay f32 either way)."""
    if model_name.startswith('retinaface'):
        return FaceDetector(model_name, checkpoint=checkpoint,
                            allow_random=allow_random, dtype=dtype)
    if model_name.startswith('YOLOv5'):
        return YoloFaceDetector(model_name, checkpoint=checkpoint,
                                allow_random=allow_random, dtype=dtype)
    raise NotImplementedError(f'{model_name} is not implemented.')


class FaceDetector:
    """Host-facing detector. detect_faces(img_bgr) -> (n, 15) float32
    [x1, y1, x2, y2, score, lmk_x1, lmk_y1, ..., lmk_x5, lmk_y5] — the
    reference's output layout."""

    def __init__(self, model_name: str = 'retinaface_resnet50',
                 checkpoint: Optional[str] = None,
                 allow_random: bool = False,
                 max_faces: int = 32, pre_nms_topk: int = 1024,
                 dtype=jnp.float32):
        setup_jax()
        network = ('resnet50' if 'resnet50' in model_name
                   else 'mobile0.25')
        self.model = RetinaFace(network_name=network, dtype=dtype)
        self.max_faces = max_faces
        self.pre_nms_topk = pre_nms_topk

        import os
        ckpt = checkpoint or WEIGHTS.get(model_name)
        if ckpt and os.path.exists(ckpt):
            self.variables = load_checkpoint(ckpt)
        elif allow_random:
            self.variables = init_params_fast(
                self.model, jnp.zeros((1, 64, 64, 3)))
        else:
            raise FileNotFoundError(
                f'detector weights not found at {ckpt}; place the released '
                f'.pth there or pass checkpoint=/allow_random=True')
        self.variables = jax.device_put(self.variables)
        self._jitted = {}

    def _detect_body(self, hw: Tuple[int, int], max_faces: int):
        """Per-image decode+filter+NMS body shared by all graph variants.
        Takes a padded float32 BGR image of exactly `hw`."""
        h, w = hw
        priors = jnp.asarray(prior_boxes(h, w))
        scale_b = jnp.asarray([w, h, w, h], jnp.float32)
        scale_l = jnp.asarray([w, h] * 5, jnp.float32)

        def run_one(variables, img, conf_threshold, nms_threshold):
            x = img - jnp.asarray(_MEANS)
            loc, conf, landm = self.model.apply(variables, x[None])
            boxes = decode_boxes(loc[0], priors) * scale_b
            landms = decode_landmarks(landm[0], priors) * scale_l
            scores = conf[0, :, 1]
            scores = jnp.where(scores > conf_threshold, scores, -jnp.inf)
            # top-k prefilter bounds the NMS cost
            k = min(self.pre_nms_topk, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            top_boxes = boxes[top_idx]
            top_landms = landms[top_idx]
            keep, valid = nms(top_boxes, top_scores, nms_threshold,
                              max_faces)
            out = jnp.concatenate([
                top_boxes[keep], top_scores[keep][:, None],
                top_landms[keep]], axis=1)
            return out, valid

        return run_one

    def _graph(self, hw: Tuple[int, int], max_faces: int):
        key = (hw, max_faces)
        if key in self._jitted:
            return self._jitted[key]
        run_one = self._detect_body(hw, max_faces)

        def run(variables, img, conf_threshold, nms_threshold):
            return run_one(variables, img.astype(jnp.float32),
                           conf_threshold, nms_threshold)

        fn = jax.jit(run)
        self._jitted[key] = fn
        return fn

    @staticmethod
    def _bucket(size: int, step: int = 64) -> int:
        return int(math.ceil(size / step) * step)

    # largest max_faces bucket tried before warning (the reference has no
    # cap at all — retinaface.py:194-239; beyond this we'd rather warn
    # than compile ever-larger NMS graphs)
    MAX_FACES_CEILING = 512

    def detect_faces(self, img_bgr: np.ndarray,
                     conf_threshold: float = 0.8,
                     nms_threshold: float = 0.4) -> np.ndarray:
        h, w = img_bgr.shape[:2]
        hb, wb = self._bucket(h), self._bucket(w)
        # keep uint8 inputs uint8: 4x less host->device traffic (the
        # graph casts to f32 on device)
        dt = np.uint8 if img_bgr.dtype == np.uint8 else np.float32
        padded = np.zeros((hb, wb, 3), dt)
        padded[:h, :w] = img_bgr
        # escalate to a larger keep-bucket when NMS saturates, so crowd
        # photos never silently lose detections
        max_f = self.max_faces
        while True:
            fn = self._graph((hb, wb), max_f)
            out, valid = fn(self.variables, jnp.asarray(padded),
                            jnp.float32(conf_threshold),
                            jnp.float32(nms_threshold))
            valid = np.asarray(valid)
            if valid.all() and max_f < self.MAX_FACES_CEILING:
                max_f = min(max_f * 4, self.MAX_FACES_CEILING)
                continue
            if valid.all():
                import warnings
                warnings.warn(
                    f'detection kept {max_f} faces and may still be '
                    f'truncated (MAX_FACES_CEILING={self.MAX_FACES_CEILING})')
            break
        out = np.asarray(out)[valid]
        out = out[np.isfinite(out).all(axis=1)]
        if out.size == 0:
            return np.zeros((0, 15), np.float32)
        # drop detections centered in the padding region
        cx = (out[:, 0] + out[:, 2]) / 2
        cy = (out[:, 1] + out[:, 3]) / 2
        out = out[(cx < w) & (cy < h)]
        return out

    def align_multi(self, img_bgr: np.ndarray, conf_threshold: float = 0.8,
                    limit: Optional[int] = None):
        """Detect + warp each face to the canonical 112x112 crop
        (reference retinaface.py:241-264 align_multi)."""
        from .align_trans import get_reference_facial_points, \
            warp_and_crop_face
        det = self.detect_faces(img_bgr, conf_threshold)
        if limit:
            det = det[:limit]
        reference = get_reference_facial_points(default_square=True)
        faces = []
        for row in det:
            landmark = row[5:15].reshape(5, 2)
            faces.append(warp_and_crop_face(
                img_bgr, landmark, reference, crop_size=(112, 112)))
        return det[:, :5], faces

    def batched_detect_faces(self, frames, conf_threshold: float = 0.8,
                             nms_threshold: float = 0.4):
        """Detect over a batch of SAME-SIZE frames (the video path,
        reference retinaface.py:310-372) in one jit call per bucket.

        Returns (list of (n_i, 15) arrays, one per frame)."""
        frames = np.asarray(frames)
        b, h, w = frames.shape[:3]
        hb, wb = self._bucket(h), self._bucket(w)
        dt = np.uint8 if frames.dtype == np.uint8 else np.float32
        padded = np.zeros((b, hb, wb, 3), dt)
        padded[:, :h, :w] = frames
        max_f = self.max_faces
        while True:
            fn = self._batch_graph((hb, wb), b, max_f)
            outs, valids = fn(self.variables, jnp.asarray(padded),
                              jnp.float32(conf_threshold),
                              jnp.float32(nms_threshold))
            valids = np.asarray(valids)
            # any saturated frame may be truncated -> larger keep-bucket
            if valids.all(axis=1).any() and max_f < self.MAX_FACES_CEILING:
                max_f = min(max_f * 4, self.MAX_FACES_CEILING)
                continue
            break
        outs = np.asarray(outs)
        results = []
        for i in range(b):
            det = outs[i][valids[i]]
            det = det[np.isfinite(det).all(axis=1)]
            if det.size:
                cx = (det[:, 0] + det[:, 2]) / 2
                cy = (det[:, 1] + det[:, 3]) / 2
                det = det[(cx < w) & (cy < h)]
            results.append(det.reshape(-1, 15))
        return results

    def _batch_graph(self, hw, batch, max_faces=None):
        max_faces = max_faces or self.max_faces
        key = (hw, batch, max_faces)
        if key in self._jitted:
            return self._jitted[key]
        run_one = self._detect_body(hw, max_faces)

        def run(variables, imgs, conf_threshold, nms_threshold):
            return jax.vmap(
                lambda im: run_one(variables, im.astype(jnp.float32),
                                   conf_threshold,
                                   nms_threshold))(imgs)

        fn = jax.jit(run)
        self._jitted[key] = fn
        return fn

    def _device_graph(self, in_hw, det_hw, batch, max_faces):
        """Device-resident front end: uint8 frames resize (bilinear) ->
        pad to the 64-bucket -> detect, all in one jit. No bulk host
        transfer — only the (B, max_faces, 15) detections come back."""
        key = ('device', in_hw, det_hw, batch, max_faces)
        if key in self._jitted:
            return self._jitted[key]
        dh, dw = det_hw
        hb, wb = self._bucket(dh), self._bucket(dw)
        run_one = self._detect_body((hb, wb), max_faces)

        def run(variables, frames, conf_threshold, nms_threshold):
            x = frames.astype(jnp.float32)
            x = jax.image.resize(x, (batch, dh, dw, 3), 'linear')
            x = jnp.pad(x, ((0, 0), (0, hb - dh), (0, wb - dw), (0, 0)))
            return jax.vmap(
                lambda im: run_one(variables, im, conf_threshold,
                                   nms_threshold))(x)

        fn = jax.jit(run)
        self._jitted[key] = fn
        return fn

    def batched_detect_device_start(self, frames_dev, det_hw,
                                    conf_threshold: float = 0.8,
                                    nms_threshold: float = 0.4):
        """Dispatch the device detection graph WITHOUT syncing: returns
        device arrays (outs, valids) as async futures. Pair with
        batched_detect_device_finish — the split lets a pipelined caller
        enqueue the next chunk's detection before blocking on this one
        (the host round trip then overlaps device compute)."""
        b, h, w = frames_dev.shape[:3]
        fn = self._device_graph((h, w), tuple(det_hw), b, self.max_faces)
        return fn(self.variables, frames_dev,
                  jnp.float32(conf_threshold),
                  jnp.float32(nms_threshold))

    def batched_detect_device_finish(self, frames_dev, det_hw, pending,
                                     conf_threshold: float = 0.8,
                                     nms_threshold: float = 0.4):
        """Sync a batched_detect_device_start dispatch, escalating to a
        larger keep-bucket (synchronously — rare) if any frame's NMS
        saturated. Returns host (B, max_faces, 15) + (B, max_faces)."""
        b, h, w = frames_dev.shape[:3]
        outs, valids = pending
        valids = np.asarray(valids)
        max_f = self.max_faces
        while valids.all(axis=1).any() and max_f < self.MAX_FACES_CEILING:
            max_f = min(max_f * 4, self.MAX_FACES_CEILING)
            fn = self._device_graph((h, w), tuple(det_hw), b, max_f)
            outs, valids = fn(self.variables, frames_dev,
                              jnp.float32(conf_threshold),
                              jnp.float32(nms_threshold))
            valids = np.asarray(valids)
        outs = np.array(outs)  # writable host copy
        outs[~valids] = 0.0
        bad = ~np.isfinite(outs).all(axis=2)
        valids = valids & ~bad
        return outs, valids

    def batched_detect_device(self, frames_dev, det_hw,
                              conf_threshold: float = 0.8,
                              nms_threshold: float = 0.4):
        """Detect over a device-resident uint8 BGR frame batch
        (B, H, W, 3), resized on device to det_hw before the backbone.
        Returns host arrays (B, max_faces, 15) in det_hw coordinates and
        a (B, max_faces) validity mask."""
        pending = self.batched_detect_device_start(
            frames_dev, det_hw, conf_threshold, nms_threshold)
        return self.batched_detect_device_finish(
            frames_dev, det_hw, pending, conf_threshold, nms_threshold)


class YoloFaceDetector:
    """YOLOv5-face service with the same detect_faces() -> (n, 15) surface
    as FaceDetector (the reference YoloDetector returns
    [x1,y1,x2,y2,score,lmk*10], face_detector.py:105-138)."""

    def __init__(self, model_name: str = 'YOLOv5n',
                 checkpoint: Optional[str] = None,
                 allow_random: bool = False, max_faces: int = 32,
                 pre_nms_topk: int = 1024, dtype=jnp.float32):
        from codeformer_tpu.models.yolov5face import YoloFace
        setup_jax()
        variant = 'yolov5l' if model_name.endswith('l') else 'yolov5n'
        self.model = YoloFace(variant=variant, dtype=dtype)
        self.max_faces = max_faces
        self.pre_nms_topk = pre_nms_topk

        import os
        ckpt = checkpoint or WEIGHTS.get(model_name)
        if ckpt and os.path.exists(ckpt):
            self.variables = load_checkpoint(ckpt)
        elif allow_random:
            self.variables = init_params_fast(
                self.model, jnp.zeros((1, 64, 64, 3)))
        else:
            raise FileNotFoundError(
                f'detector weights not found at {ckpt}')
        self.variables = jax.device_put(self.variables)
        self._jitted = {}

    def _graph(self, hw, max_faces: int):
        key = (hw, max_faces)
        if key in self._jitted:
            return self._jitted[key]

        def run(variables, img01, conf_threshold, nms_threshold):
            pred = self.model.apply(variables, img01[None])[0]  # (N, 16)
            xy, wh = pred[:, 0:2], pred[:, 2:4]
            boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
            scores = pred[:, 4] * pred[:, 15]  # obj * cls conf
            scores = jnp.where(scores > conf_threshold, scores, -jnp.inf)
            k = min(self.pre_nms_topk, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            top_boxes = boxes[top_idx]
            top_landms = pred[top_idx, 5:15]
            keep, valid = nms(top_boxes, top_scores, nms_threshold,
                              max_faces)
            out = jnp.concatenate([
                top_boxes[keep], top_scores[keep][:, None],
                top_landms[keep]], axis=1)
            return out, valid

        fn = jax.jit(run)
        self._jitted[key] = fn
        return fn

    def detect_faces(self, img_bgr: np.ndarray,
                     conf_threshold: float = 0.8,
                     nms_threshold: float = 0.4) -> np.ndarray:
        h, w = img_bgr.shape[:2]
        hb = FaceDetector._bucket(h, 32)
        wb = FaceDetector._bucket(w, 32)
        padded = np.full((hb, wb, 3), 114 / 255.0, np.float32)
        padded[:h, :w] = img_bgr[..., ::-1].astype(np.float32) / 255.0
        max_f = self.max_faces
        while True:
            fn = self._graph((hb, wb), max_f)
            out, valid = fn(self.variables, jnp.asarray(padded),
                            jnp.float32(conf_threshold),
                            jnp.float32(nms_threshold))
            valid = np.asarray(valid)
            if valid.all() and max_f < FaceDetector.MAX_FACES_CEILING:
                max_f = min(max_f * 4, FaceDetector.MAX_FACES_CEILING)
                continue
            break
        out = np.asarray(out)[valid]
        out = out[np.isfinite(out).all(axis=1)]
        if out.size == 0:
            return np.zeros((0, 15), np.float32)
        cx = (out[:, 0] + out[:, 2]) / 2
        cy = (out[:, 1] + out[:, 3]) / 2
        return out[(cx < w) & (cy < h)]
