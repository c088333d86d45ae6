"""Fused device-resident video/folder pipeline: frames in, restored frames
out, with every bulk tensor staying in HBM between stages.

The reference pipeline (inference_codeformer.py:160-272 +
face_restoration_helper.py) round-trips every intermediate (detection
input, cropped faces, restored faces, parse maps, composited canvas)
through host memory. On TPU the host link is the scarcest resource, so
this pipeline keeps frames on device end to end:

    upload frames (uint8, once)
      -> detect      (device: resize + RetinaFace + NMS; only the tiny
                      (B, max_faces, 15) landmark block crosses to host)
      -> align       (host solves 5-point similarity transforms — bytes;
                      device does the gather + bilinear warp to 512x512)
      -> restore     (device: CodeFormer, bucketed batch)
      -> parse       (device: ParseNet)
      -> composite   (device: batched inverse warps + erosion + soft-edge
                      + parse-guided blend over an upscaled canvas)
      -> fetch final frames (uint8, once — or keep on device)

Host<->device traffic per 512x683 frame: ~1MB up + ~4MB down (final
canvas) + <1KB of landmarks, instead of ~12MB of intermediates.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from codeformer_tpu.ops.filters import erode, gaussian_blur
from codeformer_tpu.ops.geometry import (estimate_similarity, invert_affine,
                                         warp_affine)
from .compositor_xla import MASK_COLORMAP

# cv2 constant-border gray used by align_warp_face (BGR)
_BORDER_BGR = (135.0, 133.0, 132.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class DeviceRestorePipeline:
    """Frames -> restored frames with device-resident intermediates.

    Borrows the detector / parser / template from a FaceRestoreHelper and
    the CodeFormer graph from a CodeFormerRestorer, so weights load once
    and are shared with the classic per-stage path.
    """

    #: rounds statically unrolled in the ROI composite (one warp+filter
    #: group of C windows per round). Beyond this, fall back to the
    #: single-group fori path (compile-size guard; >8 faces/frame).
    MAX_UNROLL_ROUNDS = 8

    def __init__(self, restorer, face_helper, upscale: int = 2,
                 frame_chunk: int = 16, detect_resize: int = 640,
                 conf_threshold: float = 0.8,
                 eye_dist_threshold: Optional[float] = 5.0,
                 only_center_face: bool = False, w: float = 0.5,
                 parse_res: int = 256):
        from .detector import FaceDetector
        if not isinstance(face_helper.face_detector, FaceDetector):
            raise NotImplementedError(
                'DeviceRestorePipeline requires a RetinaFace detector '
                '(YOLO keeps its own host preprocessing)')
        self.restorer = restorer
        self.helper = face_helper
        self.detector = face_helper.face_detector
        self.upscale = int(upscale)
        self.frame_chunk = frame_chunk
        self.detect_resize = detect_resize
        self.conf_threshold = conf_threshold
        self.eye_dist_threshold = eye_dist_threshold
        self.only_center_face = only_center_face
        self.w = w
        self.use_parse = face_helper.use_parse
        # ParseNet evaluation resolution for the blend mask. 512 is the
        # reference semantics (face_restoration_helper.py:459-470 runs
        # the parser on the full 512^2 restored face). 256 (default)
        # halves it: the parser + colormap + double-Gaussian shaping run
        # at 256^2 (kernel/sigma/border scaled 101/11/10 -> 51/5.5/5)
        # and the soft mask upsamples bilinearly to 512. The mask only
        # clips an already-blurred soft blend (min(parse, square),
        # compositor_xla.py), so the operator-level deviation is a
        # boundary shift of ~2px at 512 scale under a >=49-tap blur —
        # the same order as the documented edge-width quantization.
        # ParseNet itself is fully convolutional; evaluating at 256
        # shrinks its receptive-field-to-face ratio, which with released
        # weights may move class boundaries slightly (unverifiable in
        # this zero-egress environment — see docs/parity_runbook.md).
        # Set parse_res=512 (CLI: --parse_res 512) for strict parity.
        self.parse_res = int(parse_res) if face_helper.use_parse else 512
        self._graphs = {}

    # ------------------------------------------------------------------
    # device graphs (one compile per static config, persistently cached)
    # ------------------------------------------------------------------
    def _warp_body(self, in_hw: Tuple[int, int], m: int, face: int):
        border = jnp.asarray(_BORDER_BGR[::-1], jnp.float32)  # RGB

        def run(frames, frame_idx, affines):
            # frames (C,H,W,3) uint8 BGR; frame_idx (M,); affines
            # (M,2,3) frame->template. Returns (M,face,face,3) uint8
            # RGB crops (the restorer's input layout). Frames stay
            # uint8 through the warp gather (bytes move, math is f32
            # — exact and ~2x faster, ops/geometry._bilinear_sample),
            # warped in BGR with the frame index folded into the gather
            # (img_idx: materializing frames[frame_idx] duplicates the
            # corner-stack bytes per face); RGB flip happens on the
            # small face crops.
            faces = warp_affine(frames, affines, (face, face),
                                border_value=border[::-1],
                                img_idx=frame_idx)[..., ::-1]
            return jnp.clip(jnp.round(faces), 0, 255).astype(jnp.uint8)

        return run

    def _warp_graph(self, in_hw: Tuple[int, int], m: int, face: int):
        key = ('warp', in_hw, m, face)
        if key not in self._graphs:
            self._graphs[key] = jax.jit(self._warp_body(in_hw, m, face))
        return self._graphs[key]

    def _parse_body(self, m: int):
        model = self.helper._parse_model
        res = self.parse_res

        def run(variables, faces_rgb_u8):
            x = faces_rgb_u8.astype(jnp.float32) / 127.5 - 1.0
            if res != x.shape[1]:
                x = jax.image.resize(x, (m, res, res, 3), 'linear')
            mask, _ = model.apply(variables, x)
            return jnp.argmax(mask, axis=-1).astype(jnp.int32)

        return run

    def _parse_graph(self, m: int):
        key = ('parse', m, self.parse_res)
        if key not in self._graphs:
            self._graphs[key] = jax.jit(self._parse_body(m))
        return self._graphs[key]

    def _composite_body(self, in_hw: Tuple[int, int], c: int, f: int,
                        face: int, w_edge: int, use_parse: bool,
                        roi: int = 0):
        """roi > 0: each face warps/filters into a (roi, roi) window and
        blends back with dynamic slices — gather points scale with the
        FACE extent instead of the canvas (the warp is the composite's
        dominant cost). roi == 0: full-canvas path (fallback for faces
        whose window would not fit the canvas)."""
        h, w = in_hw
        up = self.upscale
        h_up, w_up = h * up, w * up
        hc, wc = _round_up(h_up, 128), _round_up(w_up, 128)
        k_erode = max(int(2 * up), 1)
        erosion_radius = max(w_edge * 2, 1)
        blur_size = w_edge * 2 + 1
        out_hw = (roi, roi) if roi else (hc, wc)

        unroll = 0 < f <= self.MAX_UNROLL_ROUNDS

        def run(frames, restored_rgb, face_map, inv_affines, roi_pos,
                pids):
            # frames (C,H,W,3) u8 BGR; restored_rgb (M,face,face,3) u8;
            # face_map (C*F,) indices into M; inv_affines (C*F,2,3) in
            # window-local coords; roi_pos (C*F,3) = (frame, y0, x0);
            # pids (M,pr,pr) int32 (pr = parse_res)
            from .compositor_xla import _pack, _shape_parse_masks, _unpack
            canv = jax.image.resize(frames.astype(jnp.float32),
                                    (c, h_up, w_up, 3), 'linear')
            canv = jnp.pad(canv, ((0, 0), (0, hc - h_up),
                                  (0, wc - w_up), (0, 0)))
            # fused multi-channel warp + free coverage mask + lane-packed
            # mask filtering (see compositor_xla._build_graph). The warp
            # source stays uint8 so the gather moves bytes (exact for
            # the u8 faces; the parse mask is quantized to 1/255 — a
            # <=0.5/255 blend-weight deviation, well under the edge-
            # width quantization already documented in compositor_xla).
            # The cf->M slot indirection rides the gather via img_idx
            # (never materializes restored_rgb[face_map]); faces warp in
            # RGB and flip to BGR on the warped windows.
            if use_parse:
                m = pids.shape[0]
                pm = _shape_parse_masks(pids, face, m)
                pm_u8 = jnp.clip(jnp.round(pm * 255.0), 0,
                                 255).astype(jnp.uint8)
                src = jnp.concatenate([restored_rgb, pm_u8], axis=-1)
            else:
                src = restored_rgb

            def paste_pieces(sel):
                """Warp + filter the (selected) window slots: returns
                (soft blend weights, eroded pasted faces), each
                (len(sel) or C*F, out_h, out_w, ...).

                sel selects ONE slot per frame (a blend round). The
                round's C source faces are materialized (a cheap
                C*face^2 u8 copy) so the warp's corner stack covers C
                faces, not all M: the stack is what crosses the ~70MB
                cliff where XLA's gather strategy turns super-linear
                (docs/roofline.md round 5 — slot-only grouping left the
                M-face stack shared across rounds and bought ~nothing).
                sel=None (single-group paths) keeps the img_idx gather
                over the full M-face source."""
                if sel is None:
                    ia, fm, s = inv_affines, face_map, src
                else:
                    ia, fm, s = inv_affines[sel], None, src[face_map[sel]]
                warped, inv_mask = warp_affine(s, ia, out_hw,
                                               return_coverage=True,
                                               img_idx=fm)
                inv_restored = warped[..., 2::-1]  # RGB -> BGR
                packed = _pack(inv_mask)
                erosion1 = erode(packed, k_erode)
                pasted = _unpack(erosion1) * inv_restored
                inv_mask_center = erode(erosion1, erosion_radius)
                inv_soft_mask = gaussian_blur(inv_mask_center, blur_size)
                if use_parse:
                    inv_parse = _pack(warped[..., 3:4] / 255.0)
                    inv_soft_mask = jnp.where(inv_parse < inv_soft_mask,
                                              inv_parse, inv_soft_mask)
                return _unpack(inv_soft_mask), pasted

            if roi:
                # Window blends with the reference's per-face overwrite
                # order, but batched: slot s = i*f + k means round k
                # touches ONE window per frame, so each round is a
                # vmapped (per-frame) dynamic-slice blend and only the
                # f rounds are sequential — c*f serial window updates
                # collapse to f (64 -> 4 at 4 faces/frame). Within a
                # frame the k-order (later faces overwrite) is exactly
                # preserved across rounds; dummy slots blend with
                # soft==0 coverage (a no-op) wherever they land.
                def blend_one(frame, y0, x0, sft, pst):
                    patch = jax.lax.dynamic_slice(
                        frame, (y0, x0, 0), (roi, roi, 3))
                    return jax.lax.dynamic_update_slice(
                        frame, sft * pst + (1 - sft) * patch,
                        (y0, x0, 0))

                if unroll:
                    # statically unrolled rounds, each warping/filtering
                    # its OWN group of C windows: the gather stays below
                    # the ~70MB corner-stack cliff where XLA's strategy
                    # turns super-linear (one 64-slot gather measured
                    # 10.6x the 16-slot cost at 4 faces/frame —
                    # docs/roofline.md round 5). Identical math to the
                    # single big group: slots are independent until the
                    # blend, and the blend order is the same.
                    out = canv
                    for k in range(f):
                        idxs = np.arange(c, dtype=np.int32) * f + k
                        soft_k, pasted_k = paste_pieces(idxs)
                        out = jax.vmap(blend_one)(
                            out, roi_pos[idxs, 1], roi_pos[idxs, 2],
                            soft_k, pasted_k)
                else:
                    soft, pasted = paste_pieces(None)

                    def round_body(k, acc):
                        idxs = jnp.arange(c) * f + k
                        return jax.vmap(blend_one)(
                            acc, roi_pos[idxs, 1], roi_pos[idxs, 2],
                            soft[idxs], pasted[idxs])

                    out = jax.lax.fori_loop(0, f, round_body, canv)
            else:
                soft, pasted = paste_pieces(None)
                pasted = pasted.reshape(c, f, hc, wc, 3)
                soft = soft.reshape(c, f, hc, wc, 1)

                def body(i, acc):
                    return (soft[:, i] * pasted[:, i]
                            + (1 - soft[:, i]) * acc)

                out = jax.lax.fori_loop(0, f, body, canv)
            out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
            return out[:, :h_up, :w_up]

        return run

    def _composite_graph(self, in_hw: Tuple[int, int], c: int, f: int,
                         face: int, w_edge: int, use_parse: bool,
                         roi: int = 0):
        key = ('comp', in_hw, c, f, face, w_edge, use_parse, roi)
        if key not in self._graphs:
            self._graphs[key] = jax.jit(self._composite_body(
                in_hw, c, f, face, w_edge, use_parse, roi))
        return self._graphs[key]

    def _merged_graph(self, in_hw: Tuple[int, int], c: int, m: int,
                      fpf: int, face: int, w_edge: int, use_parse: bool,
                      roi: int):
        """ONE jit for warp -> restore -> parse -> composite. The
        per-call dispatch cost (a ~23 ms round trip on the axon tunnel;
        queue/launch overhead on real hosts) is paid once per chunk
        instead of four times, and XLA fuses across the old stage
        boundaries. Detection stays separate — its results feed the
        host-side affine solves between the two calls."""
        key = ('merged', in_hw, c, m, fpf, face, w_edge, use_parse,
               self.parse_res, roi)
        if key in self._graphs:
            return self._graphs[key]
        warp_run = self._warp_body(in_hw, m, face)
        parse_run = self._parse_body(m) if use_parse else None
        comp_run = self._composite_body(in_hw, c, fpf, face, w_edge,
                                        use_parse, roi)
        fwd_core = self.restorer.fwd_core
        enable_fuse = self.w > 0

        def run(frames, frame_idx, affines, rvars, w, pvars, face_map,
                inv_affines, roi_pos):
            faces_rgb = warp_run(frames, frame_idx, affines)
            restored = fwd_core(rvars, faces_rgb, w, True, enable_fuse)
            if use_parse:
                pids = parse_run(pvars, restored)
            else:
                pids = jnp.zeros((m, 1, 1), jnp.int32)
            out = comp_run(frames, restored, face_map, inv_affines,
                           roi_pos, pids)
            return out, faces_rgb, restored

        fn = jax.jit(run)
        self._graphs[key] = fn
        return fn

    # ------------------------------------------------------------------
    # host-side orchestration
    # ------------------------------------------------------------------
    def _landmarks_from_dets(self, dets, valids, det_scale, frame_hw):
        """Filter detections like get_face_landmarks_5; returns a list of
        (n_i, 5, 2) landmark arrays in frame coordinates."""
        h, w = frame_hw
        out = []
        for det_rows, valid in zip(dets, valids):
            rows = det_rows[valid] / det_scale
            landmarks = []
            for bbox in rows:
                eye_dist = np.linalg.norm(
                    [bbox[6] - bbox[8], bbox[7] - bbox[9]])
                if self.eye_dist_threshold is not None and \
                        eye_dist < self.eye_dist_threshold:
                    continue
                landmarks.append(
                    np.array([[bbox[i], bbox[i + 1]]
                              for i in range(5, 15, 2)]))
            if self.only_center_face and landmarks:
                centers = [lm.mean(0) for lm in landmarks]
                mid = np.array([w / 2, h / 2])
                idx = int(np.argmin(
                    [np.linalg.norm(cc - mid) for cc in centers]))
                landmarks = [landmarks[idx]]
            out.append(landmarks)
        return out

    def _det_hw(self, h: int, w: int):
        det_scale = self.detect_resize / min(h, w)
        return det_scale, (int(h * det_scale), int(w * det_scale))

    def _detect_start(self, frames_dev):
        """Dispatch (async) this chunk's detection graph."""
        _, det_hw = self._det_hw(*frames_dev.shape[1:3])
        return self.detector.batched_detect_device_start(
            frames_dev, det_hw, conf_threshold=self.conf_threshold)

    def _restore_chunk_device(self, frames_dev, pending_dets=None,
                              collect_faces=None):
        """(C, H, W, 3) uint8 BGR device -> (C, H*up, W*up, 3) uint8 BGR
        device. `pending_dets`: a _detect_start dispatch for this chunk
        (made earlier so the detection D2H overlaps device compute).
        `collect_faces`: optional list; appends
        (cropped_rgb_u8 (M,face,face,3) device, restored_rgb_u8 device,
        faces-per-frame counts) for callers that save per-face outputs
        (the folder CLI)."""
        c, h, w = frames_dev.shape[:3]
        det_scale, det_hw = self._det_hw(h, w)

        if pending_dets is None:
            pending_dets = self._detect_start(frames_dev)
        dets, valids = self.detector.batched_detect_device_finish(
            frames_dev, det_hw, pending_dets,
            conf_threshold=self.conf_threshold)
        per_frame = self._landmarks_from_dets(dets, valids, det_scale,
                                              (h, w))

        template = self.helper.face_template
        face = self.helper.face_size[0]
        up = self.upscale

        # flat face list with frame indices + affine solves (host, tiny)
        frame_idx, affines, inv_affines = [], [], []
        face_map = []  # per frame: indices into the flat face list
        for i, landmarks in enumerate(per_frame):
            ids = []
            for lm in landmarks:
                a = estimate_similarity(lm, template)
                ia = invert_affine(a, up)
                if up > 1:
                    ia = ia.copy()
                    ia[:, 2] += 0.5 * up
                ids.append(len(frame_idx))
                frame_idx.append(i)
                affines.append(a)
                inv_affines.append(ia)
            face_map.append(ids)

        n_real = len(frame_idx)
        m = _pow2_bucket(max(n_real, 1))
        fpf = _pow2_bucket(max(max((len(x) for x in face_map), default=0),
                               1))

        a_pad = np.zeros((m, 2, 3), np.float32)
        a_pad[:, 0, 0] = a_pad[:, 1, 1] = 1.0
        idx_pad = np.zeros((m,), np.int32)
        for j, (fi, a) in enumerate(zip(frame_idx, affines)):
            idx_pad[j] = fi
            a_pad[j] = a

        # composite inputs: (C*F) slots, dummies parked off-window
        cf = c * fpf
        map_pad = np.zeros((cf,), np.int32)
        ia_pad = np.zeros((cf, 2, 3), np.float32)
        ia_pad[:, 0, 0] = ia_pad[:, 1, 1] = 1.0
        ia_pad[:, 0, 2] = -4 * face  # off-window -> zero coverage
        areas = []  # real faces only (dummies must not set w_edge)
        bboxes = {}  # slot -> (y0, y1, x0, x1) on the upscaled canvas
        corners_face = np.array([[0, 0, 1], [face, 0, 1], [0, face, 1],
                                 [face, face, 1]], np.float32)
        for i, ids in enumerate(face_map):
            for k, j in enumerate(ids):
                slot = i * fpf + k
                map_pad[slot] = j
                ia_pad[slot] = inv_affines[j]
                det = abs(inv_affines[j][0, 0] * inv_affines[j][1, 1]
                          - inv_affines[j][0, 1] * inv_affines[j][1, 0])
                areas.append(face * face * det)
                cc = corners_face @ inv_affines[j].T  # (4, 2) = (x, y)
                bboxes[slot] = (cc[:, 1].min(), cc[:, 1].max(),
                                cc[:, 0].min(), cc[:, 0].max())
        w_edge = int(max(areas, default=float(face * face)) ** 0.5) // 20
        w_edge = min(max((w_edge + 4) // 8 * 8, 4), 64)

        # ROI windows: warp/filter per-face windows instead of full
        # canvases when every face (+ soft-edge margin) fits one
        hc, wc = _round_up(h * self.upscale, 128), \
            _round_up(w * self.upscale, 128)
        # The soft edge cannot spill past the warped face's coverage:
        # erode(cov, 2*w_edge) pulls the boundary in by w_edge and the
        # (2*w_edge+1)-tap blur pushes it back out by exactly w_edge
        # (finite kernel -> strict zeros beyond), so outside the face
        # bbox (+1px even-kernel asymmetry +1px rounding) the blend
        # returns the background bit-exactly. A fixed 8px margin
        # therefore loses nothing, while w_edge-sized margins (up to
        # 72px/side) would inflate every warp/filter window.
        margin = 8
        extent = max((max(y1 - y0, x1 - x0)
                      for y0, y1, x0, x1 in bboxes.values()), default=0)
        # 32-granular windows: warp/filter cost scales with roi² and the
        # filters only need 8-multiple (sublane) shapes; 128-rounding
        # cost ~27% extra points on typical faces
        roi = _round_up(int(extent) + 2 * margin + 2, 32)
        roi_pos = np.zeros((cf, 3), np.int32)
        if 0 < roi < min(hc, wc):
            for slot, (y0, _, x0, _) in bboxes.items():
                yy = int(np.clip(np.floor(y0) - margin, 0, hc - roi))
                xx = int(np.clip(np.floor(x0) - margin, 0, wc - roi))
                roi_pos[slot] = (slot // fpf, yy, xx)
                ia_pad[slot][:, 2] -= (xx, yy)  # window-local coords
        else:
            roi = 0  # face ~ canvas: full-canvas path

        merged = self._merged_graph((h, w), c, m, fpf, face, w_edge,
                                    self.use_parse, roi)
        pvars = self.helper._parse_vars if self.use_parse else {}
        out, faces_rgb, restored = merged(
            frames_dev, jnp.asarray(idx_pad), jnp.asarray(a_pad),
            self.restorer.variables, jnp.float32(self.w), pvars,
            jnp.asarray(map_pad), jnp.asarray(ia_pad),
            jnp.asarray(roi_pos))
        if collect_faces is not None:
            collect_faces.append((faces_rgb, restored,
                                  [len(ids) for ids in face_map]))
        return out

    def restore_frames_device(self, frames, collect_faces=None):
        """frames: (N, H, W, 3) uint8 BGR (numpy or device). Returns the
        restored (N, H*up, W*up, 3) uint8 BGR as a DEVICE array."""
        frames = jnp.asarray(frames)
        n = frames.shape[0]
        ck = min(self.frame_chunk, n)  # short inputs compile exact-size
        chunks, reals = [], []
        for i in range(0, n, ck):
            r = min(ck, n - i)  # real frames in this chunk
            chunk = frames[i:i + r]
            if r < ck:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], ck - r, axis=0)])
            chunks.append(chunk)
            reals.append(r)
        # software-pipelined: chunk k+1's detection is dispatched before
        # chunk k's results are fetched, so the detection round trip and
        # the host-side affine solves ride under device compute
        outs = []
        pending = self._detect_start(chunks[0])
        for i, (chunk, r) in enumerate(zip(chunks, reals)):
            nxt = self._detect_start(chunks[i + 1]) \
                if i + 1 < len(chunks) else None
            outs.append(self._restore_chunk_device(
                chunk, pending_dets=pending,
                collect_faces=collect_faces)[:r])
            pending = nxt
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    def restore_frames_stream(self, frames_iter):
        """Bounded-memory streaming variant of restore_frames: consume
        uint8 BGR frames from an iterator, yield restored frames (numpy
        uint8 BGR) in order. Peak footprint is two frame chunks (host +
        device) regardless of stream length — the reference
        (inference_codeformer.py:90-103) and restore_frames both hold
        EVERY frame in RAM, which caps video length at host/HBM size.

        The detection software-pipeline is preserved across the stream:
        chunk k+1 is read and its detector dispatched while chunk k's
        merged graph executes. Output is identical to restore_frames on
        the materialized list (same graphs, same chunking, including the
        exact-size compile for streams shorter than one chunk and the
        repeat-padded tail)."""
        import cv2
        it = iter(frames_iter)
        first = next(it, None)
        if first is None:
            return
        scale = 1.0
        if min(first.shape[:2]) < 512:
            scale = 512.0 / min(first.shape[:2])

        def prep(fr):
            if scale != 1.0:
                fr = cv2.resize(fr, (0, 0), fx=scale, fy=scale,
                                interpolation=cv2.INTER_LINEAR)
            return fr

        def chunked():
            buf = [prep(first)]
            for fr in it:
                buf.append(prep(fr))
                if len(buf) == self.frame_chunk:
                    yield buf
                    buf = []
            if buf:
                yield buf

        prev = None  # (device chunk, pending detection, real frames)
        for buf in chunked():
            r = len(buf)
            arr = np.stack(buf)
            if r < self.frame_chunk and prev is not None:
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], self.frame_chunk - r,
                                    axis=0)])
            # a short FIRST chunk means the whole stream fits it:
            # compile exact-size, like restore_frames_device
            chunk = jnp.asarray(arr)
            pending = self._detect_start(chunk)
            if prev is not None:
                out = self._restore_chunk_device(
                    prev[0], pending_dets=prev[1])
                for f in np.asarray(out[:prev[2]]):
                    yield f
            prev = (chunk, pending, r)
        out = self._restore_chunk_device(prev[0], pending_dets=prev[1])
        for f in np.asarray(out[:prev[2]]):
            yield f

    def restore_frames(self, frames: List[np.ndarray],
                       return_faces: bool = False):
        """Host-facing wrapper: handles the min-side-512 upscale rule and
        fetches the final frames (the only bulk device->host transfer).

        return_faces=True additionally returns, per frame, the list of
        (cropped_face_bgr, restored_face_bgr) uint8 pairs — the folder
        CLI saves these (reference inference_codeformer.py:215-228)."""
        import cv2
        if not frames:
            return ([], []) if return_faces else []
        if min(frames[0].shape[:2]) < 512:
            f = 512.0 / min(frames[0].shape[:2])
            frames = [cv2.resize(fr, (0, 0), fx=f, fy=f,
                                 interpolation=cv2.INTER_LINEAR)
                      for fr in frames]
        collect = [] if return_faces else None
        out = self.restore_frames_device(np.stack(frames),
                                         collect_faces=collect)
        out = np.asarray(out)
        if not return_faces:
            return list(out)
        faces_per_frame = []
        for cropped, restored, counts in collect:
            cropped = np.asarray(cropped)
            restored = np.asarray(restored)
            j = 0
            for n_faces in counts:
                pairs = [(cropped[j + k][..., ::-1],
                          restored[j + k][..., ::-1])
                         for k in range(n_faces)]
                faces_per_frame.append(pairs)
                j += n_faces
        # padded tail chunks repeat the last frame; drop their records
        faces_per_frame = faces_per_frame[:len(frames)]
        return list(out), faces_per_frame
