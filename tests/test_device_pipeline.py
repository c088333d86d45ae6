"""DeviceRestorePipeline vs the classic per-stage video path on a
synthetic scene with injected detections (random weights; both paths share
the same tiny CodeFormer, so outputs must closely agree — remaining
differences are the cv2-vs-XLA resamplers)."""
import numpy as np
import pytest

import jax.numpy as jnp

from codeformer_tpu.pipeline.detector import FaceDetector
from codeformer_tpu.pipeline.restorer import CodeFormerRestorer


FACE = 64  # tiny face crops for CPU speed


def _template64():
    t = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    return t * (FACE / 512.0)


def _frame_landmarks(frame_hw):
    # face occupies a ~200px region around the center
    t = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    return t * 0.45 + np.array([frame_hw[1] / 2 - 110.0,
                                frame_hw[0] / 2 - 130.0], np.float32)


class _InjectedDetector(FaceDetector):
    """Returns one synthetic detection per frame in detector coords."""

    def __init__(self):  # no weights
        self.max_faces = 8
        self.pre_nms_topk = 64
        self.variables = None
        self._jitted = {}

    def _det_rows(self, n, det_scale, frame_hw):
        lm = _frame_landmarks(frame_hw) * det_scale
        row = np.zeros(15, np.float32)
        row[0:4] = [lm[:, 0].min() - 20, lm[:, 1].min() - 40,
                    lm[:, 0].max() + 20, lm[:, 1].max() + 30]
        row[4] = 0.99
        row[5:15] = lm.reshape(-1)
        return np.tile(row, (n, 1))

    frame_hw = (540, 720)  # original frame geometry (set by the test)

    def batched_detect_faces(self, frames, conf_threshold=0.8,
                             nms_threshold=0.4):
        b, h, w = np.asarray(frames).shape[:3]
        # the video path resizes frames to detect size before this call
        det_scale = h / self.frame_hw[0]
        return [self._det_rows(1, det_scale, self.frame_hw)
                for _ in range(b)]

    def batched_detect_device(self, frames_dev, det_hw,
                              conf_threshold=0.8, nms_threshold=0.4):
        b, h, w = frames_dev.shape[:3]
        det_scale = det_hw[0] / h
        dets = np.stack([self._det_rows(self.max_faces, det_scale, (h, w))
                         for _ in range(b)])
        valids = np.zeros((b, self.max_faces), bool)
        valids[:, 0] = True
        return dets, valids

    # pipelined-dispatch surface (DeviceRestorePipeline calls these):
    # start is a no-op; finish delegates to batched_detect_device so
    # per-test monkeypatches of that method keep working
    def batched_detect_device_start(self, frames_dev, det_hw, **kw):
        return None

    def batched_detect_device_finish(self, frames_dev, det_hw, pending,
                                     **kw):
        return self.batched_detect_device(frames_dev, det_hw, **kw)


class _Helper:
    """Minimal FaceRestoreHelper stand-in (no weights)."""

    def __init__(self, use_parse=False):
        self.face_detector = _InjectedDetector()
        self.face_template = _template64()
        self.face_size = (FACE, FACE)
        self.use_parse = use_parse
        self.is_gray = False
        self.upscale_factor = 2
        self.compositor = 'xla'
        self.save_ext = 'png'
        self._precomputed_parse_ids = None

    # video-path surface
    def clean_all(self):
        self.cropped_faces = []
        self.restored_faces = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []

    def get_inverse_affine(self, _):
        import cv2
        for a in self.affine_matrices:
            inv = cv2.invertAffineTransform(a)
            self.inverse_affine_matrices.append(inv * self.upscale_factor)

    def paste_faces_to_input_image(self, **kw):
        from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper
        return FaceRestoreHelper.paste_faces_to_input_image(self, **kw)


@pytest.fixture(scope='module')
def tiny_restorer():
    import codeformer_tpu.pipeline.restorer as rmod
    orig = rmod.CodeFormer

    def tiny(**kw):
        kw.update(img_size=FACE, nf=32, ch_mult=(1, 2, 4), emb_dim=16,
                  latent_size=256)
        return orig(**kw)

    rmod.CodeFormer = tiny
    try:
        r = CodeFormerRestorer(dim_embd=32, codebook_size=32, n_head=4,
                               n_layers=2, connect_list=('32', '64'),
                               dtype=jnp.float32, face_size=FACE,
                               batch_buckets=(1, 2, 4))
    finally:
        rmod.CodeFormer = orig
    return r


@pytest.mark.slow
def test_device_pipeline_matches_classic_path(tiny_restorer):
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.video import restore_video_frames

    rng = np.random.default_rng(0)
    base = rng.uniform(30, 220, (540, 720, 3)).astype(np.uint8)
    frames = [base.copy(), np.roll(base, 5, axis=1)]

    classic = restore_video_frames(
        frames, tiny_restorer, _Helper(use_parse=False), w=0.5, upscale=2,
        resize=640)

    pipe = DeviceRestorePipeline(tiny_restorer, _Helper(use_parse=False),
                                 upscale=2, frame_chunk=2,
                                 detect_resize=640, w=0.5)
    fused, faces = pipe.restore_frames(frames, return_faces=True)

    # per-frame (cropped, restored) pairs for the folder CLI's outputs
    assert [len(f) for f in faces] == [1, 1]
    for cropped, restored in [p for fr in faces for p in fr]:
        assert cropped.shape == restored.shape == (FACE, FACE, 3)
        assert cropped.dtype == restored.dtype == np.uint8

    assert len(classic) == len(fused) == 2
    assert classic[0].shape == fused[0].shape == (1080, 1440, 3)
    for a, b in zip(classic, fused):
        diff = np.abs(a.astype(np.float32) - b.astype(np.float32))
        # same model + same geometry; resampler (cv2 vs XLA) differences
        # remain at the face border
        assert diff.mean() < 3.0, diff.mean()
        assert np.median(diff) <= 1.0


class _TwoFaceDetector(_InjectedDetector):
    """Two OVERLAPPING synthetic faces per frame."""
    OFFSETS = ((-150.0, -150.0), (-60.0, -100.0))

    def _det_rows(self, n, det_scale, frame_hw):
        t = np.array(
            [[192.98138, 239.94708], [318.90277, 240.1936],
             [256.63416, 314.01935], [201.26117, 371.41043],
             [313.08905, 371.15118]], np.float32)
        rows = []
        for ox, oy in self.OFFSETS:
            lm = (t * 0.45 + np.array([frame_hw[1] / 2 + ox,
                                       frame_hw[0] / 2 + oy],
                                      np.float32)) * det_scale
            row = np.zeros(15, np.float32)
            row[0:4] = [lm[:, 0].min() - 20, lm[:, 1].min() - 40,
                        lm[:, 0].max() + 20, lm[:, 1].max() + 30]
            row[4] = 0.99
            row[5:15] = lm.reshape(-1)
            rows.append(row)
        return np.stack(rows)

    def batched_detect_faces(self, frames, conf_threshold=0.8,
                             nms_threshold=0.4):
        b, h, w = np.asarray(frames).shape[:3]
        det_scale = h / self.frame_hw[0]
        return [self._det_rows(2, det_scale, self.frame_hw)
                for _ in range(b)]

    def batched_detect_device(self, frames_dev, det_hw,
                              conf_threshold=0.8, nms_threshold=0.4):
        b, h, w = frames_dev.shape[:3]
        det_scale = det_hw[0] / h
        rows = self._det_rows(2, det_scale, (h, w))
        dets = np.zeros((b, self.max_faces, 15), np.float32)
        dets[:, :2] = rows
        valids = np.zeros((b, self.max_faces), bool)
        valids[:, :2] = True
        return dets, valids


@pytest.mark.slow
def test_device_pipeline_multiface_overlap(tiny_restorer):
    """Two overlapping faces per frame: the batched ROI composite
    (vmapped per-frame window blends, one round per face slot) must
    reproduce the reference's sequential per-face overwrite order —
    later faces blend over earlier ones where their windows overlap
    (face_restoration_helper.py paste loop)."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.video import restore_video_frames

    rng = np.random.default_rng(3)
    base = rng.uniform(30, 220, (540, 720, 3)).astype(np.uint8)
    frames = [base.copy(), np.roll(base, 7, axis=0)]

    def helper():
        h = _Helper(use_parse=False)
        h.face_detector = _TwoFaceDetector()
        return h

    classic = restore_video_frames(
        frames, tiny_restorer, helper(), w=0.5, upscale=2, resize=640)
    pipe = DeviceRestorePipeline(tiny_restorer, helper(), upscale=2,
                                 frame_chunk=2, detect_resize=640, w=0.5)
    fused, faces = pipe.restore_frames(frames, return_faces=True)

    assert [len(f) for f in faces] == [2, 2]
    assert len(classic) == len(fused) == 2
    for a, b in zip(classic, fused):
        diff = np.abs(a.astype(np.float32) - b.astype(np.float32))
        assert diff.mean() < 3.0, diff.mean()
        assert np.median(diff) <= 1.0


@pytest.mark.slow
def test_device_pipeline_no_faces(tiny_restorer):
    """Frames with zero detections must come back as the plain 2x
    upscale."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline

    helper = _Helper(use_parse=False)

    def none_dets(frames_dev, det_hw, **kw):
        b = frames_dev.shape[0]
        return (np.zeros((b, 8, 15), np.float32),
                np.zeros((b, 8), bool))

    helper.face_detector.batched_detect_device = none_dets
    pipe = DeviceRestorePipeline(tiny_restorer, helper, upscale=2,
                                 frame_chunk=1, w=0.5)
    frame = np.random.default_rng(1).uniform(
        0, 255, (520, 520, 3)).astype(np.uint8)
    out = pipe.restore_frames([frame])[0]
    assert out.shape == (1040, 1040, 3)
    import cv2
    ref = cv2.resize(frame, (1040, 1040), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out.astype(np.float32) - ref.astype(np.float32))
    assert diff.mean() < 1.5, diff.mean()


def test_device_pipeline_stream_matches_batch(tiny_restorer):
    """restore_frames_stream must produce bitwise-identical frames to
    restore_frames (same graphs, same chunking), across a full chunk, a
    repeat-padded tail chunk (5 = 2 + 2 + 1) and the lazy-iterator
    entry."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline

    rng = np.random.default_rng(11)
    frames = [rng.uniform(20, 235, (540, 720, 3)).astype(np.uint8)
              for _ in range(5)]

    helper = _Helper(use_parse=False)
    pipe = DeviceRestorePipeline(tiny_restorer, helper, upscale=2,
                                 frame_chunk=2, w=0.5)
    batch = pipe.restore_frames(frames)
    streamed = list(pipe.restore_frames_stream(f for f in frames))

    assert len(streamed) == len(batch)
    for got, want in zip(streamed, batch):
        assert got.dtype == np.uint8 and got.shape == want.shape
        assert np.array_equal(got, want)

    # short stream (< one chunk): exact-size compile path
    short = list(pipe.restore_frames_stream(iter(frames[:1])))
    short_batch = pipe.restore_frames(frames[:1])
    assert len(short) == 1
    assert np.array_equal(short[0], short_batch[0])

    # empty stream yields nothing
    assert list(pipe.restore_frames_stream(iter([]))) == []


def test_device_pipeline_border_face(tiny_restorer):
    """A face crossing the canvas corner: its bbox extends off-canvas,
    so the ROI window clamps to the canvas edge. The clamped window must
    still cover the in-canvas part of the face and blend identically to
    the classic path (guards the margin=8 window maths)."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.video import restore_video_frames

    rng = np.random.default_rng(7)
    frames = [rng.uniform(30, 220, (540, 720, 3)).astype(np.uint8)]

    t = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    # landmark cluster near the top-left corner: the warped face quad
    # spans negative frame coords
    corner_lm = t * 0.45 - np.array([60.0, 80.0], np.float32)

    class CornerDet(_InjectedDetector):
        frame_hw = (540, 720)

        def _det_rows(self, n, det_scale, frame_hw):
            lm = corner_lm * det_scale
            row = np.zeros(15, np.float32)
            row[0:4] = [lm[:, 0].min() - 20, lm[:, 1].min() - 40,
                        lm[:, 0].max() + 20, lm[:, 1].max() + 30]
            row[4] = 0.99
            row[5:15] = lm.reshape(-1)
            return np.tile(row, (n, 1))

    helper_a = _Helper(use_parse=False)
    helper_a.face_detector = CornerDet()
    classic = restore_video_frames(frames, tiny_restorer, helper_a,
                                   w=0.5, upscale=2, resize=640)

    helper_b = _Helper(use_parse=False)
    helper_b.face_detector = CornerDet()
    pipe = DeviceRestorePipeline(tiny_restorer, helper_b, upscale=2,
                                 frame_chunk=1, w=0.5)
    fused = pipe.restore_frames(frames)

    # the ROI path (not the full-canvas fallback) must have been used
    assert any(k[0] == 'merged' and k[-1] > 0 for k in pipe._graphs)
    diff = np.abs(classic[0].astype(np.float32)
                  - fused[0].astype(np.float32))
    assert diff.mean() < 3.0, diff.mean()
    assert np.median(diff) <= 1.0


def test_shape_parse_masks_halfres_close_to_fullres():
    """_shape_parse_masks at res=256 (scaled kernel/sigma/border +
    bilinear upsample) must stay within the documented boundary-shift
    bound of the exact 512 reference shaping on the same geometry."""
    import jax
    from codeformer_tpu.pipeline.compositor_xla import _shape_parse_masks

    yy, xx = np.mgrid[0:512, 0:512]
    d = np.sqrt((yy - 255.5) ** 2 + (xx - 255.5) ** 2)
    ids512 = (d < 180).astype(np.int32)  # class 1 = 'skin' (mask 255)
    ids256 = np.asarray(jax.image.resize(
        jnp.asarray(ids512, jnp.float32), (256, 256),
        'nearest')).astype(np.int32)

    m512 = np.asarray(_shape_parse_masks(
        jnp.asarray(ids512)[None], 512, 1))[0, ..., 0]
    m256 = np.asarray(_shape_parse_masks(
        jnp.asarray(ids256)[None], 512, 1))[0, ..., 0]

    assert m512.shape == m256.shape == (512, 512)
    assert 0.0 <= m256.min() and m256.max() <= 1.0 + 1e-5
    diff = np.abs(m512 - m256)
    # soft blend weights in [0,1]: a ~2px boundary shift under the
    # >=49-tap double blur keeps the pointwise error small and the
    # mean error tiny
    assert diff.mean() < 0.005, diff.mean()
    assert diff.max() < 0.05, diff.max()


class _StubParseModel:
    """Resolution-covariant ParseNet stand-in: class 1 ('skin' in
    MASK_COLORMAP, mask 255) inside a centered disc, class 0 outside.
    The argmax ids are the same geometry at any parse resolution, so
    the 256- and 512-res pipeline paths must closely agree."""

    def apply(self, variables, x):
        m, r = x.shape[0], x.shape[1]
        yy, xx = jnp.mgrid[0:r, 0:r]
        c = (r - 1) / 2.0
        d = jnp.sqrt((yy - c) ** 2 + (xx - c) ** 2) / r
        inside = (d < 0.35).astype(jnp.float32)
        logits = jnp.stack([1.0 - inside, inside], axis=-1)
        return jnp.broadcast_to(logits[None], (m, r, r, 2)), None


@pytest.mark.slow
def test_device_pipeline_parse_res_halfres_close(tiny_restorer):
    """The fused pipeline with parse_res=256 (half-res ParseNet + mask
    shaping, bilinear mask upsample) must closely match parse_res=512
    (strict reference semantics) given a resolution-covariant parser."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline

    rng = np.random.default_rng(9)
    frames = [rng.uniform(30, 220, (540, 720, 3)).astype(np.uint8)]

    def helper():
        h = _Helper(use_parse=True)
        h._parse_model = _StubParseModel()
        h._parse_vars = {}
        return h

    full = DeviceRestorePipeline(tiny_restorer, helper(), upscale=2,
                                 frame_chunk=1, w=0.5, parse_res=512)
    half = DeviceRestorePipeline(tiny_restorer, helper(), upscale=2,
                                 frame_chunk=1, w=0.5, parse_res=256)
    out_full = full.restore_frames(frames)[0]
    out_half = half.restore_frames(frames)[0]

    # graphs are keyed on parse_res (separate compiles, no cache mixup)
    assert any(k[0] == 'merged' and 512 in k[1:] for k in full._graphs)
    assert any(k[0] == 'merged' and 256 in k[1:] for k in half._graphs)

    assert out_full.shape == out_half.shape
    diff = np.abs(out_full.astype(np.float32) - out_half.astype(np.float32))
    assert diff.mean() < 0.5, diff.mean()
    assert np.median(diff) == 0.0


def test_device_pipeline_fullcanvas_fallback(tiny_restorer):
    """A face as large as the frame forces the full-canvas composite
    path (ROI window would not fit); results must still match the
    classic path."""
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.video import restore_video_frames
    import codeformer_tpu.pipeline.device_pipeline as dp_mod

    rng = np.random.default_rng(4)
    frames = [rng.uniform(30, 220, (520, 560, 3)).astype(np.uint8)]

    # landmarks spanning nearly the whole frame -> face ~ canvas
    big = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    # large enough that roi (extent + margins, 32-granular) cannot fit
    # the canvas -> full-canvas fallback
    big_lm = (big - 256.0) * 1.08 + np.array([280.0, 260.0])

    class BigDet(_InjectedDetector):
        frame_hw = (520, 560)

        def _det_rows(self, n, det_scale, frame_hw):
            lm = big_lm * det_scale
            row = np.zeros(15, np.float32)
            row[0:4] = [lm[:, 0].min(), lm[:, 1].min(),
                        lm[:, 0].max(), lm[:, 1].max()]
            row[4] = 0.99
            row[5:15] = lm.reshape(-1)
            return np.tile(row, (n, 1))

    helper_a = _Helper(use_parse=False)
    helper_a.face_detector = BigDet()
    classic = restore_video_frames(frames, tiny_restorer, helper_a,
                                   w=0.5, upscale=2, resize=640)

    helper_b = _Helper(use_parse=False)
    helper_b.face_detector = BigDet()
    pipe = DeviceRestorePipeline(tiny_restorer, helper_b, upscale=2,
                                 frame_chunk=1, w=0.5)
    fused = pipe.restore_frames(frames)

    # the fallback graph (roi=0) must have been selected
    assert any(k[0] == 'merged' and k[-1] == 0 for k in pipe._graphs)
    diff = np.abs(classic[0].astype(np.float32)
                  - fused[0].astype(np.float32))
    assert diff.mean() < 3.0, diff.mean()
