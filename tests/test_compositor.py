"""XLA compositor vs the cv2 reference compositor on synthetic faces."""
import cv2
import numpy as np
import pytest

from codeformer_tpu.pipeline.face_helper import FaceRestoreHelper, \
    MASK_COLORMAP


def _synthetic_case(use_parse):
    rng = np.random.default_rng(0)
    img = rng.uniform(40, 200, (200, 260, 3)).astype(np.uint8)
    face = rng.uniform(0, 255, (512, 512, 3)).astype(np.uint8)
    # a similarity transform face -> image region
    affine = np.array([[0.25, 0.0, 40.0], [0.0, 0.25, 50.0]], np.float32)
    inverse_affine = cv2.invertAffineTransform(
        np.array([[4.0, 0.0, -160.0], [0.0, 4.0, -200.0]], np.float32))
    # i.e. face occupies img[50:178, 40:168]
    parse = np.zeros((512, 512), np.int32)
    parse[100:400, 100:400] = 1  # 'skin' class -> mask 255
    return img, face, inverse_affine, parse


class _Stub(FaceRestoreHelper):
    """Bypass model loading: compositor-only harness."""

    def __init__(self, upscale, use_parse, compositor):
        self.compositor = compositor
        self.upscale_factor = upscale
        self.use_parse = use_parse
        self.face_size = (512, 512)
        self.save_ext = 'png'
        self.restored_faces = []
        self.inverse_affine_matrices = []

    def _parse_masks(self, faces):
        return np.stack([self._parse for _ in faces])


class _FakeUpsampler:
    """Stands in for RealESRGANer.enhance: plain resize by outscale."""

    def enhance(self, img, outscale=2):
        h, w = img.shape[:2]
        out = cv2.resize(img, (int(w * outscale), int(h * outscale)),
                         interpolation=cv2.INTER_LINEAR)
        return out, 'RGB'


def test_xla_compositor_draw_box_close_to_cv2():
    img, face, inverse_affine, parse = _synthetic_case(False)
    outs = {}
    for compositor in ('cv2', 'xla'):
        h = _Stub(1, False, compositor)
        h.input_img = img
        h.restored_faces = [face.copy()]
        h.inverse_affine_matrices = [inverse_affine.copy()]
        outs[compositor] = h.paste_faces_to_input_image(
            draw_box=True).astype(np.float32)
    # green box must be present in both
    for out in outs.values():
        assert (out[:, :, 1] == 255).sum() > 100
    diff = np.abs(outs['cv2'] - outs['xla'])
    # area comes from the affine determinant in the XLA path (vs the
    # eroded-mask sum in cv2) -> the border may shift by ~1px
    assert diff.mean() < 3.0, diff.mean()
    assert np.median(diff) == 0.0


@pytest.mark.parametrize('use_parse', [False, True])
def test_xla_compositor_face_upsampler_close_to_cv2(use_parse):
    img, face, inverse_affine, parse = _synthetic_case(use_parse)
    ups = _FakeUpsampler()
    outs = {}
    for compositor in ('cv2', 'xla'):
        h = _Stub(2, use_parse, compositor)
        h.input_img = img
        h.restored_faces = [face.copy()]
        h.inverse_affine_matrices = [inverse_affine.copy() * 2]
        h._parse = parse
        outs[compositor] = h.paste_faces_to_input_image(
            face_upsampler=ups).astype(np.float32)
    assert outs['cv2'].shape == outs['xla'].shape == (400, 520, 3)
    diff = np.abs(outs['cv2'] - outs['xla'])
    assert diff.mean() < 2.0, diff.mean()
    assert np.median(diff) == 0.0


@pytest.mark.parametrize('use_parse', [False, True])
def test_xla_compositor_close_to_cv2(use_parse):
    img, face, inverse_affine, parse = _synthetic_case(use_parse)
    outs = {}
    for compositor in ('cv2', 'xla'):
        h = _Stub(1, use_parse, compositor)
        h.input_img = img
        h.restored_faces = [face.copy()]
        h.inverse_affine_matrices = [inverse_affine.copy()]
        h._parse = parse
        outs[compositor] = h.paste_faces_to_input_image().astype(
            np.float32)
    diff = np.abs(outs['cv2'] - outs['xla'])
    # identical away from the quantized soft edge; small mean deviation
    assert diff.mean() < 2.0, diff.mean()
    assert np.median(diff) == 0.0
    # untouched background must be identical
    np.testing.assert_array_equal(outs['cv2'][0:20], outs['xla'][0:20])
