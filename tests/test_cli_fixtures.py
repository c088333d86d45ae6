"""Out-of-box fixture integration: the repo ships `inputs/` (the
reference's default CLI input sets, inference_codeformer.py:60-61) and
every CLI runs on its DEFAULT paths producing the reference results
layout (results/<name>_<w>/{cropped_faces,restored_faces,final_results},
inference_codeformer.py:231-252).

The neural restorer is stubbed here (identity-invert) so these tests
exercise the CLI plumbing + fixtures + layout fast on CPU; the real
full-512 graph end-to-end run is tests/test_pipeline.py::
test_aligned_cli_end_to_end (slow marker).
"""
import os

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fixture_sets_present():
    """A fresh checkout carries every default input set the CLIs point
    at (reference inputs/: 20 cropped, 7 whole, 13 gray, 5 masked)."""
    for sub, n_min in [('cropped_faces', 15), ('whole_imgs', 5),
                       ('gray_faces', 10), ('masked_faces', 4)]:
        d = os.path.join(REPO, 'inputs', sub)
        assert os.path.isdir(d), f'missing fixture dir inputs/{sub}'
        imgs = [f for f in os.listdir(d)
                if f.lower().endswith(('.png', '.jpg', '.jpeg'))]
        assert len(imgs) >= n_min, f'inputs/{sub}: {len(imgs)} < {n_min}'


def test_fixture_faces_are_512():
    """Aligned fixture sets must satisfy the CLIs' 512x512 asserts."""
    for sub in ('gray_faces', 'masked_faces'):
        d = os.path.join(REPO, 'inputs', sub)
        name = sorted(os.listdir(d))[0]
        img = cv2.imread(os.path.join(d, name))
        assert img.shape[:2] == (512, 512), (sub, name, img.shape)


class _StubRestorer:
    """CodeFormerRestorer stand-in: identity-invert restore, records
    construction kwargs so arch-parity of each CLI is still asserted."""
    last_kwargs = None

    def __init__(self, **kw):
        _StubRestorer.last_kwargs = kw

    def restore_batch(self, faces, w=0.5, adain=True,
                      enable_fuse=None):
        return [(255 - np.asarray(f)).astype(np.uint8) for f in faces]


class _StubHelper:
    """1-face-per-image FaceRestoreHelper stand-in for the whole-image
    default-path run (real detection is covered elsewhere)."""

    def __init__(self, upscale_factor, **kw):
        self.upscale_factor = upscale_factor
        self.use_parse = False
        self.save_ext = 'png'
        self.is_gray = False
        self._precomputed_parse_ids = None
        self.clean_all()

    def clean_all(self):
        self.cropped_faces = []
        self.restored_faces = []
        self.inverse_affine_matrices = []

    def read_image(self, img):
        self.input_img = img

    def get_face_landmarks_5(self, **kw):
        return 1

    def align_warp_face(self, *a, **kw):
        face = cv2.resize(self.input_img, (512, 512))
        self.cropped_faces = [face]

    def get_inverse_affine(self, _):
        self.inverse_affine_matrices = [
            np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)]

    def add_restored_face(self, face, input_face=None):
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, upsample_img=None,
                                   draw_box=False, face_upsampler=None):
        h, w = self.input_img.shape[:2]
        return cv2.resize(self.input_img, (w * self.upscale_factor,
                                           h * self.upscale_factor))


@pytest.fixture
def fresh_checkout(tmp_path, monkeypatch):
    """cwd with the repo's inputs/ visible at ./inputs (default paths)."""
    os.symlink(os.path.join(REPO, 'inputs'), str(tmp_path / 'inputs'))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_restoration_cli_aligned_default_layout(fresh_checkout,
                                                monkeypatch):
    import codeformer_tpu.cli.inference_codeformer as cli
    monkeypatch.setattr(cli, 'CodeFormerRestorer', _StubRestorer)
    cli.main(['-i', './inputs/cropped_faces', '--has_aligned',
              '--random-init'])
    out = fresh_checkout / 'results' / 'cropped_faces_0.5'
    names = sorted(os.listdir(out / 'restored_faces'))
    src = sorted(os.listdir(os.path.join(REPO, 'inputs',
                                         'cropped_faces')))
    assert names == [os.path.splitext(n)[0] + '.png' for n in src]
    # production arch selection (reference inference_codeformer.py:135)
    kw = _StubRestorer.last_kwargs
    assert kw['dim_embd'] == 512 and kw['codebook_size'] == 1024
    assert kw['connect_list'] == ('32', '64', '128', '256')


def test_restoration_cli_whole_default_layout(fresh_checkout,
                                              monkeypatch):
    """NO -i flag: the default ./inputs/whole_imgs path must resolve and
    produce the 3-dir results layout."""
    import codeformer_tpu.cli.inference_codeformer as cli
    import codeformer_tpu.cli.whole_image as wi
    monkeypatch.setattr(cli, 'CodeFormerRestorer', _StubRestorer)
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    cli.main(['--random-init', '--fused_pipeline', 'off'])
    out = fresh_checkout / 'results' / 'whole_imgs_0.5'
    n_src = len(os.listdir(os.path.join(REPO, 'inputs', 'whole_imgs')))
    for sub in ('cropped_faces', 'restored_faces', 'final_results'):
        assert len(os.listdir(out / sub)) == n_src, sub


def test_colorization_cli_default_layout(fresh_checkout, monkeypatch):
    import codeformer_tpu.cli.inference_colorization as cli
    monkeypatch.setattr(cli, 'CodeFormerRestorer', _StubRestorer)
    cli.main(['--random-init'])
    out = fresh_checkout / 'results' / 'gray_faces'
    src = sorted(os.listdir(os.path.join(REPO, 'inputs', 'gray_faces')))
    assert sorted(os.listdir(out)) == [os.path.splitext(n)[0] + '.png'
                                       for n in src]
    assert _StubRestorer.last_kwargs['connect_list'] == \
        ('32', '64', '128')


def test_inpainting_cli_default_layout(fresh_checkout, monkeypatch):
    import codeformer_tpu.cli.inference_inpainting as cli
    monkeypatch.setattr(cli, 'CodeFormerRestorer', _StubRestorer)
    cli.main(['--random-init'])
    out = fresh_checkout / 'results' / 'masked_faces'
    src = sorted(os.listdir(os.path.join(REPO, 'inputs',
                                         'masked_faces')))
    assert sorted(os.listdir(out)) == [os.path.splitext(n)[0] + '.png'
                                       for n in src]
    assert _StubRestorer.last_kwargs['codebook_size'] == 512
    # masked (pure-white) pixels take the model output, others keep the
    # input (reference inference_inpainting.py:75-77)
    name = sorted(os.listdir(out))[0]
    comp = cv2.imread(str(out / name))
    orig = cv2.imread(os.path.join(REPO, 'inputs', 'masked_faces',
                                   src[0]))
    white = (orig == 255).all(axis=-1)
    np.testing.assert_array_equal(comp[~white], orig[~white])
    assert (comp[white] == 0).all()  # invert-stub turns white to 0
