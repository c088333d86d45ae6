"""Folder path batches faces ACROSS files: run_whole_images must make ONE
restore_batch call covering every face of every image (the reference loops
per image and per face — inference_codeformer.py:160-272)."""
import os
from types import SimpleNamespace

import cv2
import numpy as np

import codeformer_tpu.cli.whole_image as wi


class _StubHelper:
    """Deterministic 1-face-per-image FaceRestoreHelper stand-in."""
    instances = []

    def __init__(self, upscale_factor, **kw):
        self.upscale_factor = upscale_factor
        self.use_parse = False
        self.face_size = (64, 64)
        self.save_ext = 'png'
        self.is_gray = False
        self._precomputed_parse_ids = None
        self.clean_all()
        _StubHelper.instances.append(self)

    def clean_all(self):
        self.cropped_faces = []
        self.restored_faces = []
        self.inverse_affine_matrices = []

    def read_image(self, img):
        self.input_img = img

    def get_face_landmarks_5(self, **kw):
        return 1

    def align_warp_face(self, *a, **kw):
        self.cropped_faces = [self.input_img[:64, :64].copy()]

    def get_inverse_affine(self, _):
        self.inverse_affine_matrices = [
            np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)]

    def add_restored_face(self, face, input_face=None):
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, upsample_img=None, draw_box=False,
                                   face_upsampler=None):
        h, w = self.input_img.shape[:2]
        out = cv2.resize(self.input_img,
                         (w * self.upscale_factor,
                          h * self.upscale_factor))
        out[:64, :64] = cv2.resize(self.restored_faces[0], (64, 64))
        return out


class _StubRestorer:
    def __init__(self):
        self.calls = []

    def restore_batch(self, faces, w=0.5, adain=True):
        self.calls.append(len(faces))
        return [255 - f for f in faces]


class _StubDevicePipeline:
    """Records construction + restore_frames calls for routing tests."""
    calls = []

    def __init__(self, restorer, helper, **kw):
        self.kw = kw

    def restore_frames(self, frames, return_faces=False):
        _StubDevicePipeline.calls.append(len(frames))
        up = [cv2.resize(f, (f.shape[1] * 2, f.shape[0] * 2))
              for f in frames]
        if not return_faces:
            return up
        faces = [[(f[:64, :64].copy(), 255 - f[:64, :64])]
                 for f in frames]
        return up, faces

    def restore_frames_stream(self, frames_iter):
        yield from self.restore_frames(list(frames_iter))


def _cli_args(in_dir, fused='auto', detection='retinaface_resnet50'):
    return SimpleNamespace(
        bg_upsampler='None', face_upsample=False, upscale=2,
        detection_model=detection, fidelity_weight=0.5,
        input_path=str(in_dir), draw_box=False, suffix=None,
        only_center_face=False, random_init=True, compositor='xla',
        save_video_fps=None, fused_pipeline=fused)


def _write_folder(tmp_path, shapes):
    in_dir = tmp_path / 'in'
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate(shapes):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(in_dir / f'{i:02d}.png'), img)
    out_dir = tmp_path / 'out'
    for sub in ('cropped_faces', 'restored_faces', 'final_results'):
        (out_dir / sub).mkdir(parents=True)
    return in_dir, out_dir


def test_fused_auto_routes_uniform_folder(tmp_path, monkeypatch):
    """auto + uniform-size folder + retinaface -> the fused device
    pipeline serves the folder and per-face outputs are still saved."""
    import codeformer_tpu.pipeline.device_pipeline as dp_mod
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    monkeypatch.setattr(dp_mod, 'DeviceRestorePipeline',
                        _StubDevicePipeline)
    _StubDevicePipeline.calls = []
    in_dir, out_dir = _write_folder(tmp_path, [(80, 96)] * 3)
    paths = sorted(str(p) for p in in_dir.iterdir())
    restorer = _StubRestorer()
    wi.run_whole_images(_cli_args(in_dir), paths, str(out_dir), restorer,
                        input_video=False)
    assert _StubDevicePipeline.calls == [3]     # fused path took it
    assert restorer.calls == []                 # classic path unused
    assert sorted(os.listdir(out_dir / 'final_results')) == \
        [f'{i:02d}.png' for i in range(3)]
    assert sorted(os.listdir(out_dir / 'restored_faces')) == \
        [f'{i:02d}_00.png' for i in range(3)]
    assert sorted(os.listdir(out_dir / 'cropped_faces')) == \
        [f'{i:02d}_00.png' for i in range(3)]


def test_fused_auto_routes_video(tmp_path, monkeypatch):
    """auto + video input -> fused pipeline, frames written + video
    muxed."""
    import codeformer_tpu.pipeline.device_pipeline as dp_mod
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    monkeypatch.setattr(dp_mod, 'DeviceRestorePipeline',
                        _StubDevicePipeline)
    _StubDevicePipeline.calls = []
    out_dir = tmp_path / 'out'
    for sub in ('cropped_faces', 'restored_faces', 'final_results'):
        (out_dir / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(4)]
    args = _cli_args(tmp_path / 'clip.mp4')
    restorer = _StubRestorer()
    wi.run_whole_images(args, frames, str(out_dir), restorer,
                        input_video=True,
                        video_meta={'fps': 24.0, 'audio': None})
    assert _StubDevicePipeline.calls == [4]
    assert restorer.calls == []
    finals = sorted(os.listdir(out_dir / 'final_results'))
    assert finals == [f'{i:06d}.png' for i in range(4)]
    assert (out_dir / 'clip.mp4').exists()


def test_fused_auto_falls_back_on_mixed_sizes(tmp_path, monkeypatch):
    import codeformer_tpu.pipeline.device_pipeline as dp_mod
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    monkeypatch.setattr(dp_mod, 'DeviceRestorePipeline',
                        _StubDevicePipeline)
    _StubDevicePipeline.calls = []
    in_dir, out_dir = _write_folder(tmp_path, [(80, 96), (96, 80)])
    paths = sorted(str(p) for p in in_dir.iterdir())
    restorer = _StubRestorer()
    wi.run_whole_images(_cli_args(in_dir), paths, str(out_dir), restorer,
                        input_video=False)
    assert _StubDevicePipeline.calls == []      # fused path skipped
    assert restorer.calls == [2]                # classic batched path ran


def test_fused_on_raises_when_ineligible(tmp_path, monkeypatch):
    import pytest
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    in_dir, out_dir = _write_folder(tmp_path, [(80, 96)])
    paths = sorted(str(p) for p in in_dir.iterdir())
    args = _cli_args(in_dir, fused='on', detection='YOLOv5n')
    with pytest.raises(RuntimeError, match='fused pipeline'):
        wi.run_whole_images(args, paths, str(out_dir), _StubRestorer(),
                            input_video=False)


def test_folder_restores_all_faces_in_one_stream(tmp_path, monkeypatch):
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    _StubHelper.instances = []

    in_dir = tmp_path / 'in'
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        img = rng.uniform(0, 255, (80, 96, 3)).astype(np.uint8)
        cv2.imwrite(str(in_dir / f'{i:02d}.png'), img)
    out_dir = tmp_path / 'out'
    for sub in ('cropped_faces', 'restored_faces', 'final_results'):
        (out_dir / sub).mkdir(parents=True)

    args = SimpleNamespace(
        bg_upsampler='None', face_upsample=False, upscale=2,
        detection_model='retinaface_resnet50', fidelity_weight=0.5,
        input_path=str(in_dir), draw_box=False, suffix=None,
        only_center_face=False, random_init=True, compositor='xla',
        save_video_fps=None)
    paths = sorted(str(p) for p in in_dir.iterdir())
    restorer = _StubRestorer()
    wi.run_whole_images(args, paths, str(out_dir), restorer,
                        input_video=False)

    # ONE batched call over all 5 faces — not 5 calls of 1
    assert restorer.calls == [5]
    finals = sorted(os.listdir(out_dir / 'final_results'))
    assert finals == [f'{i:02d}.png' for i in range(5)]
    # restored face content (inverted crop) landed in each final image
    img0 = cv2.imread(str(in_dir / '00.png'))
    out0 = cv2.imread(str(out_dir / 'final_results' / '00.png'))
    np.testing.assert_array_equal(out0[:64, :64], 255 - img0[:64, :64])
    faces = sorted(os.listdir(out_dir / 'restored_faces'))
    assert len(faces) == 5


def test_cli_main_streams_video_lazily(tmp_path, monkeypatch):
    """main() on a video file must hand run_whole_images a LAZY frame
    stream (bounded memory), and the fused branch must write the output
    video incrementally from that stream."""
    import codeformer_tpu.cli.inference_codeformer as cli
    import codeformer_tpu.pipeline.device_pipeline as dp_mod

    clip = tmp_path / 'clip.avi'
    vw = cv2.VideoWriter(str(clip), cv2.VideoWriter_fourcc(*'MJPG'),
                         12.0, (96, 64))
    assert vw.isOpened()
    rng = np.random.default_rng(3)
    for _ in range(5):
        vw.write(rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    vw.release()

    seen = {}

    def spy_run(args, input_img_list, result_root, restorer, input_video,
                video_meta=None):
        seen['lazy'] = not isinstance(input_img_list, list)
        seen['n'] = len(list(input_img_list))
        seen['video'] = input_video
        seen['meta'] = video_meta

    class _NoopRestorer:
        def __init__(self, **kw):
            pass

    monkeypatch.setattr(cli, 'CodeFormerRestorer', _NoopRestorer)
    monkeypatch.setattr(wi, 'run_whole_images', spy_run)
    import codeformer_tpu.cli.whole_image  # ensure module import works
    monkeypatch.setattr('codeformer_tpu.cli.whole_image.run_whole_images',
                        spy_run)
    cli.main(['-i', str(clip), '-w', '0.5', '--random-init',
              '-o', str(tmp_path / 'out')])

    assert seen['video'] is True
    assert seen['lazy'] is True          # a generator, not a list
    assert seen['n'] == 5                # and it yields every frame
    assert seen['meta']['fps'] == 12.0


def test_fused_video_streams_through_pipeline(tmp_path, monkeypatch):
    """The fused video branch consumes a generator end to end: PNG per
    frame + incrementally written video, no materialized frame list."""
    import codeformer_tpu.pipeline.device_pipeline as dp_mod
    monkeypatch.setattr(wi, 'FaceRestoreHelper', _StubHelper)
    monkeypatch.setattr(dp_mod, 'DeviceRestorePipeline',
                        _StubDevicePipeline)
    _StubDevicePipeline.calls = []
    out_dir = tmp_path / 'out'
    for sub in ('cropped_faces', 'restored_faces', 'final_results'):
        (out_dir / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)

    def frame_gen():
        for _ in range(4):
            yield rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)

    args = _cli_args(tmp_path / 'clip.mp4')
    wi.run_whole_images(args, frame_gen(), str(out_dir), _StubRestorer(),
                        input_video=True,
                        video_meta={'fps': 24.0, 'audio': None})
    assert _StubDevicePipeline.calls == [4]
    finals = sorted(os.listdir(out_dir / 'final_results'))
    assert finals == [f'{i:06d}.png' for i in range(4)]
    assert (out_dir / 'clip.mp4').exists()
