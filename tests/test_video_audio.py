"""Audio passthrough behavior (reference basicsr/utils/video_util.py:89-125:
the VideoWriter muxes the source audio)."""
import os

import numpy as np
import pytest

from codeformer_tpu.utils.video_util import (Cv2VideoWriter, VideoReader,
                                             VideoWriter, have_ffmpeg,
                                             make_video_writer)


def test_cv2_writer_warns_when_audio_dropped(tmp_path):
    path = str(tmp_path / 'out.mp4')
    with pytest.warns(UserWarning, match='WITHOUT audio'):
        w = Cv2VideoWriter(path, 64, 64, 24.0, audio='/some/src.mp4')
    w.write_frame(np.zeros((64, 64, 3), np.uint8))
    w.close()
    assert os.path.getsize(path) > 0


def test_cv2_writer_silent_without_audio(tmp_path, recwarn):
    path = str(tmp_path / 'out.mp4')
    w = Cv2VideoWriter(path, 64, 64, 24.0, audio=None)
    w.write_frame(np.zeros((64, 64, 3), np.uint8))
    w.close()
    assert not [x for x in recwarn.list
                if issubclass(x.category, UserWarning)]


@pytest.mark.skipif(not have_ffmpeg(), reason='ffmpeg not on PATH')
def test_audio_stream_survives_roundtrip(tmp_path):
    """Write a source clip with a sine audio track, restore-write through
    VideoWriter with audio passthrough, assert the audio stream exists."""
    import subprocess
    src = str(tmp_path / 'src.mp4')
    subprocess.check_call(
        ['ffmpeg', '-v', 'error', '-y',
         '-f', 'lavfi', '-i', 'testsrc=size=64x64:rate=24:duration=1',
         '-f', 'lavfi', '-i', 'sine=frequency=440:duration=1',
         '-c:v', 'libx264', '-c:a', 'aac', '-shortest', src])

    reader = VideoReader(src)
    frames = []
    f = reader.get_frame()
    while f is not None:
        frames.append(f)
        f = reader.get_frame()
    audio = reader.get_audio()
    fps = reader.get_fps()
    reader.close()
    assert audio == src and len(frames) > 0

    out = str(tmp_path / 'out.mp4')
    writer = make_video_writer(out, 64, 64, fps, audio)
    assert isinstance(writer, VideoWriter)
    for f in frames:
        writer.write_frame(f)
    writer.close()

    meta = subprocess.check_output(
        ['ffprobe', '-v', 'error', '-show_streams', '-of', 'json', out])
    import json
    streams = json.loads(meta)['streams']
    assert any(s['codec_type'] == 'audio' for s in streams), streams
