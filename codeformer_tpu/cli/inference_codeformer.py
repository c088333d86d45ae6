"""Face restoration CLI — flag/output parity with the reference
inference_codeformer.py, batched TPU execution underneath.

Differences by design: faces/frames are batched through one jit graph
instead of the reference's per-face Python loop; `--checkpoint` /
`--random-init` extend the surface because this environment has no
network egress for weight downloads.
"""
from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

from codeformer_tpu.pipeline import CodeFormerRestorer
from codeformer_tpu.utils import img_util
from .common import (add_dtype_flag, list_inputs, resolve_checkpoint,
                     resolve_dtype)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input_path', type=str,
                   default='./inputs/whole_imgs',
                   help='Input image, video or folder. '
                        'Default: inputs/whole_imgs')
    p.add_argument('-o', '--output_path', type=str, default=None,
                   help='Output folder. Default: results/<input_name>_<w>')
    p.add_argument('-w', '--fidelity_weight', type=float, default=0.5,
                   help='Balance the quality and fidelity. Default: 0.5')
    p.add_argument('-s', '--upscale', type=int, default=2,
                   help='The final upsampling scale of the image. '
                        'Default: 2')
    p.add_argument('--has_aligned', action='store_true',
                   help='Input are cropped and aligned faces.')
    p.add_argument('--only_center_face', action='store_true',
                   help='Only restore the center face.')
    p.add_argument('--draw_box', action='store_true',
                   help='Draw the bounding box for the detected faces.')
    p.add_argument('--detection_model', type=str,
                   default='retinaface_resnet50',
                   help='Face detector: retinaface_resnet50, '
                        'retinaface_mobile0.25, YOLOv5l, YOLOv5n')
    p.add_argument('--bg_upsampler', type=str, default='None',
                   help='Background upsampler. Optional: realesrgan')
    p.add_argument('--face_upsample', action='store_true',
                   help='Face upsampler after enhancement.')
    p.add_argument('--bg_tile', type=int, default=400,
                   help='Tile size for background sampler. Default: 400')
    p.add_argument('--suffix', type=str, default=None,
                   help='Suffix of the restored faces.')
    p.add_argument('--save_video_fps', type=float, default=None,
                   help='Frame rate for saving video.')
    p.add_argument('--checkpoint', type=str, default=None,
                   help='Path to weights (.pth or .msgpack). Default: '
                        'weights/CodeFormer/codeformer.pth')
    p.add_argument('--random-init', action='store_true',
                   help='Run with random weights (smoke testing only).')
    p.add_argument('--batch', type=int, default=8,
                   help='Max faces per device batch. Default: 8')
    p.add_argument('--compositor', type=str, default='xla',
                   choices=['cv2', 'xla'],
                   help='Paste-back compositor: cv2 (pixel parity with '
                        'the reference) or xla (on-device, batched).')
    p.add_argument('--fused_pipeline', nargs='?', const='on',
                   default='auto', choices=['auto', 'on', 'off'],
                   help='Fused device-resident pipeline '
                        '(pipeline/device_pipeline.py): frames/images '
                        'stay in HBM between detect/align/restore/parse/'
                        'composite. auto (default): use it whenever the '
                        'guards pass (retinaface detector, no bg/face '
                        'upsampler, no draw_box, uniform-size non-gray '
                        'folder images), else fall back to the classic '
                        'per-stage path. on: require it (error if '
                        'ineligible). off: always classic.')
    p.add_argument('--parse_res', type=int, default=256,
                   choices=[256, 512],
                   help='ParseNet evaluation resolution in the fused '
                        'pipeline. 512 = strict reference semantics '
                        '(the parser sees the full restored face); 256 '
                        '(default) runs parser + mask shaping at half '
                        'res and upsamples the soft blend mask — '
                        '~3.5x cheaper parse stage, bounded boundary '
                        'deviation (device_pipeline.py). The classic '
                        'per-stage path always parses at 512.')
    add_dtype_flag(p)
    p.add_argument('--quant', type=str, default=None,
                   choices=['int8'],
                   help='Quantized serving path for the restorer convs '
                        '(int8 on the MXU, ~1.5x conv speedup; slight '
                        'quality delta — see tests/test_int8.py). '
                        'Default: bf16.')
    p.add_argument('--profile', action='store_true',
                   help='Print per-stage timings at the end (use '
                        'CODEFORMER_TPU_TRACE=<dir> for a device trace).')
    return p


def run_aligned(args, input_img_list, result_root, restorer):
    """--has_aligned path: inputs are 512x512 cropped faces; restore all of
    them in device batches (reference loop: inference_codeformer.py:180-213,
    de-Python-looped)."""
    faces, grays, names = [], [], []
    for i, img_path in enumerate(input_img_list):
        basename = os.path.splitext(os.path.basename(img_path))[0]
        print(f'[{i + 1}/{len(input_img_list)}] Processing: '
              f'{os.path.basename(img_path)}')
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        img = cv2.resize(img, (512, 512), interpolation=cv2.INTER_LINEAR)
        gray = img_util.is_gray(img, threshold=10)
        if gray:
            print('Grayscale input: True')
        faces.append(img)
        grays.append(gray)
        names.append(basename)

    restored = restorer.restore_batch(faces, w=args.fidelity_weight,
                                      adain=True)
    for face, gray, name, out in zip(faces, grays, names, restored):
        if gray:  # keep the input's tone (face_restoration_helper.py:364-369)
            out = img_util.adain_color_transfer(img_util.bgr2gray3(out),
                                                face)
        save_name = f'{name}.png'
        if args.suffix is not None:
            save_name = f'{name}_{args.suffix}.png'
        img_util.imwrite(out, os.path.join(result_root, 'restored_faces',
                                           save_name))


def main(argv=None):
    args = build_parser().parse_args(argv)
    w = args.fidelity_weight
    input_img_list, result_root, input_video = list_inputs(
        args.input_path, w)
    if args.output_path is not None:
        result_root = args.output_path
    video_meta = None
    if input_video:
        # lazy frame stream: the fused pipeline consumes it chunk by
        # chunk (bounded memory for arbitrarily long videos); the
        # classic path materializes it
        input_img_list, video_meta = _open_video_stream(args.input_path)
    if not input_img_list and not input_video:
        raise FileNotFoundError(
            'No input image/video is found...\n'
            '\tNote that --input_path for video should end with '
            '.mp4|.mov|.avi')

    ckpt = resolve_checkpoint(args.checkpoint, 'restoration',
                              args.random_init)
    restorer = CodeFormerRestorer(
        checkpoint=ckpt, dim_embd=512, codebook_size=1024, n_head=8,
        n_layers=9, connect_list=('32', '64', '128', '256'),
        batch_buckets=(1, 2, 4, args.batch), quant=args.quant,
        dtype=resolve_dtype(args.dtype))

    import contextlib
    trace_dir = os.environ.get('CODEFORMER_TPU_TRACE')
    trace_ctx = contextlib.nullcontext()
    if args.profile and trace_dir:
        from codeformer_tpu.utils.profiler import jax_trace
        trace_ctx = jax_trace(trace_dir)
    with trace_ctx:
        if args.has_aligned:
            run_aligned(args, input_img_list, result_root, restorer)
        else:
            from .whole_image import run_whole_images
            run_whole_images(args, input_img_list, result_root, restorer,
                             input_video, video_meta=video_meta)
    if args.profile:
        from codeformer_tpu.utils.profiler import TIMER
        print('\n' + TIMER.report())

    print(f'\nAll results are saved in {result_root}')


def _open_video_stream(path):
    """Lazy frame generator + meta: ffmpeg pipe if available, else
    cv2.VideoCapture. The first frame is decoded eagerly so an empty or
    unreadable video fails here, not mid-pipeline; the rest stream on
    demand (the reference decodes the entire video into RAM up front,
    inference_codeformer.py:90-103 — that caps video length at host
    memory, so the TPU build streams instead)."""
    from codeformer_tpu.utils.video_util import VideoReader, have_ffmpeg
    if have_ffmpeg():
        reader = VideoReader(path)
        meta = {'fps': reader.get_fps(), 'audio': reader.get_audio()}
        first = reader.get_frame()
        if first is None:
            reader.close()
            raise FileNotFoundError(f'no decodable frames in {path}')

        def gen():
            frame = first
            while frame is not None:
                yield frame
                frame = reader.get_frame()
            reader.close()

        return gen(), meta
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f'cannot open video {path} (no ffmpeg and '
                           f'cv2.VideoCapture failed)')
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    ok, first = cap.read()
    if not ok:
        cap.release()
        raise FileNotFoundError(f'no decodable frames in {path}')

    def gen():
        frame, good = first, True
        while good:
            yield frame
            good, frame = cap.read()
        cap.release()

    # cv2 cannot demux audio, but the source path is still recorded: the
    # ffmpeg writer muxes from it with '-map 1:a?' (missing audio is
    # non-fatal), and the cv2 fallback writer warns that audio is dropped
    return gen(), {'fps': fps, 'audio': path}


if __name__ == '__main__':
    main()
