"""Face colorization CLI — parity with reference inference_colorization.py
(512x512 aligned gray faces, w=0, adain=True, connect ['32','64','128']),
batched on device.
"""
from __future__ import annotations

import argparse
import os

import cv2

from codeformer_tpu.pipeline import CodeFormerRestorer
from codeformer_tpu.utils import img_util
from .common import (add_dtype_flag, list_inputs, resolve_checkpoint,
                     resolve_dtype)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input_path', type=str,
                   default='./inputs/gray_faces',
                   help='Input image or folder. Default: inputs/gray_faces')
    p.add_argument('-o', '--output_path', type=str, default=None,
                   help='Output folder. Default: results/<input_name>')
    p.add_argument('--suffix', type=str, default=None,
                   help='Suffix of the restored faces. Default: None')
    p.add_argument('--checkpoint', type=str, default=None)
    p.add_argument('--random-init', action='store_true')
    p.add_argument('--batch', type=int, default=8)
    add_dtype_flag(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    print('[NOTE] The input face images should be aligned and cropped to a '
          'resolution of 512x512.')
    input_img_list, result_root, _ = list_inputs(
        args.input_path, None, default_root='test_colorization_img')
    if args.output_path is not None:
        result_root = args.output_path
    if not input_img_list:
        raise FileNotFoundError('No input image is found.')

    ckpt = resolve_checkpoint(args.checkpoint, 'colorization',
                              args.random_init)
    restorer = CodeFormerRestorer(
        checkpoint=ckpt, dim_embd=512, codebook_size=1024, n_head=8,
        n_layers=9, connect_list=('32', '64', '128'),
        batch_buckets=(1, 2, 4, args.batch),
        dtype=resolve_dtype(args.dtype))

    faces, names = [], []
    for i, img_path in enumerate(input_img_list):
        print(f'[{i + 1}/{len(input_img_list)}] Processing: '
              f'{os.path.basename(img_path)}')
        img = cv2.imread(img_path)
        assert img.shape[:2] == (512, 512), \
            'Input resolution must be 512x512 for colorization.'
        faces.append(img)
        names.append(os.path.splitext(os.path.basename(img_path))[0])

    # w fixed to 0 (no stage-III for colorization), adain on
    restored = restorer.restore_batch(faces, w=0.0, adain=True)
    for name, out in zip(names, restored):
        if args.suffix is not None:
            name = f'{name}_{args.suffix}'
        img_util.imwrite(out, os.path.join(result_root, f'{name}.png'))

    print(f'\nAll results are saved in {result_root}')


if __name__ == '__main__':
    main()
