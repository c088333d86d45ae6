#!/usr/bin/env python
"""VQGAN round-trip reconstruction check (reference:
scripts/inference_vqgan.py) — encode->quantize->decode a folder of images
and dump the reconstructions; the de facto codebook-health test."""
import os
import sys
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..')))

import argparse
import glob
import os

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--test_path', type=str,
                        default='inputs/cropped_faces')
    parser.add_argument('-o', '--save_root', type=str,
                        default='./results/vqgan_rec')
    parser.add_argument('--codebook_size', type=int, default=1024)
    parser.add_argument('--ckpt_path', type=str,
                        default='./experiments/pretrained_models/vqgan/'
                                'vqgan_code1024.pth')
    parser.add_argument('--random-init', action='store_true')
    parser.add_argument('--batch', type=int, default=4)
    args = parser.parse_args()
    os.makedirs(args.save_root, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from codeformer_tpu.models import VQAutoEncoder
    from codeformer_tpu.utils.checkpoint import (init_params_fast,
                                                 load_checkpoint)
    from codeformer_tpu.utils.misc import setup_jax

    setup_jax()
    model = VQAutoEncoder(codebook_size=args.codebook_size)
    if os.path.exists(args.ckpt_path):
        variables = load_checkpoint(args.ckpt_path)
    elif args.random_init:
        variables = init_params_fast(
            model, jnp.zeros((1, 512, 512, 3)))
    else:
        raise SystemExit(f'checkpoint not found: {args.ckpt_path} '
                         f'(use --random-init for a smoke test)')

    @jax.jit
    def rec(x):
        out, _, _ = model.apply(variables, x)
        out = jnp.clip(out, -1, 1)
        return jnp.round((out + 1) * 127.5).astype(jnp.uint8)

    paths = sorted(glob.glob(os.path.join(args.test_path, '*.[jp][pn]g')))
    for i in range(0, len(paths), args.batch):
        chunk = paths[i:i + args.batch]
        imgs = [cv2.imread(p)[..., ::-1].astype(np.float32) / 127.5 - 1
                for p in chunk]
        out = np.asarray(rec(jnp.asarray(np.stack(imgs))))
        for p, im in zip(chunk, out):
            name = os.path.basename(p)
            cv2.imwrite(os.path.join(args.save_root, name), im[..., ::-1])
            print(f'reconstructed {name}')
    print(f'Results saved in {args.save_root}')


if __name__ == '__main__':
    main()
