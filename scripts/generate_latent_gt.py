#!/usr/bin/env python
"""Precompute ground-truth codebook indices for stage-II/III training.

Equivalent of the reference scripts/generate_latent_gt.py: for each FFHQ
image (orig + hflip) run the HQ VQGAN encoder+quantizer and store the 16x16
index map. Output: latent_gt_code{K}.pth-compatible dict saved as msgpack
({'orig': {name: (16,16) int32}, 'hflip': {...}}) plus a torch .pth when
torch is available (for reference-format interchange). Images are batched
through one jit graph instead of the reference's per-image loop.
"""
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
                        default='datasets/ffhq/ffhq_512')
    parser.add_argument('-o', '--save_root', type=str,
                        default='./experiments/pretrained_models/vqgan')
    parser.add_argument('--codebook_size', type=int, default=1024)
    parser.add_argument('--ckpt_path', type=str,
                        default='./experiments/pretrained_models/vqgan/'
                                'vqgan_code1024.pth')
    parser.add_argument('--batch', type=int, default=8)
    args = parser.parse_args()
    os.makedirs(args.save_root, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from codeformer_tpu.models import VQAutoEncoder
    from codeformer_tpu.ops.vq import nearest_code_indices
    from codeformer_tpu.utils.checkpoint import load_checkpoint
    from codeformer_tpu.utils.misc import setup_jax

    setup_jax()
    model = VQAutoEncoder(codebook_size=args.codebook_size)
    variables = load_checkpoint(args.ckpt_path)
    params = variables['params']

    @jax.jit
    def encode(x):
        z, _ = model.apply({'params': params}, x,
                           method=lambda m, v: m.encoder(v))
        emb = params['quantize']['embedding']
        idx = nearest_code_indices(z.reshape(-1, emb.shape[1]), emb)
        return idx.reshape(x.shape[0], z.shape[1], z.shape[2])

    paths = sorted(glob.glob(os.path.join(args.test_path, '*.[jp][pn]g')))
    latent = {'orig': {}, 'hflip': {}}
    for flip_key in ('orig', 'hflip'):
        for i in range(0, len(paths), args.batch):
            chunk = paths[i:i + args.batch]
            imgs = []
            for p in chunk:
                img = cv2.imread(p)
                if flip_key == 'hflip':
                    img = cv2.flip(img, 1)
                imgs.append(img[..., ::-1].astype(np.float32) / 127.5 - 1)
            x = jnp.asarray(np.stack(imgs))
            idx = np.asarray(encode(x)).astype(np.int32)
            for p, m in zip(chunk, idx):
                name = os.path.basename(p)[:-4]
                latent[flip_key][name] = m
                print(name, flip_key, m.shape)

    out_base = os.path.join(args.save_root,
                            f'latent_gt_code{args.codebook_size}')
    from codeformer_tpu.utils.checkpoint import save_params
    save_params(latent, out_base + '.msgpack')
    try:
        import torch
        torch.save({k: {n: torch.from_numpy(v) for n, v in d.items()}
                    for k, d in latent.items()}, out_base + '.pth')
    except ImportError:
        pass
    print(f'\nLatent GT code saved under {args.save_root}')


if __name__ == '__main__':
    main()
