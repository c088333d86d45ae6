"""Host-side data-pipeline throughput: blind-degradation synthesis rate.

Training scale on TPU is bounded by two independent rates: the chips'
step rate (docs/roofline.md, "training-step throughput") and the host's
ability to synthesize degraded 512^2 faces (blur -> downsample -> noise
-> JPEG -> upsample, FFHQBlindDataset — the reference does the same work
in basicsr/data/ffhq_blind_dataset.py:109-164 behind a torch DataLoader).
One v5e chip trains ~0.8 faces/s (bf16 B=1); a v5e-256 pod wants ~200
faces/s from its hosts. This bench measures what one host delivers as a
function of worker count, so pod deployments can size
num_worker_per_gpu / hosts-per-chip before burning pod time.

Pure host bench: no TPU, no jax — cv2 + the fused native degrade kernel
(native/degrade.cpp), exactly what the real loader runs per item.
"""
import argparse
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# the data package's import chain reaches jax; this bench is pure-host,
# so restrict backend discovery to CPU outright (the axon TPU plugin
# probes its tunnel at init and hangs ~25 min if the worker is down)
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_platform_name', 'cpu')


def make_fixture_dir(n: int, size: int) -> str:
    import cv2
    root = tempfile.mkdtemp(prefix='bench_loader_ffhq_')
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(root, f'{i:05d}.png'), img)
    return root


def dataset_opt(root: str, size: int, batch: int, workers: int):
    # the shipped stage-II/III degradation recipe (options/*.yml)
    return {
        'name': 'bench', 'type': 'FFHQBlindDataset', 'dataroot_gt': root,
        'io_backend': {'type': 'disk'}, 'in_size': size, 'gt_size': size,
        'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5],
        'use_hflip': True, 'use_corrupt': True,
        'blur_kernel_size': 41, 'kernel_list': ['iso', 'aniso'],
        'kernel_prob': [0.5, 0.5], 'blur_sigma': [0.1, 10],
        'downsample_range': [1, 12], 'noise_range': [0, 15],
        'jpeg_range': [30, 100],
        'batch_size_per_gpu': batch, 'num_worker_per_gpu': workers,
        'num_prefetch_queue': 8, 'dataset_enlarge_ratio': 1000,
    }


def bench(root: str, size: int, batch: int, workers: int,
          seconds: float) -> float:
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader

    opt = dataset_opt(root, size, batch, workers)
    ds = build_dataset(opt)
    loader = build_dataloader(ds, opt)
    it = iter(loader)
    for _ in range(4):  # spin up workers / fill the prefetch queue
        next(it)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += batch
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f'workers={workers:3d}: {rate:8.1f} img/s '
          f'({n} imgs in {dt:.1f}s, batch {batch})', flush=True)
    return rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--size', type=int, default=512)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--seconds', type=float, default=10.0)
    p.add_argument('--workers', type=int, nargs='+',
                   default=[1, 2, 4, 8, 16, 32])
    p.add_argument('--fixtures', type=int, default=32)
    args = p.parse_args()

    root = make_fixture_dir(args.fixtures, args.size)
    ncpu = os.cpu_count()
    print(f'host: {ncpu} CPUs; {args.size}x{args.size} images, '
          f'full blind-degradation recipe', flush=True)
    rates = {}
    for w in args.workers:
        rates[w] = bench(root, args.size, args.batch, w, args.seconds)
    best_w = max(rates, key=rates.get)
    per_chip = 0.79  # bf16 B=1 measured step rate (docs/roofline.md)
    print(f'best: {rates[best_w]:.1f} img/s at {best_w} workers '
          f'-> feeds ~{rates[best_w] / per_chip:.0f} v5e chips training '
          f'bf16 at B=1 ({per_chip} faces/s/chip)', flush=True)


if __name__ == '__main__':
    main()
