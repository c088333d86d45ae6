"""Full-size stage-III joint train-step throughput on one TPU chip.

The reference's dominant compute is training (1.6M + 500k + 150k iters
at 8 GPUs x batch 3-4, options/*.yml) but it publishes no speed numbers.
This bench measures the shipped CodeFormerJointModel step — the real
trainer (train/trainers.py), with on-the-fly idx_gt from the frozen
VQGAN, code CE + feat L2 + L1 + perceptual VGG19 + hinge GAN with the
adaptive d-weight, discriminator step and EMA — at 512x512 on synthetic
batches, sweeping the per-chip batch size until HBM runs out.

Timing: the trainer's optimize_parameters fetches its log_dict scalars
every iteration (exactly like real training), which over the axon
tunnel costs ~23 ms/step of pure link latency that a real host would
not pay — reported separately so the number can be read both ways.
"""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build_opt(batch: int, img: int = 512, mixed: str = None,
              accum: int = 1, remat: bool = False):
    connect = [s for s in ('32', '64', '128', '256') if int(s) < img]
    return {
        'name': 'bench_train_step', 'manual_seed': 0, 'num_devices': 1,
        'is_train': True, 'mixed_precision': mixed,
        'datasets': {'train': {'in_size': img, 'gt_size': img,
                               'batch_size_per_gpu': batch}},
        'path': {'models': '/tmp/bench_train/models',
                 'training_states': '/tmp/bench_train/states',
                 'experiments_root': '/tmp/bench_train'},
        'model_type': 'CodeFormerJointModel',
        # shipped stage-III topology (options/CodeFormer_stage3.yml);
        # img != 512 (CPU smoke only) shrinks latent_size accordingly
        'network_g': {'type': 'CodeFormer', 'dim_embd': 512, 'n_head': 8,
                      'n_layers': 9, 'codebook_size': 1024,
                      'img_size': img, 'latent_size': (img // 32) ** 2,
                      'connect_list': connect,
                      'fix_modules': ['quantize', 'generator']},
        'network_vqgan': {'type': 'VQAutoEncoder', 'img_size': img,
                          'nf': 64, 'ch_mult': [1, 2, 2, 4, 4, 8],
                          'quantizer': 'nearest', 'codebook_size': 1024},
        'network_d': {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 64},
        'train': {
            'accum_steps': accum,
            'remat': remat,
            'total_iter': 150000, 'warmup_iter': -1, 'ema_decay': 0.997,
            'use_hq_feat_loss': True, 'feat_loss_weight': 1.0,
            'cross_entropy_loss': True, 'entropy_loss_weight': 0.5,
            'scale_adaptive_gan_weight': 0.8,
            'perceptual_opt': {'type': 'LPIPSLoss', 'loss_weight': 1.0,
                               'use_input_norm': True, 'range_norm': True},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'hinge',
                        'loss_weight': 1.0},
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0},
            'optim_g': {'type': 'Adam', 'lr': 5e-5, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 5e-5, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepRestartLR',
                          'milestones': [400000], 'gamma': 0.5},
        },
    }


def _patch_random_vgg():
    """No network egress: if the torchvision VGG16 weights are absent,
    run the LPIPS net with random params — identical FLOPs/memory, so
    the throughput number is unchanged (loss values are meaningless,
    which a speed bench doesn't care about)."""
    import os
    import codeformer_tpu.train.perceptual as perc
    if os.path.exists(perc.VGG16_WEIGHTS):
        return
    def _rand(path, what):
        import jax
        import jax.numpy as jnp
        from codeformer_tpu.models.vgg import VGGFeatureExtractor
        net = VGGFeatureExtractor(
            layer_name_list=perc.LPIPS_LAYERS_VGG16, vgg_type='vgg16',
            use_input_norm=False, range_norm=False)
        return net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    perc._load_vgg_params = _rand
    print('(VGG16 weights absent -> random-init LPIPS net: same compute, '
          'meaningless loss values)', flush=True)


def bench_batch(batch: int, img: int, iters: int,
                mixed: str = None, accum: int = 1,
                remat: bool = False) -> float:
    import jax
    from codeformer_tpu.train.trainers import build_model

    model = build_model(build_opt(batch, img, mixed, accum, remat))
    rng = np.random.default_rng(0)
    feed = {
        'in': rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32),
        'gt': rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32),
    }
    model.feed_data(feed)
    for i in range(1, 3):  # compile (full + EMA paths) + warm the link
        model.optimize_parameters(i)
    float(np.asarray(model.state.step))
    # steps now run fully async (metrics fetch is lazy) — the timed loop
    # must end on a scalar FETCH of the last state: block_until_ready
    # does not block over the axon tunnel (docs/roofline.md)
    t0 = time.perf_counter()
    for i in range(3, 3 + iters):
        model.optimize_parameters(i)
    float(np.asarray(model.state.step))
    dt = (time.perf_counter() - t0) / iters
    tag = (f'B={batch}' + (f' accum={accum}' if accum > 1 else '')
           + (' remat' if remat else ''))
    print(f'{tag}: {dt * 1000:8.1f} ms/iter '
          f'({batch / dt:6.2f} faces/s trained; steps dispatch async, '
          f'no per-iter log fetch)', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--img', type=int, default=512)
    p.add_argument('--iters', type=int, default=6)
    p.add_argument('--batches', type=int, nargs='+', default=[1, 2, 4, 8])
    p.add_argument('--mixed', type=str, default=None, choices=['bf16'],
                   help='mixed_precision compute dtype (params stay f32)')
    p.add_argument('--accum', type=int, default=1,
                   help='gradient-accumulation microbatch count: the '
                        'step scans --accum microbatches of B/accum '
                        '(trainers.py accum_steps) — the fixed-memory '
                        'route to batches that OOM monolithically')
    p.add_argument('--remat', action='store_true',
                   help='activation rematerialization (train: remat): '
                        'ResBlocks + perceptual taps recompute in '
                        'backward — exact grads, ~1/3 extra fwd FLOPs, '
                        'several-x lower activation watermark')
    args = p.parse_args()

    import os
    import jax
    if os.environ.get('JAX_PLATFORMS', '').lower() == 'cpu':
        # env vars alone still let jax probe the axon plugin (and hang
        # ~25 min per attempt if the tunneled worker is down); the
        # config update restricts backend init to cpu outright
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_platform_name', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    _patch_random_vgg()

    for b in args.batches:
        try:
            bench_batch(b, args.img, args.iters, args.mixed,
                        args.accum, args.remat)
        except Exception as e:
            print(f'B={b} failed: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)
            break


if __name__ == '__main__':
    main()
