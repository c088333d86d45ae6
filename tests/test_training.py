"""End-to-end training smoke tests: tiny configs, synthetic FFHQ-like data,
a few optimizer steps per stage trainer + save/resume round trip."""
import os
import os.path as osp

import cv2
import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('ffhq64')
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        cv2.imwrite(str(root / f'{i:05d}.png'), img)
    return str(root)


def _base_opt(tmp_path, name, dataset_root):
    return {
        'name': name,
        'manual_seed': 0,
        'num_devices': 1,  # single-device (the DP test overrides this)
        'is_train': True,
        'datasets': {'train': {
            'name': 'tiny', 'type': 'FFHQBlindDataset',
            'dataroot_gt': dataset_root, 'io_backend': {'type': 'disk'},
            'in_size': 64, 'gt_size': 64, 'use_hflip': True,
            'use_corrupt': True, 'blur_kernel_size': 7,
            'kernel_list': ['iso', 'aniso'], 'kernel_prob': [0.5, 0.5],
            'blur_sigma': [1, 5], 'downsample_range': [2, 8],
            'noise_range': [0, 10], 'jpeg_range': [60, 90],
            'batch_size_per_gpu': 2, 'num_worker_per_gpu': 1,
            'dataset_enlarge_ratio': 1,
        }},
        'path': {'models': str(tmp_path / 'models'),
                 'training_states': str(tmp_path / 'states'),
                 'experiments_root': str(tmp_path)},
        'train': {
            'total_iter': 4, 'warmup_iter': -1, 'ema_decay': 0.9,
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 1e-4, 'weight_decay': 0,
                        'betas': [0.9, 0.99]},
            'scheduler': {'type': 'CosineAnnealingRestartLR',
                          'periods': [100], 'restart_weights': [1],
                          'eta_min': 1e-5},
        },
    }


TINY_VQGAN = {'type': 'VQAutoEncoder', 'img_size': 64, 'nf': 32,
              'ch_mult': [1, 2, 4], 'quantizer': 'nearest',
              'codebook_size': 32, 'emb_dim': 16}
TINY_CF = {'type': 'CodeFormer', 'dim_embd': 32, 'n_head': 4,
           'n_layers': 2, 'codebook_size': 32, 'latent_size': 256,
           'connect_list': ['32', '64'],
           'fix_modules': ['quantize', 'generator'],
           'img_size': 64, 'nf': 32, 'ch_mult': [1, 2, 4], 'emb_dim': 16}


def _make_batches(loader, n):
    it = iter(loader)
    return [next(it) for _ in range(n)]


@pytest.mark.slow
def test_vqgan_stage1_trains(tmp_path, tiny_dataset):
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage1_smoke', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['net_d_start_iter'] = 2
    # no perceptual_opt: VGG weights absent in this environment

    model = build_model(opt)
    ds = build_dataset(opt['datasets']['train'])
    loader = build_dataloader(ds, opt['datasets']['train'])
    losses = []
    for i, batch in enumerate(_make_batches(loader, 4), start=1):
        model.feed_data(batch)
        model.optimize_parameters(i)
        losses.append(model.log_dict['l_g_total'])
    assert all(np.isfinite(v) for v in losses), losses
    # d loss should be active after net_d_start_iter
    assert model.log_dict['l_d_real'] > 0

    # save / resume round trip
    model.save(epoch=0, current_iter=4)
    state_file = osp.join(opt['path']['training_states'], '4.state')
    assert osp.exists(state_file)
    model2 = build_model(opt)
    epoch, it = model2.resume_training(state_file)
    assert it == 4
    # compare one leaf exactly
    import jax
    l1 = jax.tree.leaves(model.state.params_g)
    l2 = jax.tree.leaves(model2.state.params_g)
    np.testing.assert_array_equal(np.asarray(l1[0]), np.asarray(l2[0]))


def test_codeformer_stage2_trains(tmp_path, tiny_dataset):
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage2_smoke', tiny_dataset)
    opt['model_type'] = 'CodeFormerIdxModel'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    opt['train']['use_hq_feat_loss'] = True
    opt['train']['cross_entropy_loss'] = True

    model = build_model(opt)
    ds = build_dataset(opt['datasets']['train'])
    loader = build_dataloader(ds, opt['datasets']['train'])
    logs = []
    for i, batch in enumerate(_make_batches(loader, 3), start=1):
        model.feed_data(batch)
        model.optimize_parameters(i)
        logs.append(dict(model.log_dict))
    assert np.isfinite(logs[-1]['l_g_total'])
    assert 'cross_entropy_loss' in logs[-1]
    # frozen modules must not move
    import jax
    g0 = model.state.params_g['generator']
    # run one more step and compare
    before = np.asarray(jax.tree.leaves(g0)[0]).copy()
    batch = _make_batches(loader, 1)[0]
    model.feed_data(batch)
    model.optimize_parameters(4)
    after = np.asarray(jax.tree.leaves(
        model.state.params_g['generator'])[0])
    np.testing.assert_array_equal(before, after)


@pytest.mark.slow
def test_codeformer_stage3_joint_trains(tmp_path, tiny_dataset):
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage3_smoke', tiny_dataset)
    opt['model_type'] = 'CodeFormerJointModel'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['scale_adaptive_gan_weight'] = 0.1
    ds_opt = opt['datasets']['train']
    ds_opt['type'] = 'FFHQBlindJointDataset'
    ds_opt.update(blur_sigma_large=[1, 15], downsample_range_large=[4, 16],
                  noise_range_large=[0, 20], jpeg_range_large=[30, 80])

    model = build_model(opt)
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt)
    for i, batch in enumerate(_make_batches(loader, 3), start=1):
        model.feed_data(batch)
        model.optimize_parameters(i)
    log = model.log_dict
    assert np.isfinite(log['l_g_total'])
    assert 'd_weight' in log and np.isfinite(log['d_weight'])


def test_vqgan_gumbel_trains(tmp_path, tiny_dataset):
    """Stage-I with the Gumbel quantizer (temperature-annealed)."""
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage1_gumbel_smoke', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN, quantizer='gumbel')
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['net_d_start_iter'] = 1

    model = build_model(opt)
    ds = build_dataset(opt['datasets']['train'])
    loader = build_dataloader(ds, opt['datasets']['train'])
    for i, batch in enumerate(_make_batches(loader, 2), start=1):
        model.feed_data(batch)
        model.optimize_parameters(i)
    assert np.isfinite(model.log_dict['l_g_total'])


@pytest.mark.slow
def test_trainer_auto_data_parallel(tmp_path, tiny_dataset):
    """On a multi-device backend, trainers shard the batch automatically
    and produce the same result as a single-device run."""
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    assert len(jax.devices()) == 8  # conftest virtual devices

    def run(num_devices, name, accum=1):
        opt = _base_opt(tmp_path, name, tiny_dataset)
        opt['model_type'] = 'VQGANModel'
        opt['datasets']['train']['seed'] = 123  # deterministic degradations
        opt['num_devices'] = num_devices
        opt['network_g'] = dict(TINY_VQGAN)
        opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3,
                            'ndf': 32, 'n_layers': 2}
        opt['train']['net_d_start_iter'] = 0
        opt['train']['accum_steps'] = accum
        # SGD-free comparison: losses only (one step)
        model = build_model(opt)
        ds = build_dataset(opt['datasets']['train'])
        loader = build_dataloader(ds, opt['datasets']['train'])
        batch = _make_batches(loader, 1)[0]
        model.feed_data(batch)
        model.optimize_parameters(1)
        return model.log_dict['l_g_total'], batch

    # identical dataset order (epoch-seeded sampler) -> identical batch
    loss_multi, _ = run(8, 'dp_multi')
    loss_single, _ = run(1, 'dp_single')
    np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-4)
    # mesh x gradient accumulation compose: sharded microbatches, same
    # full-batch loss (the generator path is exact under accumulation)
    loss_accum, _ = run(2, 'dp_accum', accum=2)
    np.testing.assert_allclose(loss_accum, loss_single, rtol=1e-4)


@pytest.mark.slow
def test_joint_trains_mixed_precision_bf16(tmp_path, tiny_dataset):
    """mixed_precision: bf16 — the stage-III joint step runs with bf16
    activations while params/EMA/optimizer state stay f32 and every
    logged loss is finite. (The reference trains pure fp32; bf16 compute
    is the TPU-native policy — see BaseTrainer.)"""
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage3_bf16_smoke', tiny_dataset)
    opt['model_type'] = 'CodeFormerJointModel'
    opt['mixed_precision'] = 'bf16'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['scale_adaptive_gan_weight'] = 0.1
    ds_opt = opt['datasets']['train']
    ds_opt['type'] = 'FFHQBlindJointDataset'
    ds_opt.update(blur_sigma_large=[1, 15], downsample_range_large=[4, 16],
                  noise_range_large=[0, 20], jpeg_range_large=[30, 80])

    model = build_model(opt)
    assert model.compute_dtype == jnp.bfloat16
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt)
    for i, batch in enumerate(_make_batches(loader, 2), start=1):
        model.feed_data(batch)
        model.optimize_parameters(i)
    log = model.log_dict
    assert all(np.isfinite(v) for v in log.values()), log
    # master params, EMA and optimizer moments all stay f32
    for tree in (model.state.params_g, model.state.params_g_ema,
                 model.state.params_d):
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree.leaves(tree))
    assert all(leaf.dtype in (jnp.float32, jnp.int32)
               for leaf in jax.tree.leaves(model.state.opt_g))


def test_accum_microbatches_helper_exact():
    """_accum_microbatches averages per-microbatch grads to the exact
    full-batch gradient of a mean-reduced loss (up to f32 assoc)."""
    import jax
    import jax.numpy as jnp
    from codeformer_tpu.train.trainers import _accum_microbatches

    w = jnp.linspace(-1, 1, 8)
    x = jnp.arange(48, dtype=jnp.float32).reshape(6, 8) / 10
    y = jnp.arange(6, dtype=jnp.float32)

    def loss(w, xb, yb):
        return jnp.mean((xb @ w - yb) ** 2)

    g_full = jax.grad(loss)(w, x, y)
    for n in (2, 3, 6):
        carry, (g_acc, l_acc) = _accum_microbatches(
            lambda c, mb, i: (c + 1, jax.value_and_grad(loss)(
                w, mb['x'], mb['y'])[::-1]),
            {'x': x, 'y': y}, n, carry=jnp.int32(0))
        assert int(carry) == n  # carry chains through the scan
        np.testing.assert_allclose(np.asarray(g_acc),
                                   np.asarray(g_full), rtol=1e-6)
        np.testing.assert_allclose(
            float(l_acc), float(loss(w, x, y)), rtol=1e-6)
    # non-divisible batch -> loud error
    with pytest.raises(ValueError, match='accum_steps'):
        _accum_microbatches(
            lambda c, mb, i: (c, jnp.mean(mb['x'])), {'x': x}, 4)


def _params_match_fraction(tree_a, tree_b, atol=1e-6, rtol=1e-4):
    """Fraction of param entries equal within tolerance. Step-1 Adam is
    ~sign(grad)*lr, so entries whose grads are at float-noise level flip
    sign under any reassociation — exact comparison is unsound, but a
    wrong accumulation (dropped/double-counted microbatch) flips a large
    share of signs everywhere."""
    import jax
    tot = ok = 0
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        a, b = np.asarray(a), np.asarray(b)
        ok += np.sum(np.abs(a - b) <= atol + rtol * np.abs(b))
        tot += a.size
    return ok / tot


def test_grad_accum_stage2_equivalence(tmp_path, tiny_dataset):
    """accum_steps=2 must reproduce the full-batch stage-II update: the
    accumulated grads of a mean-reduced loss average to the exact
    full-batch gradient, so the logged losses match tightly and the
    post-Adam params agree except at float-noise-gradient entries."""
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    def run(accum, name):
        opt = _base_opt(tmp_path, name, tiny_dataset)
        opt['model_type'] = 'CodeFormerIdxModel'
        opt['network_g'] = dict(TINY_CF)
        opt['network_vqgan'] = dict(TINY_VQGAN)
        opt['datasets']['train']['seed'] = 7
        opt['train']['accum_steps'] = accum
        model = build_model(opt)
        ds = build_dataset(opt['datasets']['train'])
        loader = build_dataloader(ds, opt['datasets']['train'])
        model.feed_data(_make_batches(loader, 1)[0])
        model.optimize_parameters(1)
        return model

    m1 = run(1, 'accum1')
    m2 = run(2, 'accum2')
    # identical logged losses and identical updated params
    for k, v in m1.log_dict.items():
        np.testing.assert_allclose(m2.log_dict[k], v, rtol=2e-5,
                                   atol=1e-6, err_msg=k)
    frac = _params_match_fraction(m1.state.params_g, m2.state.params_g)
    assert frac > 0.9, f'only {frac:.3f} of param entries match'


@pytest.mark.slow
def test_grad_accum_joint_gan(tmp_path, tiny_dataset):
    """Stage-III joint GAN step under accum_steps=2: the generator
    update (grads + adaptive d-weight from accumulated cotangents) must
    match the full-batch step; the discriminator differs only through
    its batchnorm microbatch statistics, so it is checked for finiteness
    and the d losses for closeness."""
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    def run(accum, name):
        opt = _base_opt(tmp_path, name, tiny_dataset)
        opt['model_type'] = 'CodeFormerJointModel'
        opt['network_g'] = dict(TINY_CF)
        opt['network_vqgan'] = dict(TINY_VQGAN)
        opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3,
                            'ndf': 32, 'n_layers': 2}
        opt['train']['scale_adaptive_gan_weight'] = 0.1
        opt['train']['net_d_start_iter'] = 0
        opt['train']['accum_steps'] = accum
        ds_opt = opt['datasets']['train']
        ds_opt['type'] = 'FFHQBlindJointDataset'
        ds_opt['seed'] = 7
        ds_opt.update(blur_sigma_large=[1, 15],
                      downsample_range_large=[4, 16],
                      noise_range_large=[0, 20],
                      jpeg_range_large=[30, 80])
        model = build_model(opt)
        ds = build_dataset(ds_opt)
        loader = build_dataloader(ds, ds_opt)
        model.feed_data(_make_batches(loader, 1)[0])
        model.optimize_parameters(1)
        return model

    m1 = run(1, 'jaccum1')
    m2 = run(2, 'jaccum2')
    assert all(np.isfinite(v) for v in m2.log_dict.values()), m2.log_dict
    np.testing.assert_allclose(m2.log_dict['d_weight'],
                               m1.log_dict['d_weight'], rtol=1e-3)
    np.testing.assert_allclose(m2.log_dict['l_g_total'],
                               m1.log_dict['l_g_total'], rtol=1e-4)
    frac = _params_match_fraction(m1.state.params_g, m2.state.params_g)
    assert frac > 0.9, f'only {frac:.3f} of param entries match'


@pytest.mark.slow
def test_staged_split_final_conv_anchor(tmp_path, tiny_dataset):
    """Staged-apply split with a TRAINABLE generator: the adaptive
    d-weight anchor is the generator's final conv (anchor_size=None),
    the split tail is the identity, and the accum=1 staged step must
    match the accum=2 two-full-pull step (which computes d_weight from
    post-accumulation anchor grads == the full-batch grads). The fuse
    anchor variant is covered by test_grad_accum_joint_gan."""
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    def run(accum, name):
        opt = _base_opt(tmp_path, name, tiny_dataset)
        opt['model_type'] = 'CodeFormerJointModel'
        opt['network_g'] = dict(TINY_CF, fix_modules=['quantize'])
        opt['network_vqgan'] = dict(TINY_VQGAN)
        opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3,
                            'ndf': 32, 'n_layers': 2}
        opt['train']['scale_adaptive_gan_weight'] = 0.1
        opt['train']['net_d_start_iter'] = 0
        opt['train']['accum_steps'] = accum
        ds_opt = opt['datasets']['train']
        ds_opt['type'] = 'FFHQBlindJointDataset'
        ds_opt['seed'] = 7
        ds_opt.update(blur_sigma_large=[1, 15],
                      downsample_range_large=[4, 16],
                      noise_range_large=[0, 20],
                      jpeg_range_large=[30, 80])
        model = build_model(opt)
        assert model._anchor_size is None  # final-conv anchor selected
        assert model._anchor[0] == 'generator'
        ds = build_dataset(ds_opt)
        loader = build_dataloader(ds, ds_opt)
        model.feed_data(_make_batches(loader, 1)[0])
        model.optimize_parameters(1)
        return model

    m1 = run(1, 'fcanchor1')
    m2 = run(2, 'fcanchor2')
    assert all(np.isfinite(v) for v in m1.log_dict.values()), m1.log_dict
    np.testing.assert_allclose(m2.log_dict['d_weight'],
                               m1.log_dict['d_weight'], rtol=1e-3)
    np.testing.assert_allclose(m2.log_dict['l_g_total'],
                               m1.log_dict['l_g_total'], rtol=1e-4)
    frac = _params_match_fraction(m1.state.params_g, m2.state.params_g)
    assert frac > 0.9, f'only {frac:.3f} of param entries match'


def test_grad_accum_rejects_bad_values(tmp_path, tiny_dataset):
    from codeformer_tpu.train.trainers import build_model
    opt = _base_opt(tmp_path, 'accum_bad', tiny_dataset)
    opt['model_type'] = 'CodeFormerIdxModel'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    opt['train']['accum_steps'] = 0
    with pytest.raises(ValueError, match='accum_steps'):
        build_model(opt)

    # accum not dividing the batch: trace-time error on first step
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    opt['train']['accum_steps'] = 3  # batch_size_per_gpu = 2
    model = build_model(opt)
    ds = build_dataset(opt['datasets']['train'])
    loader = build_dataloader(ds, opt['datasets']['train'])
    model.feed_data(_make_batches(loader, 1)[0])
    with pytest.raises(ValueError, match='accum_steps'):
        model.optimize_parameters(1)


def test_mixed_precision_rejects_unknown_value(tmp_path, tiny_dataset):
    from codeformer_tpu.train.trainers import build_model
    opt = _base_opt(tmp_path, 'mp_bad', tiny_dataset)
    opt['model_type'] = 'CodeFormerJointModel'
    opt['mixed_precision'] = 'fp16'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    with pytest.raises(ValueError, match='mixed_precision'):
        build_model(opt)


def test_remat_stage2_equivalence(tmp_path, tiny_dataset):
    """remat: true must be a pure memory knob: rematerialized ResBlocks
    and the checkpointed perceptual pipeline recompute the SAME ops the
    plain backward saved, so one optimizer step from the same seed gives
    the same losses and (up to float-noise-gradient entries under Adam
    step 1) the same params — and an identical param tree structure."""
    import jax
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model

    def run(remat, name):
        opt = _base_opt(tmp_path, name, tiny_dataset)
        opt['model_type'] = 'CodeFormerIdxModel'
        opt['network_g'] = dict(TINY_CF)
        opt['network_vqgan'] = dict(TINY_VQGAN)
        opt['datasets']['train']['seed'] = 7
        opt['train']['remat'] = remat
        model = build_model(opt)
        ds = build_dataset(opt['datasets']['train'])
        loader = build_dataloader(ds, opt['datasets']['train'])
        model.feed_data(_make_batches(loader, 1)[0])
        model.optimize_parameters(1)
        return model

    m0 = run(False, 'remat0')
    m1 = run(True, 'remat1')
    assert (jax.tree_util.tree_structure(m0.state.params_g)
            == jax.tree_util.tree_structure(m1.state.params_g))
    for k, v in m0.log_dict.items():
        np.testing.assert_allclose(m1.log_dict[k], v, rtol=2e-5,
                                   atol=1e-6, err_msg=k)
    frac = _params_match_fraction(m0.state.params_g, m1.state.params_g)
    assert frac > 0.9, f'only {frac:.3f} of param entries match'


def _tree_max_delta(a, b):
    import jax
    return max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_stage3_frozen_modules_do_not_move(tmp_path, tiny_dataset):
    """fix_modules must be a HARD freeze on the full stage-III step.
    Regression test: optax.masked passes raw gradients through for
    masked-out leaves, so apply_updates used to ADD the raw gradient to
    the 'frozen' generator every full step (the generator gets nonzero
    grads — the image losses flow through its convs). The trainers now
    differentiate only the trainable subtree."""
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'stage3_freeze', tiny_dataset)
    opt['model_type'] = 'CodeFormerJointModel'
    opt['network_g'] = dict(TINY_CF)
    opt['network_vqgan'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    model = build_model(opt)
    # copy to host: the donated step consumes the live state buffers
    g0 = jax.tree.map(
        lambda x: np.asarray(x).copy(),
        {k: model.state.params_g[k] for k in ('generator', 'quantize')})
    rng = np.random.default_rng(0)
    batch = {'in': rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32),
             'gt': rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)}
    enc0 = np.asarray(
        jax.tree.leaves(model.state.params_g['encoder'])[0]).copy()
    model.feed_data(batch)
    model.optimize_parameters(1)  # w=1.0 full step (image+gan losses)
    g1 = {k: model.state.params_g[k] for k in ('generator', 'quantize')}
    assert _tree_max_delta(g0, g1) == 0.0
    # the trainable encoder DID move
    enc1 = np.asarray(jax.tree.leaves(model.state.params_g['encoder'])[0])
    assert np.abs(enc1 - enc0).max() > 0
    # and the optimizer state only tracks trainable leaves (no Adam
    # moments for the frozen ~2/3 of the model)
    opt_leaves = jax.tree.leaves(model.state.opt_g)
    train_leaves = jax.tree.leaves(
        {k: v for k, v in model.state.params_g.items()
         if k not in ('generator', 'quantize')})
    full_leaves = jax.tree.leaves(model.state.params_g)
    assert len(opt_leaves) < 2 * len(full_leaves)
    assert any(l.size == train_leaves[0].size for l in opt_leaves)


import jax  # noqa: E402  (used by the helpers below)


def test_net_d_iters_gates_whole_g_step(tmp_path, tiny_dataset):
    """net_d_iters / net_g_start_iter gate the ENTIRE generator step
    (vqgan_model.py:135): on gated iters params_g and opt_g must be
    bit-identical to before, while the d step and the EMA still run.
    Hand-stepped schedule at net_d_iters=2, net_g_start_iter=1:
    g updates on iters 2 and 4 only."""
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'gating', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['net_d_iters'] = 2
    opt['train']['net_g_start_iter'] = 1
    opt['train']['net_d_start_iter'] = 0

    model = build_model(opt)
    rng = np.random.default_rng(1)
    batch = {'gt': rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)}
    expected_g_update = {1: False, 2: True, 3: False, 4: True}
    for it in range(1, 5):
        g_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                                model.state.params_g)
        d_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                                model.state.params_d)
        ema_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                                  model.state.params_g_ema)
        model.feed_data(dict(batch))
        model.optimize_parameters(it)
        g_moved = _tree_max_delta(g_before, model.state.params_g) > 0
        d_moved = _tree_max_delta(d_before, model.state.params_d) > 0
        ema_moved = _tree_max_delta(ema_before,
                                    model.state.params_g_ema) > 0
        assert g_moved == expected_g_update[it], f'iter {it}'
        assert d_moved, f'iter {it}: d step must run every iteration'
        # EMA runs every iteration, but before the first g update the
        # shadow equals the params (a fixed point), so motion is only
        # observable from iter 2 on
        if it >= 2:
            assert ema_moved, f'iter {it}: EMA must run every iteration'


def test_net_d_start_iter_freezes_d_optimizer(tmp_path, tiny_dataset):
    """Before net_d_start_iter the reference never calls
    optimizer_d.step — Adam moments must not decay and the
    bias-correction count must not advance (vqgan_model.py:167-184)."""
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'd_start', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['net_d_start_iter'] = 2

    model = build_model(opt)
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                      (model.state.params_d, model.state.opt_d,
                       model.state.d_stats))
    rng = np.random.default_rng(2)
    batch = {'gt': rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)}
    for it in (1, 2):  # both <= net_d_start_iter
        model.feed_data(dict(batch))
        model.optimize_parameters(it)
    assert _tree_max_delta(
        d0, (model.state.params_d, model.state.opt_d,
             model.state.d_stats)) == 0.0
    model.feed_data(dict(batch))
    model.optimize_parameters(3)  # past the gate: d moves now
    assert _tree_max_delta(d0[0], model.state.params_d) > 0


def test_unknown_train_key_warns(tmp_path, tiny_dataset):
    """No train: YAML knob may be silently ignored — unknown keys warn
    at build time. (The project logger has propagate=False, so attach a
    handler directly instead of caplog.)"""
    import logging
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'warnkeys', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['train']['definitely_not_a_knob'] = 42

    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = logging.getLogger('codeformer_tpu')
    handler = _Catch(level=logging.WARNING)
    logger.addHandler(handler)
    try:
        build_model(opt)
    finally:
        logger.removeHandler(handler)
    assert any('definitely_not_a_knob' in r.getMessage()
               for r in records)


def test_validation_saves_images_and_metrics(tmp_path, tiny_dataset):
    """BaseTrainer.validation: EMA test() forward, per-image dump under
    visualization/<img_name>/<img_name>_<iter>.png, metric averaging
    (sr_model.py:135-194)."""
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'valviz', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['path']['visualization'] = str(tmp_path / 'viz')
    opt['val'] = {'metrics': {'psnr': {'type': 'calculate_psnr',
                                       'crop_border': 0}}}
    model = build_model(opt)
    rng = np.random.default_rng(3)
    batches = [
        {'lq': rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
         'gt': rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
         'lq_path': ['inputs/face_a.png']},
        {'lq': rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
         'gt': rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
         'lq_path': ['inputs/face_b.png']},
    ]
    res = model.validation(batches, current_iter=123, save_img=True)
    assert 'psnr' in res and np.isfinite(res['psnr'])
    for name in ('face_a', 'face_b'):
        p = tmp_path / 'viz' / name / f'{name}_123.png'
        assert p.exists(), p
    # test() uses the EMA tree and returns image-shaped output
    out = np.asarray(model.test(batches[0]['lq']))
    assert out.shape == (1, 64, 64, 3)


def test_validation_batch_gt_one_counts_all_images(tmp_path, tiny_dataset):
    """Val loaders with batch_size > 1 must score and dump EVERY image of
    the batch, not just the first (advisor finding, round 4)."""
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'valbatch', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    opt['path']['visualization'] = str(tmp_path / 'viz')
    opt['val'] = {'metrics': {'psnr': {'type': 'calculate_psnr',
                                       'crop_border': 0}}}
    model = build_model(opt)
    rng = np.random.default_rng(4)
    # one batch of 3 images with per-image paths
    batch = {'lq': rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32),
             'gt': rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32),
             'lq_path': ['x/a.png', 'x/b.png', 'x/c.png']}
    # gt == lq for image b only -> if all 3 are scored, the mean PSNR
    # must differ from scoring just the first
    batch['gt'][1] = batch['lq'][1]
    res = model.validation([batch], current_iter=7, save_img=True)
    assert 'psnr' in res and np.isfinite(res['psnr'])
    for name in ('a', 'b', 'c'):
        p = tmp_path / 'viz' / name / f'{name}_7.png'
        assert p.exists(), p


def test_stage_batch_lcm_padding_is_bias_free(tmp_path, tiny_dataset):
    """b=6 on an 8-device mesh pads to lcm(6,8)=24 slots — 4 copies of
    EACH sample, so mean losses/grads match the unpadded batch exactly
    (advisor finding: the previous hard error rejected runnable configs)."""
    import jax
    from codeformer_tpu.train.trainers import build_model

    opt = _base_opt(tmp_path, 'lcmpad', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['num_devices'] = 8
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    model = build_model(opt)
    assert model.mesh is not None
    rng = np.random.default_rng(5)
    data = {'in': rng.uniform(-1, 1, (6, 64, 64, 3)).astype(np.float32),
            'gt': rng.uniform(-1, 1, (6, 64, 64, 3)).astype(np.float32)}
    staged = model._stage_batch(data)
    assert staged['gt'].shape[0] == 24
    host = np.asarray(staged['gt'])
    # 4 whole-batch repetitions: every sample appears exactly 4x
    for rep in range(4):
        np.testing.assert_array_equal(host[rep * 6:(rep + 1) * 6],
                                      data['gt'])
    # sharded over the data axis
    assert len({s.device for s in staged['gt'].addressable_shards}) == 8


def test_resume_prunes_stale_optimizer_moments(tmp_path, tiny_dataset):
    """Resume from a .state whose optimizer tree carries EXTRA leaves
    (the pre-trainable-subtree layout kept moments for frozen modules):
    structure-based refill drops them with a warning instead of failing
    on a flat leaf-count mismatch (advisor finding, round 4)."""
    from codeformer_tpu.data import build_dataset
    from codeformer_tpu.data.loader import build_dataloader
    from codeformer_tpu.train.trainers import build_model
    from codeformer_tpu.utils.checkpoint import load_params, save_params

    opt = _base_opt(tmp_path, 'staleopt', tiny_dataset)
    opt['model_type'] = 'VQGANModel'
    opt['network_g'] = dict(TINY_VQGAN)
    opt['network_d'] = {'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 32,
                        'n_layers': 2}
    model = build_model(opt)
    ds = build_dataset(opt['datasets']['train'])
    loader = build_dataloader(ds, opt['datasets']['train'])
    batch = _make_batches(loader, 1)[0]
    model.feed_data(batch)
    model.optimize_parameters(1)
    model.save(epoch=0, current_iter=2)
    state_file = osp.join(opt['path']['training_states'], '2.state')

    # simulate the old full-tree layout: inject moments for a module that
    # is not in the current trainable subtree
    blob = load_params(state_file)
    for moment in ('mu', 'nu'):
        blob['opt_g']['0'][moment]['ghost_frozen_module'] = {
            'kernel': np.zeros((3, 3), np.float32)}
    save_params(blob, state_file)

    model2 = build_model(opt)
    epoch, it = model2.resume_training(state_file)
    assert it == 2
    import jax
    l1 = jax.tree.leaves(model.state.opt_g)
    l2 = jax.tree.leaves(model2.state.opt_g)
    assert len(l1) == len(l2)
    np.testing.assert_array_equal(np.asarray(l1[1]), np.asarray(l2[1]))
