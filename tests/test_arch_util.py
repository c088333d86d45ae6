"""Tests for arch_util (flow_warp, DCNv2Pack) and SRModel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeformer_tpu.nn.arch_util import DCNv2Pack, flow_warp, resize_flow


def test_flow_warp_zero_flow_is_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    flow = jnp.zeros((2, 8, 8, 2))
    out = flow_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_flow_warp_integer_shift():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    flow = jnp.full((1, 8, 8, 2), 0.0).at[..., 0].set(1.0)  # dx=1
    out = flow_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out)[:, :, :-1],
                               np.asarray(x)[:, :, 1:], atol=1e-6)


def test_resize_flow_scales_magnitudes():
    flow = jnp.ones((1, 4, 4, 2))
    out = resize_flow(flow, 'ratio', (2, 2))
    assert out.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_dcnv2pack_shapes_and_grad():
    m = DCNv2Pack(out_channels=6)
    x = jnp.zeros((1, 8, 8, 4))
    feat = jnp.zeros((1, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x, feat)
    out = m.apply(params, x, feat)
    assert out.shape == (1, 8, 8, 6)

    def loss(p):
        return jnp.sum(m.apply(p, jnp.ones((1, 8, 8, 4)),
                               jnp.ones((1, 8, 8, 4))) ** 2)
    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree.leaves(g))


def test_sr_model_trains(tmp_path):
    """SRModel smoke: RRDBNet x1 on paired-like synthetic data."""
    from codeformer_tpu.train.trainers import build_model
    opt = {
        'name': 'sr_smoke', 'model_type': 'SRModel', 'is_train': True,
        'num_devices': 1,
        'datasets': {'train': {'gt_size': 32}},
        'network_g': {'type': 'RRDBNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'scale': 1, 'num_feat': 16, 'num_block': 1,
                      'num_grow_ch': 8},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'total_iter': 2, 'ema_decay': 0.99,
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'scheduler': {'type': 'MultiStepLR', 'milestones': [100],
                          'gamma': 0.5},
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0},
        },
    }
    model = build_model(opt)
    rng = np.random.default_rng(0)
    # note: RRDBNet scale=1 pixel-unshuffles by 4 -> lq must be 4x the gt?
    # no: scale=1 means out == in size; use 32x32 both
    batch = {'lq': rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
             'gt': rng.normal(size=(2, 32, 32, 3)).astype(np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    l0 = model.log_dict['l_total']
    model.feed_data(batch)
    model.optimize_parameters(2)
    assert np.isfinite(model.log_dict['l_total'])
    assert model.log_dict['l_total'] <= l0 * 1.5  # sane step
