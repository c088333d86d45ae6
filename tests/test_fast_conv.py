"""Exactness tests for the MXU-shape-optimized conv evaluations:
phase-packed 3x3 (ops/s2d_conv.py) and the fused nearest-x2+conv
(nn/blocks.Upsample) must match the naive evaluations to fp tolerance."""
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from codeformer_tpu.nn.blocks import Upsample
from codeformer_tpu.ops.s2d_conv import (conv3x3_phase_packed,
                                         use_phase_packing)


def _direct_conv3x3(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    return lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                    dimension_numbers=dn)


def test_phase_packed_conv_matches_direct():
    rng = np.random.default_rng(0)
    for h, w, cin, cout in ((16, 16, 8, 8), (32, 16, 3, 8), (16, 32, 8, 4)):
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
        got = conv3x3_phase_packed(x, k)
        want = _direct_conv3x3(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_use_phase_packing_heuristic():
    assert use_phase_packing(512, 512, 64)
    assert use_phase_packing(512, 512, 3)
    assert not use_phase_packing(512, 512, 128)   # lanes already full
    assert not use_phase_packing(128, 128, 64)    # too small to pay off
    assert not use_phase_packing(511, 512, 64)    # odd H


def test_resblock_fastconv_params_match_nn_conv():
    """FastConv3x3 must expose nn.Conv-identical param names/shapes so
    checkpoints and the torch converter are unaffected."""
    from codeformer_tpu.nn.blocks import ResBlock
    v = ResBlock(64, 64).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 16, 16, 64)))
    p = v['params']
    assert set(p['conv1']) == {'kernel', 'bias'}
    assert p['conv1']['kernel'].shape == (3, 3, 64, 64)
    assert p['conv1']['bias'].shape == (64,)


def test_upsample_fused_matches_naive():
    rng = np.random.default_rng(1)
    c = 8
    up = Upsample(c)
    x = jnp.asarray(rng.normal(size=(2, 12, 10, c)), jnp.float32)
    v = up.init(jax.random.PRNGKey(0), x)
    k = v['params']['conv']['kernel']
    b = v['params']['conv']['bias']
    assert k.shape == (3, 3, c, c) and b.shape == (c,)

    got = up.apply(v, x)
    naive = _direct_conv3x3(
        jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), k) + b
    assert got.shape == (2, 24, 20, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


def test_pallas_conv3x3_matches_direct():
    """Pallas phase-pair conv kernel (ops/pallas_conv.py) vs lax conv."""
    from codeformer_tpu.ops.pallas_conv import TY, conv3x3_pallas
    rng = np.random.default_rng(3)
    for b, h, w, cin, cout in ((2, TY * 2, 16, 8, 8),
                               (1, TY * 3, 10, 8, 16)):
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        got = conv3x3_pallas(x, k, bias)
        want = _direct_conv3x3(x, k) + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
