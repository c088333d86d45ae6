"""Tests for the TPU-native equivalents of the reference CUDA ops
(SURVEY §2g): upfirdn2d vs the reference's pure-torch fallback,
fused_leaky_relu semantics + custom VJP, deform_conv vs a direct numpy
computation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeformer_tpu.ops.fused_act import fused_leaky_relu
from codeformer_tpu.ops.upfirdn2d import upfirdn2d
from codeformer_tpu.ops.deform_conv import modulated_deform_conv2d

torch = pytest.importorskip('torch')


def _ref_upfirdn2d_native(x, kernel, up, down, pad):
    """Direct numpy upfirdn (the reference upfirdn2d_native semantics,
    basicsr/ops/upfirdn2d/upfirdn2d.py:149-186), NHWC single-channel-wise."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    px0, px1, py0, py1 = pad
    # zero-stuff
    up_x = np.zeros((b, h * up, w * up, c), np.float32)
    up_x[:, ::up, ::up, :] = x
    # pad
    up_x = np.pad(up_x, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
    # correlate with flipped kernel
    out_h = up_x.shape[1] - kh + 1
    out_w = up_x.shape[2] - kw + 1
    kf = kernel[::-1, ::-1]
    out = np.zeros((b, out_h, out_w, c), np.float32)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * up_x[:, i:i + out_h, j:j + out_w, :]
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize('up,down,pad', [(1, 1, (1, 1, 1, 1)),
                                         (2, 1, (2, 1, 2, 1)),
                                         (1, 2, (1, 1, 1, 1))])
def test_upfirdn2d_matches_native(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    k = rng.normal(size=(4, 4)).astype(np.float32)
    ref = _ref_upfirdn2d_native(x, k, up, down, pad)
    out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down,
                               pad))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_leaky_relu_semantics_and_grad():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    out = fused_leaky_relu(x, bias)
    y = x + bias
    expected = jnp.where(y >= 0, y, 0.2 * y) * (2 ** 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)

    # custom VJP vs autodiff of the reference formula
    def ref_fn(x, b):
        y = x + b
        return jnp.sum(jnp.where(y >= 0, y, 0.2 * y) * (2 ** 0.5) ** 1
                       * jnp.sin(x))  # arbitrary downstream fn

    def our_fn(x, b):
        return jnp.sum(fused_leaky_relu(x, b) * jnp.sin(x))

    g_ref = jax.grad(ref_fn, argnums=(0, 1))(x, bias)
    g_our = jax.grad(our_fn, argnums=(0, 1))(x, bias)
    np.testing.assert_allclose(np.asarray(g_our[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_our[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-5)


def test_modulated_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCNv2 must equal a plain conv."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    offset = jnp.zeros((1, 8, 8, 18))
    mask = jnp.ones((1, 8, 8, 9))
    out = modulated_deform_conv2d(x, offset, mask, w, bias)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1),
                                       ((1, 1), (1, 1)),
                                       dimension_numbers=dn) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_modulated_deform_conv_integer_shift():
    """An integer offset of (0, 1) on every tap shifts the sampled patch
    right by one pixel — equivalent to convolving a shifted input."""
    rng = np.random.default_rng(3)
    x = np.zeros((1, 8, 8, 2), np.float32)
    x[0, :, :-1] = rng.normal(size=(8, 7, 2))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)), np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = 1 for every tap
    mask = jnp.ones((1, 8, 8, 9))
    out = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                  mask, w)
    x_shift = np.roll(x, -1, axis=2)
    x_shift[:, :, -1] = 0
    out_ref = modulated_deform_conv2d(jnp.asarray(x_shift),
                                      jnp.zeros((1, 8, 8, 18)), mask, w)
    # interior matches exactly (borders differ by the zero-padding rule)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                               np.asarray(out_ref)[:, 1:-1, 1:-2],
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_mask_scales_output():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)), jnp.float32)
    offset = jnp.zeros((1, 6, 6, 18))
    out_half = modulated_deform_conv2d(x, offset,
                                       jnp.full((1, 6, 6, 9), 0.5), w)
    out_full = modulated_deform_conv2d(x, offset,
                                       jnp.ones((1, 6, 6, 9)), w)
    np.testing.assert_allclose(np.asarray(out_half),
                               0.5 * np.asarray(out_full), rtol=1e-4,
                               atol=1e-5)
