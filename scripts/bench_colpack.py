"""Micro-benchmark: colpack fused-stage kernels on the real chip.

Times each piece of the stage-resident colpack path (ops/colpack_conv)
against its XLA counterpart at the shapes that dominate the CodeFormer
forward (B=16, 512x512, C=64). Honest-timing recipe per
docs/roofline.md: every candidate is chained through a scalar data
dependency inside ONE jitted fori_loop (the axon tunnel costs ~23 ms per
host round trip and block_until_ready does not block), and the per-call
tax is amortized over the loop.

Axon pitfall (measured): lowering a jit that CLOSES OVER a live device
array embeds it via a ._value D2H future that takes ~80-230 s per array.
All captured operands here are host numpy; the feature map is a jit arg.

Run:  python scripts/bench_colpack.py [--iters N] [--only NAME]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax import lax
from flax import linen as nn

from codeformer_tpu.ops import colpack_conv as cc

B, H, W_, C = 16, 512, 512, 64
DT = jnp.bfloat16
NDT = ml_dtypes.bfloat16


def conv(x, k, strides=(1, 1), padding='SAME'):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
    return lax.conv_general_dilated(x, k, strides, padding,
                                    dimension_numbers=dn)


def timeit(body, x_arg, n_iter, label):
    """body(x, carry_scalar) -> new scalar; chained inside one jit call."""
    f = jax.jit(lambda x, c: lax.fori_loop(
        0, n_iter, lambda i, v: body(x, v), c))
    c0 = jnp.float32(0.0)
    print(f'{label}: lowering...', flush=True)
    t0 = time.perf_counter()
    lo = f.lower(x_arg, c0)
    print(f'  lowered {time.perf_counter() - t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    co = lo.compile()
    print(f'  compiled {time.perf_counter() - t0:.1f}s', flush=True)
    float(co(x_arg, c0))                           # warm
    t0 = time.perf_counter()
    float(co(x_arg, c0))
    dt = (time.perf_counter() - t0 - 0.023) / n_iter
    print(f'{label:32s}: {dt * 1e3:7.2f} ms', flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=24)
    ap.add_argument('--only', type=str, default='')
    args = ap.parse_args()
    n = args.iters
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(NDT)
    bias = (rng.standard_normal((C,)) * 0.1).astype(NDT)
    x = jax.jit(lambda s: jax.random.normal(
        jax.random.PRNGKey(0), (B, H, W_, C), DT))(0)
    xc_dev = jax.jit(cc.to_colpack)(x)
    wc, wo = jax.device_get(cc.pack_weights(jnp.asarray(k)))
    bias2 = np.tile(bias, 2)
    w1x1 = jax.device_get(cc.pack_1x1(
        jnp.asarray((rng.standard_normal((C, C)) * 0.05).astype(NDT))))
    a = np.ones((B, 2 * C), np.float32)
    b_ = np.zeros((B, 2 * C), np.float32)

    def want(name):
        return (not args.only) or args.only in name

    eps = np.float32(1e-20)

    if want('down'):
        timeit(lambda xc, c: cc.downsample_dots(
            xc, jnp.asarray(k) + (c * eps).astype(DT), bias)[0, 0, 0, 0]
            .astype(jnp.float32), xc_dev, n, 'downsample_dots (fused split)')
        timeit(lambda x, c: (conv(jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0))),
                                  jnp.asarray(k) + (c * eps).astype(DT),
                                  (2, 2), 'VALID')
                             + bias)[0, 0, 0, 0]
               .astype(jnp.float32), x, n, 'downsample XLA')

    if want('dots'):
        timeit(lambda xc, c: cc.conv3x3_dots(
            xc, wc, wo, bias2 + (c * eps).astype(NDT))[0][0, 0, 0, 0]
            .astype(jnp.float32), xc_dev, n, 'conv3x3_dots no-skip')
        timeit(lambda xc, c: cc.conv3x3_dots(
            xc, wc, wo, bias2 + (c * eps).astype(NDT),
            skip=xc)[0][0, 0, 0, 0]
            .astype(jnp.float32), xc_dev, n, 'conv3x3_dots skip-id')
        timeit(lambda xc, c: cc.conv3x3_dots(
            xc, wc, wo, bias2 + (c * eps).astype(NDT),
            skip=xc, w1x1=w1x1)[0][0, 0, 0, 0]
            .astype(jnp.float32), xc_dev, n, 'conv3x3_dots skip-proj')
        timeit(lambda x, c: (conv(x, jnp.asarray(k) + (c * eps).astype(DT))
                             + bias)[0, 0, 0, 0]
               .astype(jnp.float32), x, n, 'conv3x3 XLA bare')

    if want('silu'):
        timeit(lambda xc, c: cc.silu_affine(
            xc, a + c * eps, b_)[0, 0, 0, 0].astype(jnp.float32),
            xc_dev, n, 'silu_affine (XLA pass)')

    if want('convin'):
        img = jax.jit(lambda s: jax.random.normal(
            jax.random.PRNGKey(1), (B, H, W_, 3), DT))(0)
        k3 = (rng.standard_normal((3, 3, 3, C)) * 0.1).astype(NDT)
        timeit(lambda im, c: cc.conv_in_packed(
            im, jnp.asarray(k3) + (c * eps).astype(DT), bias)[0, 0, 0, 0]
            .astype(jnp.float32), img, n, 'conv_in_packed')
        timeit(lambda im, c: (conv(im, jnp.asarray(k3) + (c * eps).astype(DT))
                              + bias)[0, 0, 0, 0]
               .astype(jnp.float32), img, n, 'conv_in XLA')

    if want('rb'):
        # one full fused ResBlock64: stats -> affine -> silu -> dots (x2)
        gamma = np.ones((C,), np.float32)
        beta = np.zeros((C,), np.float32)

        def fused_rb(xc, c):
            st = cc.colpack_stats(xc)
            a1, b1 = cc.gn_affine(st, gamma + c * eps, beta, H * W_)
            h1 = cc.silu_affine(xc, a1, b1)
            y1, st1 = cc.conv3x3_dots(h1, wc, wo, bias2)
            a2, b2 = cc.gn_affine(st1, gamma, beta, H * W_)
            h2 = cc.silu_affine(y1, a2, b2)
            y2, _ = cc.conv3x3_dots(h2, wc, wo, bias2, skip=xc)
            return y2[0, 0, 0, 0].astype(jnp.float32)
        timeit(fused_rb, xc_dev, n, 'fused ResBlock64 (w/ entry stats)')

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
        gnv = {'params': {'scale': gamma, 'bias': beta}}

        def xla_rb(x, c):
            kk = jnp.asarray(k) + (c * eps).astype(DT)
            h1 = nn.silu(gn.apply(gnv, x)).astype(DT)
            y1 = conv(h1, kk) + bias
            h2 = nn.silu(gn.apply(gnv, y1)).astype(DT)
            y2 = conv(h2, kk) + bias + x
            return y2[0, 0, 0, 0].astype(jnp.float32)
        timeit(xla_rb, x, n, 'XLA ResBlock64')


if __name__ == '__main__':
    main()
