"""Micro-benchmark: exact reformulations of the 3x3 C64 conv at 512x512.

The CodeFormer forward is dominated by the 512x512 C=64 stages, which XLA
runs at 50-62 TFLOP/s because C_out=64 fills half of the MXU's 128 output
lanes (docs/roofline.md). Every candidate here is an EXACT rewrite of
   y = conv3x3_SAME(x, W),  x: (B, 512, 512, 64)
with a different GEMM shape, measured as an endomorphism in its own data
layout ("stay-in-domain" steady state — the relayout in/out of the domain
is excluded because a whole stage would amortize it once, not per conv):

  plain          normal domain, lax conv              (K=576,  N=64)
  w4_roundtrip   normal domain, 4x4/s2 phase-packed conv + d2s each call
  w4_stay        packed domain (B,256,256,256): d2s -> 4x4/s2 conv
  dense9_stay    packed domain: one 3x3 conv with block kernel (4x FLOPs)
  colpack_stay   col-packed (B,512,256,128): c2s -> (3,4)/s(1,2) conv
  qsplit_stay    packed domain: 12-slice im2col concat + 2 einsums
                 (K=768, N=128, 1.33x FLOPs)
  c128_ref       3x3 C128 @ 256x256 — the near-peak shape, for the ceiling

Run on the real chip:  python scripts/bench_conv512.py [--iters N]
Exactness check only:  JAX_PLATFORM_NAME=cpu python scripts/bench_conv512.py --check
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, H, W_, C = 16, 512, 512, 64


def conv(x, k, strides=(1, 1), padding='SAME'):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
    return lax.conv_general_dilated(x, k, strides, padding,
                                    dimension_numbers=dn)


# ---------------------------------------------------------------- layouts
def s2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major (py,px) channel blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(xp, c):
    b, hh, ww, _ = xp.shape
    x = xp.reshape(b, hh, ww, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hh, 2 * ww, c)


def c2s_cols(x):
    """(B,H,W,C) -> (B,H,W/2,2C) col-packed, phase-major."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def s2c_cols(xc, c):
    b, h, ww, _ = xc.shape
    return xc.reshape(b, h, 2 * ww, c)


# ------------------------------------------------------- weight packings
def pack_w4(k):
    """(3,3,Ci,Co) -> (4,4,Ci,4Co); output phase blocks (py,px)-major."""
    return jnp.concatenate(
        [jnp.pad(k, ((p, 1 - p), (q, 1 - q), (0, 0), (0, 0)))
         for p in (0, 1) for q in (0, 1)], axis=-1)


def pack_dense9(k):
    """(3,3,Ci,Co) -> (3,3,4Ci,4Co) packed-domain block kernel."""
    ci, co = k.shape[2], k.shape[3]
    wpp = np.zeros((3, 3, 4 * ci, 4 * co), np.float32)
    kn = np.asarray(k, np.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    for qy in (0, 1):
                        for qx in (0, 1):
                            u = 2 * dy + py - qy + 1
                            v = 2 * dx + px - qx + 1
                            if 0 <= u <= 2 and 0 <= v <= 2:
                                wpp[dy + 1, dx + 1,
                                    (2 * py + px) * ci:(2 * py + px + 1) * ci,
                                    (2 * qy + qx) * co:(2 * qy + qx + 1) * co] \
                                    = kn[u, v]
    return jnp.asarray(wpp, k.dtype)


def pack_colw(k):
    """(3,3,Ci,Co) -> (3,4,Ci,2Co), col-phase blocks qx-major."""
    return jnp.concatenate(
        [jnp.pad(k, ((0, 0), (q, 1 - q), (0, 0), (0, 0))) for q in (0, 1)],
        axis=-1)


def pack_qsplit(k):
    """(3,3,Ci,Co) -> two (12*Ci, 2*Co) matrices (one per output row-phase).

    K layout: (orig_row r in 0..2, orig_col j in 0..3, ci); N: (qx, co).
    """
    ci, co = k.shape[2], k.shape[3]
    kn = np.asarray(k, np.float32)
    mats = []
    for _qy in (0, 1):
        m = np.zeros((3, 4, ci, 2, co), np.float32)
        for r in range(3):
            for j in range(4):
                for qx in (0, 1):
                    v = j - qx
                    if 0 <= v <= 2:
                        m[r, j, :, qx, :] = kn[r, v]
        mats.append(jnp.asarray(m.reshape(12 * ci, 2 * co), k.dtype))
    return mats


# ------------------------------------------------------------- candidates
def plain(x, k):
    return conv(x, k)


def w4_roundtrip(x, w4):
    y = conv(x, w4, (2, 2), ((1, 2), (1, 2)))
    return d2s(y, w4.shape[-1] // 4)


def w4_stay(xp, w4):
    x = d2s(xp, w4.shape[2])
    return conv(x, w4, (2, 2), ((1, 2), (1, 2)))


def dense9_stay(xp, wpp):
    return conv(xp, wpp)


def colpack_stay(xc, wc):
    x = s2c_cols(xc, wc.shape[2])
    return conv(x, wc, (1, 2), ((1, 1), (1, 2)))


def qsplit_stay(xp, mats, c=C):
    b, hh, ww, _ = xp.shape
    # pad one packed pixel all around
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def packed_cell(dy, dx):
        return lax.dynamic_slice(xpad, (0, 1 + dy, 1 + dx, 0),
                                 (b, hh, ww, 4 * c))

    outs = []
    for qy in (0, 1):
        cols = []
        for r in range(3):               # original rows 2Y+qy-1+r... r=0..2
            rr = qy + r - 1              # original row offset
            dy, py = rr // 2 if rr >= 0 else -1, rr % 2
            if rr < 0:
                dy, py = -1, 1
            for j in range(4):           # original cols 2X-1..2X+2
                cc = j - 1
                dx, px = (cc // 2 if cc >= 0 else -1), cc % 2
                if cc < 0:
                    dx, px = -1, 1
                cell = packed_cell(dy, dx)
                ph = 2 * py + px
                cols.append(cell[..., ph * c:(ph + 1) * c])
        im = jnp.concatenate(cols, axis=-1)              # (B,hh,ww,12C)
        outs.append(jnp.einsum('bhwk,kn->bhwn', im, mats[qy],
                               preferred_element_type=jnp.float32
                               ).astype(xp.dtype))       # (B,hh,ww,2C)
    # outs[qy] has (qx, co) lanes; packed layout wants (qy,qx,co)
    return jnp.concatenate(outs, axis=-1)


def c128_ref(x, k):
    return conv(x, k)


# ---------------------------------------------------------------- driver
def check_exactness():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.float32)
    ref = plain(x, k)
    xp = s2d(x)
    xc = c2s_cols(x)

    got = w4_roundtrip(x, pack_w4(k))
    print('w4_roundtrip ', np.abs(np.asarray(got - ref)).max())

    got = d2s(w4_stay(xp, pack_w4(k)), c)
    print('w4_stay      ', np.abs(np.asarray(got - ref)).max())

    got = d2s(dense9_stay(xp, pack_dense9(k)), c)
    print('dense9_stay  ', np.abs(np.asarray(got - ref)).max())

    got = colpack_stay(xc, pack_colw(k))
    got = s2c_cols(got, c)
    print('colpack_stay ', np.abs(np.asarray(got - ref)).max())

    got = d2s(qsplit_stay(xp, pack_qsplit(k), c), c)
    print('qsplit_stay  ', np.abs(np.asarray(got - ref)).max())


def bench(fn, x, n_iter, flops):
    f = jax.jit(lambda x: lax.fori_loop(0, n_iter, lambda i, v: fn(v), x))
    y = f(x)
    float(jnp.sum(y[..., :1].astype(jnp.float32)))  # warm
    t0 = time.perf_counter()
    y = f(x)
    float(jnp.sum(y[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n_iter
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()
    if args.check:
        check_exactness()
        return

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(rng, (B, H, W_, C), dt)
    k = jax.random.normal(rng, (3, 3, C, C), dt) * 0.05
    base_flops = 2 * B * H * W_ * 9 * C * C          # original-conv FLOPs

    cands = [
        ('plain        ', plain(x, 0 * k).dtype and (lambda v: plain(v, k)),
         x, base_flops, 1.0),
        ('w4_roundtrip ', (lambda v: w4_roundtrip(v, pack_w4(k))),
         x, base_flops, 16 / 9),
        ('w4_stay      ', (lambda v: w4_stay(v, pack_w4(k))),
         s2d(x), base_flops, 16 / 9),
        ('dense9_stay  ', (lambda v: dense9_stay(v, pack_dense9(k))),
         s2d(x), base_flops, 4.0),
        ('colpack_stay ', (lambda v: colpack_stay(v, pack_colw(k))),
         c2s_cols(x), base_flops, 4 / 3),
        ('qsplit_stay  ', (lambda v: qsplit_stay(v, pack_qsplit(k))),
         s2d(x), base_flops, 4 / 3),
    ]
    x128 = jax.random.normal(rng, (B, 256, 256, 128), dt)
    k128 = jax.random.normal(rng, (3, 3, 128, 128), dt) * 0.05
    cands.append(('c128_ref     ', (lambda v: c128_ref(v, k128)), x128,
                  2 * B * 256 * 256 * 9 * 128 * 128, 1.0))

    print(f'{"candidate":14s} {"ms/conv":>8s} {"raw TF/s":>9s} '
          f'{"effective TF/s":>15s}', file=sys.stderr)
    for name, fn, inp, flops, overhead in cands:
        try:
            dtme, tf = bench(fn, inp, args.iters, flops * overhead)
            print(f'{name} {dtme * 1e3:8.2f} {tf:9.1f} {tf / overhead:15.1f}',
                  file=sys.stderr)
        except Exception as e:
            print(f'{name} FAILED {type(e).__name__}: {e}', file=sys.stderr)


if __name__ == '__main__':
    main()
