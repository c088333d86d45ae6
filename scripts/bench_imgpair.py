"""Micro-benchmark: the image-pair weight-stationary Pallas conv
(ops/imgpair_conv.py) vs XLA's native conv at the C64@512x512 shape
that dominates the CodeFormer forward (B=16, bf16).

VERDICT r4 item 4 asked for this design to be attempted with measured
numbers. The kernel does 2x the conventional MACs (block-diagonal
weights), so the effective rate is raw_GEMM_rate/2; it beats XLA's
50-62 TF/s only if the raw rate exceeds ~124 TF/s. Timing recipe per
docs/roofline.md (scalar-chained fori_loop inside one jit; numpy
captures only).

Run: python scripts/bench_imgpair.py [--iters N]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


B, H, W_, C = 16, 512, 512, 64
CONV_FLOPS = 2 * B * H * W_ * 9 * C * C  # conventional MACs x2


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    from codeformer_tpu.ops import imgpair_conv as ip

    rng = np.random.default_rng(0)
    k_np = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    b_np = rng.standard_normal((C,)).astype(np.float32)
    x = jax.jit(lambda key: jax.random.normal(
        key, (B, H, W_, C), jnp.bfloat16))(jax.random.PRNGKey(0))
    xp = jax.jit(ip.pack_images)(x)

    k = jnp.asarray(k_np, jnp.bfloat16)
    bias = jnp.asarray(b_np, jnp.bfloat16)
    wd_np = np.zeros((3, 3, 2 * C, 2 * C), np.float32)
    wd_np[:, :, :C, :C] = k_np
    wd_np[:, :, C:, C:] = k_np
    wd = jnp.asarray(wd_np, jnp.bfloat16)
    bias2 = jnp.asarray(np.concatenate([b_np, b_np]), jnp.bfloat16)

    def timeit(label, body, x_arg, n_iter):
        f = jax.jit(lambda xx, c: lax.fori_loop(
            0, n_iter, lambda i, v: body(xx, v), c))
        c0 = jnp.float32(0.0)
        f(x_arg, c0)  # compile + warm
        float(f(x_arg, c0))
        t0 = time.perf_counter()
        float(f(x_arg, c0))
        dt = (time.perf_counter() - t0 - 0.023) / n_iter
        tf = CONV_FLOPS / dt / 1e12
        print(f'{label:42s} {dt * 1000:8.3f} ms  {tf:6.1f} eff TF/s',
              flush=True)
        return dt

    def xla_body(xx, c):
        dn = lax.conv_dimension_numbers(xx.shape, k.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
        y = lax.conv_general_dilated(
            xx + (0.0 * c).astype(xx.dtype), k, (1, 1), 'SAME',
            dimension_numbers=dn) + bias
        return 0.0 * jnp.sum(y[0, ::64, ::64, 0].astype(jnp.float32)) \
            + c + 1.0

    def pair_body(xx, c):
        y = ip.conv3x3_imgpair(xx + (0.0 * c).astype(xx.dtype), wd,
                               bias2)
        return 0.0 * jnp.sum(y[0, ::64, ::64, 0].astype(jnp.float32)) \
            + c + 1.0

    def pair_e2e_body(xx, c):
        yp = ip.conv3x3_imgpair(ip.pack_images(
            xx + (0.0 * c).astype(xx.dtype)), wd, bias2)
        y = ip.unpack_images(yp, C)
        return 0.0 * jnp.sum(y[0, ::64, ::64, 0].astype(jnp.float32)) \
            + c + 1.0

    # hardware exactness spot-check first (bf16 tolerance)
    y_ref = jax.jit(lambda xx: lax.conv_general_dilated(
        xx.astype(jnp.float32), k.astype(jnp.float32), (1, 1), 'SAME',
        dimension_numbers=lax.conv_dimension_numbers(
            xx.shape, k.shape, ('NHWC', 'HWIO', 'NHWC')))
        + b_np)(x)
    y_got = jax.jit(lambda xx: ip.unpack_images(
        ip.conv3x3_imgpair(ip.pack_images(xx), wd, bias2), C))(x)
    err = float(jnp.max(jnp.abs(y_ref - y_got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_ref)))
    print(f'hw exactness: max |err| {err:.4f} (max |ref| {scale:.1f})',
          flush=True)

    timeit('xla conv C64@512^2 B=16 bf16', xla_body, x, args.iters)
    timeit('imgpair kernel (packed domain)', pair_body, xp, args.iters)
    timeit('imgpair kernel (+pack/unpack)', pair_e2e_body, x,
           args.iters)


if __name__ == '__main__':
    main()
