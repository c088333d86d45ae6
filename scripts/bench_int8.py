"""Does int8 buy anything on this chip under XLA? Micro-bench of the
model's dominant conv shapes in bf16 vs s8xs8->s32 (+ dequant), plus a
big matmul, interleaved in one process (the only trustworthy comparison
on the axon tunnel — docs/roofline.md).

v5e MXU peak is nominally 2x for int8 (394 vs 197 TOPS); whether XLA's
conv lowering reaches it decides if an int8 serving path is worth
building (round-2 verdict item 5).
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def run(name, fn, args, flops, n_iter=16, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, s):
            out = fn(*[a + (0 * s).astype(a.dtype) for a in args])
            return 0.0 * jnp.sum(out.astype(jnp.float32)) + s + 1.0
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    times = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        float(loop(args))
        dt = time.perf_counter() - t0
        if r:
            times.append(dt)
    per = (min(times) - 0.023) / n_iter
    print(f'{name:44s} {per * 1000:8.2f} ms  '
          f'{flops / per / 1e12:6.1f} T{"OP" if "int8" in name else "F"}/s',
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    rng = np.random.default_rng(0)

    shapes = [
        ('C64 3x3 @512² B=16', (16, 512, 512, 64), 64),
        ('C128 3x3 @256² B=16', (16, 256, 256, 128), 128),
    ]
    for name, xshape, co in shapes:
        b, h, w, ci = xshape
        flops = 2 * b * h * w * 9 * ci * co
        xb = jnp.asarray(rng.normal(0, 1, xshape), jnp.bfloat16)
        kb = jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, xshape), jnp.int8)
        ki = jnp.asarray(rng.integers(-127, 128, (3, 3, ci, co)), jnp.int8)
        dn = lax.conv_dimension_numbers(xshape, kb.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))

        def conv_bf16(x, k):
            return lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                            dimension_numbers=dn)

        def conv_int8(x, k):
            y = lax.conv_general_dilated(
                x, k, (1, 1), 'SAME', dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (1.0 / 127)).astype(
                jnp.bfloat16)

        run(f'{name} bf16', conv_bf16, (xb, kb), flops)
        run(f'{name} int8->s32 (+deq)', conv_int8, (xi, ki), flops)

    # big matmul sanity: K=N=4096, M=8192
    m, k, n = 8192, 4096, 4096
    flops = 2 * m * k * n
    ab = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    bb = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.bfloat16)
    ai = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    run('matmul 8192x4096x4096 bf16',
        lambda a, b: a @ b, (ab, bb), flops)
    run('matmul 8192x4096x4096 int8->s32',
        lambda a, b: lax.dot(a, b,
                             preferred_element_type=jnp.int32),
        (ai, bi), flops)


if __name__ == '__main__':
    main()
