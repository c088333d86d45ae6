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


def main_model(batch=16, n_iter=12, reps=3):
    """In-model interleaved A/B: full CodeFormer forward, bf16 vs the
    int8 serving path (nn/quant.py), same process, alternating timed
    chains — the only comparison the axon tunnel can't distort."""
    import time

    import jax
    import jax.numpy as jnp
    from codeformer_tpu.models import CodeFormer
    from codeformer_tpu.nn.quant import set_quant_mode
    from codeformer_tpu.utils.checkpoint import init_params_fast

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    model = CodeFormer(dtype=jnp.bfloat16)
    variables = jax.device_put(init_params_fast(
        model, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), 0.5))
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch, 512, 512, 3), jnp.bfloat16, -1.0, 1.0)

    def fwd_bf16(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    def fwd_int8(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    def fwd_int8_static(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    # quant mode is read at TRACE time: trace each variant under its
    # mode, then interleave the compiled executables
    fns = {}
    set_quant_mode('int8')
    fns['int8'] = jax.jit(fwd_int8)
    float(fns['int8'](variables, x, 0.5))  # trace+compile under int8
    # static-scale hypothesis probe: is the dynamic abs-max pass over
    # the 512^2 activations (full extra HBM read per conv, plus a
    # serialization point) what eats the MXU int8 gain? Trace a variant
    # whose act scale is a compile-time constant (numerics intentionally
    # uncalibrated — this measures speed, not quality).
    from codeformer_tpu.nn import quant as _q
    _orig_qact = _q.quantize_act

    def _static_qact(xx):
        s = jnp.float32(0.05)
        xq = jnp.clip(jnp.round(xx.astype(jnp.float32) / s), -127, 127)
        return xq.astype(jnp.int8), s

    _q.quantize_act = _static_qact
    try:
        fns['int8-static'] = jax.jit(fwd_int8_static)
        float(fns['int8-static'](variables, x, 0.5))
    finally:
        _q.quantize_act = _orig_qact
    set_quant_mode('off')
    fns['bf16'] = jax.jit(fwd_bf16)
    float(fns['bf16'](variables, x, 0.5))

    def chain(fn):
        s = fn(variables, x, 0.5)
        for _ in range(n_iter - 1):
            s = fn(variables, x, 0.5 + 0.0 * s)
        float(s)  # drain the warm chain BEFORE starting the clock
        t0 = time.perf_counter()
        for _ in range(n_iter):
            s = fn(variables, x, 0.5 + 0.0 * s)
        float(s)
        return time.perf_counter() - t0

    names = ('bf16', 'int8', 'int8-static')
    for name in names:  # untimed warm chains
        chain(fns[name])
    times = {name: [] for name in names}
    for _ in range(reps):
        for name in names:
            times[name].append(chain(fns[name]))
    for name in names:
        per = min(times[name]) / n_iter
        print(f'CodeFormer fwd B={batch} {name:11s}: {per * 1000:7.2f} ms '
              f'({batch / per:6.1f} faces/s)', flush=True)


if __name__ == '__main__':
    if '--model' in sys.argv:
        main_model()
    else:
        main()
