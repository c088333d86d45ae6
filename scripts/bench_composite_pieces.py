"""Time the composite graph's non-warp pieces on the TPU chip:
parse-mask shaping (double 101-blur), the erode/blur soft-edge chain,
canvas resize, and the ROI blend loop — to direct optimization after the
warp fix (scripts/bench_warp.py)."""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def run(name, fn, args, n_iter=8, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, s):
            out = fn(*[a + (0.0 * s).astype(a.dtype)
                       if a.dtype.kind in 'fiu' else a for a in args])
            leaves = jax.tree_util.tree_leaves(out)
            tot = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return 0.0 * tot + s + 1.0
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    times = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        float(loop(args))
        dt = time.perf_counter() - t0
        if r:
            times.append(dt)
    per = (min(times) - 0.023) / n_iter
    print(f'{name:40s} {per * 1000:8.2f} ms', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    from codeformer_tpu.ops.filters import erode, gaussian_blur
    from codeformer_tpu.pipeline.compositor_xla import (_pack,
                                                        _shape_parse_masks,
                                                        _unpack)

    rng = np.random.default_rng(0)
    m, roi = 16, 672
    pids = jnp.asarray(rng.integers(0, 19, (m, 512, 512)), jnp.int32)
    run('parse-mask shaping (2x 101-blur @512²)',
        lambda p: _shape_parse_masks(p, 512, m), (pids,))

    mask = jnp.asarray(rng.random((1, roi, roi, m)), jnp.float32)

    def edge_chain(packed):
        erosion1 = erode(packed, 4)
        center = erode(erosion1, 128)
        soft = gaussian_blur(center, 129)
        return erosion1, soft

    run('soft-edge chain (erode4+erode128+blur129)', edge_chain, (mask,))

    frames = jnp.asarray(rng.integers(0, 255, (16, 512, 683, 3)),
                         jnp.uint8)

    def canvas(fr):
        c = jax.image.resize(fr.astype(jnp.float32),
                             (16, 1024, 1366, 3), 'linear')
        return jnp.pad(c, ((0, 0), (0, 0), (0, 1408 - 1366), (0, 0)))

    run('canvas resize+pad', canvas, (frames,))

    canv = jnp.asarray(rng.random((16, 1024, 1408, 3)), jnp.float32)
    soft = jnp.asarray(rng.random((16, roi, roi, 1)), jnp.float32)
    pasted = jnp.asarray(rng.random((16, roi, roi, 3)), jnp.float32)
    roi_pos = jnp.asarray(
        np.stack([np.arange(16) % 16,
                  rng.integers(0, 1024 - roi, 16),
                  rng.integers(0, 1408 - roi, 16)], 1), jnp.int32)

    def blends(canv, soft, pasted, roi_pos):
        def body(s, acc):
            fi, y0, x0 = roi_pos[s, 0], roi_pos[s, 1], roi_pos[s, 2]
            patch = jax.lax.dynamic_slice(
                acc, (fi, y0, x0, 0), (1, roi, roi, 3))[0]
            blended = soft[s] * pasted[s] + (1 - soft[s]) * patch
            return jax.lax.dynamic_update_slice(
                acc, blended[None], (fi, y0, x0, 0))
        return jax.lax.fori_loop(0, 16, body, canv)

    run('16x ROI dynamic-slice blends', blends,
        (canv, soft, pasted, roi_pos))

    def u8_out(canv):
        return jnp.clip(jnp.round(canv), 0, 255).astype(jnp.uint8)

    run('final clip/round/cast', u8_out, (canv,))


if __name__ == '__main__':
    main()
