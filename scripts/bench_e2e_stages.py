"""Per-stage timing of the fused device pipeline (device_pipeline.py) on
the real TPU chip, with the axon-honest recipe: every stage graph runs
inside an in-graph fori_loop chained through its inputs, one scalar fetch
forces the whole chain, and the first chain of the process is discarded
(tunnel warm-up artifact, docs/roofline.md).

Reproduces bench.py's e2e configuration (16-frame 512x683 chunks, one
synthetic face per frame, random weights) and times each device graph
with its REAL captured inputs: detect (resnet50 + mobile0.25), align
warp, restore, parse, composite. Use to decide where the frame budget
goes before optimizing.
"""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def scalarize(tree):
    import jax.numpy as jnp
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, 'dtype')]
    tot = jnp.float32(0)
    for leaf in leaves:
        v = leaf.astype(jnp.float32)
        tot = tot + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0))
    return tot


def perturb(args, s, skip=()):
    """Inject the chain scalar into every array arg except `skip` indices
    (weights pytrees): loop-carried inputs stop XLA hoisting the body."""
    import jax.numpy as jnp
    out = []
    for i, a in enumerate(args):
        if i in skip or not hasattr(a, 'dtype') or a.dtype == jnp.bool_:
            out.append(a)
        else:
            out.append(a + (0.0 * s).astype(a.dtype))
    return tuple(out)


def time_stage(name, fn, args, n_iter=8, skip=(), reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, s):
            out = fn(*perturb(args, s, skip))
            return 0.0 * scalarize(out) + s + 1.0
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    times = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        float(loop(args))
        dt = time.perf_counter() - t0
        if r:  # first chain runs hot (tunnel warm-up) — discard
            times.append(dt)
    per = (min(times) - 0.023) / n_iter  # ~23 ms/call tunnel tax
    print(f'{name:34s} {per * 1000:8.2f} ms/chunk '
          f'({per * 1000 / 16:6.2f} ms/frame)', flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--chunk', type=int, default=16)
    p.add_argument('--hw', type=int, nargs=2, default=(512, 683))
    p.add_argument('--faces-per-frame', type=int, default=1)
    args_cli = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    from codeformer_tpu.models import ParseNet
    from codeformer_tpu.pipeline.detector import FaceDetector
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.restorer import CodeFormerRestorer
    from codeformer_tpu.utils.checkpoint import init_params_fast

    h, w = args_cli.hw
    chunk = args_cli.chunk
    template = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    offsets = [(-140.0, -170.0), (110.0, -170.0), (-140.0, 60.0),
               (110.0, 60.0)][:args_cli.faces_per_frame]
    synth_lms = [template * 0.55 + np.array([w / 2 + ox, h / 2 + oy])
                 for ox, oy in offsets]

    rec = {}

    class BenchDetector(FaceDetector):
        MAX_FACES_CEILING = 32

        def _device_graph(self, *a):
            fn = super()._device_graph(*a)

            def wrapped(*fargs):
                rec['detect'] = (fn, fargs)
                return fn(*fargs)
            return wrapped

        def batched_detect_device_finish(self, frames_dev, det_hw,
                                         pending, **kw):
            dets, valids = super().batched_detect_device_finish(
                frames_dev, det_hw, pending, **kw)
            det_scale = det_hw[0] / frames_dev.shape[1]
            valids[:] = False
            for k, lm_f in enumerate(synth_lms):
                row = np.zeros(15, np.float32)
                lm = lm_f * det_scale
                row[0:4] = [lm[:, 0].min() - 30, lm[:, 1].min() - 60,
                            lm[:, 0].max() + 30, lm[:, 1].max() + 40]
                row[4] = 0.99
                row[5:15] = lm.reshape(-1)
                dets[:, k] = row
                valids[:, k] = True
            return dets, valids

    class Helper:
        face_detector = BenchDetector('retinaface_resnet50',
                                      allow_random=True,
                                      dtype=jnp.bfloat16)
        face_template = template
        face_size = (512, 512)
        use_parse = True
        _parse_model = ParseNet(dtype=jnp.bfloat16)
        _parse_vars = jax.device_put(init_params_fast(
            _parse_model, jnp.zeros((1, 512, 512, 3))))

    class RecPipeline(DeviceRestorePipeline):
        def _merged_graph(self, *a):
            fn = super()._merged_graph(*a)

            def wrapped(*fargs):
                rec['merged'] = (fn, fargs, a)
                return fn(*fargs)
            return wrapped

    restorer = CodeFormerRestorer(batch_buckets=(chunk, 2 * chunk,
                                                 4 * chunk))
    pipe = RecPipeline(restorer, Helper(), upscale=2, frame_chunk=chunk,
                       w=0.5)

    frames = jax.jit(lambda k: jax.random.randint(
        k, (chunk, h, w, 3), 0, 255, jnp.uint8))(jax.random.PRNGKey(0))

    # one full pipeline pass: compiles everything + captures stage inputs
    out = pipe.restore_frames_device(frames)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f'pipeline output {out.shape}; captured: {sorted(rec)}',
          file=sys.stderr, flush=True)

    # e2e wall (per bench.py recipe, 2 reps)
    def run_once():
        o = pipe.restore_frames_device(frames)
        return float(jnp.sum(o.astype(jnp.float32)))
    run_once()
    t0 = time.perf_counter()
    run_once()
    e2e = time.perf_counter() - t0
    print(f'{"e2e wall":34s} {e2e * 1000:8.2f} ms/chunk '
          f'({e2e * 1000 / chunk:6.2f} ms/frame) '
          f'= {chunk / e2e:.2f} frames/s', flush=True)

    total = 0.0
    fn, fa = rec['detect']
    total += time_stage('detect resnet50 bf16', fn, fa, skip=(0,))

    mfn, margs, mkey = rec['merged']
    in_hw, c, m, fpf, face, w_edge, use_parse, roi = mkey
    (fr, idx, a_pad, rvars, wv, pvars, map_pad, ia_pad, roi_pos) = margs
    warp_fn = pipe._warp_graph(in_hw, m, face)
    total += time_stage('align warp', warp_fn, (fr, idx, a_pad))
    faces_rgb = warp_fn(fr, idx, a_pad)
    rest_fn = restorer._fwd

    def restore_fn(variables, x, w_in):
        return rest_fn(variables, x, w_in, True, True)
    total += time_stage('restore B=%d' % faces_rgb.shape[0], restore_fn,
                        (rvars, faces_rgb, wv), skip=(0,))
    parse_fn = pipe._parse_graph(m)
    total += time_stage('parse', parse_fn, (pvars, faces_rgb), skip=(0,))
    pids = parse_fn(pvars, faces_rgb)
    comp_fn = pipe._composite_graph(in_hw, c, fpf, face, w_edge,
                                    use_parse, roi)
    total += time_stage('composite', comp_fn,
                        (fr, faces_rgb, map_pad, ia_pad, roi_pos, pids))
    print(f'{"sum of stages":34s} {total * 1000:8.2f} ms/chunk '
          f'({total * 1000 / 16:6.2f} ms/frame)', flush=True)
    time_stage('merged chunk graph (one dispatch)', mfn, margs,
               skip=(3, 5))

    # --- detection alternatives -------------------------------------
    det2 = FaceDetector('retinaface_mobile0.25', allow_random=True,
                        dtype=jnp.bfloat16)
    det_scale = pipe.detect_resize / min(h, w)
    det_hw = (int(h * det_scale), int(w * det_scale))
    det2.batched_detect_device(frames, det_hw)  # compile
    key = [k for k in det2._jitted if k[0] == 'device'][0]
    fn2 = det2._jitted[key]
    _, fa = rec['detect']
    time_stage('detect mobile0.25 bf16', fn2,
               (det2.variables,) + tuple(fa[1:]), skip=(0,))


if __name__ == '__main__':
    main()
