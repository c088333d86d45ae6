"""Throughput benchmarks on one chip. Prints ONE JSON line.

Headline metric: aligned 512x512 faces/sec (vs the estimated 12 faces/s
A100 batch-1 fp32 reference — the reference repo publishes no speed
numbers, BASELINE.md). Extra keys carry the end-to-end pipeline rates
(detect + align + restore + parse + composite) through
pipeline/device_pipeline.py, the fused device-resident path.

Timing honesty over the axon TPU tunnel: block_until_ready() does NOT
block (returns ~0.4ms while real compute is ~150ms), H2D crawls at
~30MB/s and D2H at ~10MB/s (measured; real hosts move GB/s). Every stage
is therefore forced by fetching a device-side SCALAR; bulk frame
upload/download is excluded from the timed region (frames are generated
on device). The detection, alignment-warp, restoration, parsing and
compositing graphs all run at full fidelity with one synthetic face per
frame (random weights execute the identical compute as released ones;
the detector graph runs but its boxes are replaced by synthetic
landmarks so exactly one face per frame always flows downstream).
"""
import json
import sys
import time

A100_REF_FACES_PER_SEC = 12.0


def _is_oom(exc):
    """True only for a genuine memory envelope (RESOURCE_EXHAUSTED /
    out-of-memory). Transient tunnel/compile flakes (INTERNAL, 'read
    body', connection resets) must NOT look like OOM: in round 4 one
    'remote_compile: read body: response body closed' at B=64 broke the
    bucket loop and the B=104 headline (~157 f/s) never ran, so the
    artifact under-reported this machine by 17% (BENCH_r04.json)."""
    msg = f'{type(exc).__name__}: {exc}'.lower()
    return ('resource_exhausted' in msg or 'out of memory' in msg
            or 'out-of-memory' in msg or 'oom' in msg.split())


def bench_aligned(n_batches=(1, 16, 32, 64, 104), attempts=3):
    # 104 is the largest bucket that fits one v5e: the forward's live
    # 512^2 activations are ~144MB/face, so B=128 needs 18.02G vs 16G
    # HBM and B=112 lands at 16.02G with weights — both genuine OOM,
    # not compiler flakiness (scripts/diag_b128.py; buffer donation
    # doesn't help since the inputs are a fraction of the activations).
    # Failure policy per bucket: genuine OOM breaks (larger buckets
    # can't fit either); anything else — tunnel resets, remote-compile
    # flakes, IO errors — is retried `attempts` times and then SKIPPED,
    # so one transient can never erase the larger buckets' results.
    """Aligned 512x512 faces/sec through the bare CodeFormer graph."""
    import os
    import jax
    import jax.numpy as jnp
    from codeformer_tpu.models import CodeFormer
    from codeformer_tpu.nn.blocks import set_colpack_mode
    from codeformer_tpu.utils.checkpoint import init_params_fast

    if os.environ.get('CODEFORMER_COLPACK'):
        # experimental Pallas enclaves; in-model parity with XLA on v5e
        set_colpack_mode(os.environ['CODEFORMER_COLPACK'])
    model = CodeFormer(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.device_put(init_params_fast(
        model, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), 0.5))

    @jax.jit
    def fwd_sum(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    results = {}
    for batch in n_batches:
        x = jax.random.uniform(rng, (batch, 512, 512, 3), jnp.bfloat16,
                               -1.0, 1.0)
        oom = False
        for attempt in range(attempts):
            try:
                s = fwd_sum(variables, x, 0.5)  # compile + warmup
                n_iter = max(4, int(64 / batch))
                # chain iterations through a data dependency (w_i
                # depends on the previous output) so ONE final scalar
                # fetch forces the whole sequence — per-call tunnel
                # round trips (~27ms) would otherwise tax every
                # iteration. The FIRST chained sequence of a process
                # runs ~20-60 ms/iter hot (measured tunnel warm-up
                # artifact), so run one full untimed chain first.
                for _ in range(n_iter):
                    s = fwd_sum(variables, x, 0.5 + 0.0 * s)
                float(s)
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    s = fwd_sum(variables, x, 0.5 + 0.0 * s)
                float(s)
                dt = time.perf_counter() - t0
                results[batch] = batch * n_iter / dt
                break
            except Exception as e:
                oom = _is_oom(e)
                kind = 'OOM' if oom else 'transient'
                print(f'batch {batch} attempt {attempt + 1}/{attempts} '
                      f'failed ({kind}): {type(e).__name__}: {e}',
                      file=sys.stderr)
                if oom:
                    break
        if oom:
            break  # genuine envelope: larger buckets can't fit either
    for b, v in results.items():
        print(f'aligned batch {b}: {v:.2f} faces/s', file=sys.stderr)
    return max(results.values()) if results else 0.0


def _build_e2e_pipe(frame_hw, chunk, faces_per_frame):
    """DeviceRestorePipeline with a detector whose REAL graph runs (and
    is timed) but whose host-side results are replaced with
    `faces_per_frame` synthetic faces per frame — so downstream stages
    process a deterministic face load regardless of the random weights.
    No keep-bucket pinning games: the injected detections don't saturate
    NMS (just like real weights on normal content), so no escalation
    triggers and the ceiling stays at its product default."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from codeformer_tpu.models import ParseNet
    from codeformer_tpu.pipeline.detector import FaceDetector
    from codeformer_tpu.pipeline.device_pipeline import DeviceRestorePipeline
    from codeformer_tpu.pipeline.restorer import CodeFormerRestorer
    from codeformer_tpu.utils.checkpoint import init_params_fast

    h, w = frame_hw
    template = np.array(
        [[192.98138, 239.94708], [318.90277, 240.1936],
         [256.63416, 314.01935], [201.26117, 371.41043],
         [313.08905, 371.15118]], np.float32)
    offsets = [(-140.0, -170.0), (60.0, -170.0),
               (-140.0, 30.0), (60.0, 30.0)][:faces_per_frame]
    synth_lms = [template * 0.45 + np.array([w / 2 + ox, h / 2 + oy])
                 for ox, oy in offsets]

    class BenchDetector(FaceDetector):
        def batched_detect_device_finish(self, frames_dev, det_hw,
                                         pending, **kw):
            outs, valids = pending
            np.asarray(valids)  # sync the dispatched graph (timed work)
            b = frames_dev.shape[0]
            det_scale = det_hw[0] / frames_dev.shape[1]
            dets = np.zeros((b, self.max_faces, 15), np.float32)
            vmask = np.zeros((b, self.max_faces), bool)
            for k, lm_f in enumerate(synth_lms):
                lm = lm_f * det_scale
                row = np.zeros(15, np.float32)
                row[0:4] = [lm[:, 0].min() - 30, lm[:, 1].min() - 60,
                            lm[:, 0].max() + 30, lm[:, 1].max() + 40]
                row[4] = 0.99
                row[5:15] = lm.reshape(-1)
                dets[:, k] = row
                vmask[:, k] = True
            return dets, vmask

    class Helper:
        # bf16 detection/parsing: the TPU-native precision policy of the
        # fused pipeline (see cli/whole_image.py); decode/NMS/argmax f32
        face_detector = BenchDetector('retinaface_resnet50',
                                      allow_random=True,
                                      dtype=jnp.bfloat16)
        face_template = template
        face_size = (512, 512)
        use_parse = True
        _parse_model = ParseNet(dtype=jnp.bfloat16)
        _parse_vars = jax.device_put(init_params_fast(
            _parse_model, jnp.zeros((1, 512, 512, 3))))

    restorer = CodeFormerRestorer(
        batch_buckets=(chunk, 2 * chunk, 4 * chunk))
    return DeviceRestorePipeline(restorer, Helper(), upscale=2,
                                 frame_chunk=chunk, w=0.5)


def bench_e2e(n_frames=32, frame_hw=(512, 683), chunk=16,
              faces_per_frame=1, folder_mode=False):
    """End-to-end frames/sec through DeviceRestorePipeline.

    folder_mode=True measures the fused FOLDER path (cli/whole_image.py):
    the same device graphs plus the per-image face-collection used for
    cropped/restored-face outputs. Bulk host<->device transfers stay
    excluded in both modes (tunnel artifact — see module docstring), so
    the folder number reflects the real extra per-image work, not the
    axon link."""
    import jax
    import jax.numpy as jnp

    h, w = frame_hw
    pipe = _build_e2e_pipe(frame_hw, chunk, faces_per_frame)

    # frames generated ON DEVICE: upload excluded (see module docstring)
    frames = jax.jit(lambda k: jax.random.randint(
        k, (n_frames, h, w, 3), 0, 255, jnp.uint8))(jax.random.PRNGKey(0))

    def run_once():
        collect = [] if folder_mode else None
        out = pipe.restore_frames_device(frames, collect_faces=collect)
        s = float(jnp.sum(out.astype(jnp.float32)))  # scalar force
        if folder_mode:
            for cropped, restored, counts in collect:
                s += float(jnp.sum(restored[:1, ::64, ::64, 0].astype(
                    jnp.float32)))  # force the face stream (tiny fetch)
        return s

    run_once()  # compile + warmup
    run_once()
    t0 = time.perf_counter()
    run_once()
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    mode = 'folder' if folder_mode else 'video'
    print(f'e2e device pipeline [{mode}, {faces_per_frame} face/frame]: '
          f'{fps:.2f} frames/s ({n_frames} frames of {h}x{w} in '
          f'{dt:.2f}s)', file=sys.stderr)
    return fps


def bench_train(batch=8, iters=8):
    """Stage-III joint train step (real trainer: idx_gt from the frozen
    VQGAN, code CE + feat L2 + L1 + LPIPS + adaptive-weight hinge GAN,
    d step, EMA) in faces/s on one chip, bf16, at the measured best
    single-chip batch (docs/roofline.md round-4 training section)."""
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                'scripts'))
    from bench_train_step import _patch_random_vgg, bench_batch
    _patch_random_vgg()
    dt = bench_batch(batch, 512, iters, 'bf16')
    return batch / dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')

    aligned = bench_aligned()

    def safe(fn, *a, **kw):
        # transient tunnel/compile flakes get 3 attempts; genuine OOM
        # doesn't (retrying can't shrink the envelope)
        for attempt in range(3):
            try:
                return fn(*a, **kw)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(f'{fn.__name__}{kw} attempt {attempt + 1}/3 '
                      f'failed: {type(e).__name__}: {e}', file=sys.stderr)
                if _is_oom(e):
                    break
        return 0.0

    e2e_fps = safe(bench_e2e)
    e2e_4face = safe(bench_e2e, faces_per_frame=4)
    folder_fps = safe(bench_e2e, folder_mode=True)
    train_fps = safe(bench_train)

    if aligned <= 0:
        print(json.dumps({'metric': 'aligned512_faces_per_sec_per_chip',
                          'value': 0.0, 'unit': 'faces/s',
                          'vs_baseline': 0.0}))
        return
    print(json.dumps({
        'metric': 'aligned512_faces_per_sec_per_chip',
        'value': round(aligned, 2),
        'unit': 'faces/s',
        'vs_baseline': round(aligned / A100_REF_FACES_PER_SEC, 3),
        'video_frames_per_sec': round(e2e_fps, 2),
        'video_frames_per_sec_4face': round(e2e_4face, 2),
        'whole_image_images_per_sec': round(folder_fps, 2),
        'train_stage3_faces_per_sec_bf16': round(train_fps, 2),
    }))


if __name__ == '__main__':
    main()
