"""Throughput benchmark: aligned 512x512 faces/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no speed numbers
(BASELINE.md). The driver's north star is ">=8x A100 per-frame throughput"
for the reference's batch=1 fp32 PyTorch inference. We use an estimated
A100 reference of 12 faces/sec (batch-1 fp32 inference of the ~94M-param
conv-heavy model, ~80ms/frame) — so vs_baseline = faces_per_sec / 12.0 and
the target is vs_baseline >= 8.
"""
import json
import sys
import time

A100_REF_FACES_PER_SEC = 12.0


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    import jax.numpy as jnp
    from codeformer_tpu.models import CodeFormer

    from codeformer_tpu.utils.checkpoint import init_params_fast
    model = CodeFormer(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.device_put(init_params_fast(
        model, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), 0.5))

    # NOTE: the result is reduced to a scalar and fetched each call.
    # block_until_ready() does NOT actually block over the axon TPU tunnel
    # (measured: 0.4ms/call "blocked" vs 150ms/call real), and fetching the
    # full image tensor crawls through the tunnel at ~1MB/s. A scalar fetch
    # forces execution with negligible transfer, giving honest timings.
    @jax.jit
    def fwd_sum(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    results = {}
    for batch in (1, 16, 32, 64):
        x = jax.random.uniform(rng, (batch, 512, 512, 3), jnp.bfloat16,
                               -1.0, 1.0)
        try:
            float(fwd_sum(variables, x, 0.5))  # compile + warmup
            float(fwd_sum(variables, x, 0.5))
            n_iter = max(4, int(64 / batch))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                float(fwd_sum(variables, x, 0.5))
            dt = time.perf_counter() - t0
            results[batch] = batch * n_iter / dt
        except Exception as e:  # OOM at large batch etc.
            print(f'batch {batch} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
            break

    if not results:
        print(json.dumps({'metric': 'aligned512_faces_per_sec_per_chip',
                          'value': 0.0, 'unit': 'faces/s',
                          'vs_baseline': 0.0}))
        return

    for b, v in results.items():
        print(f'batch {b}: {v:.2f} faces/s', file=sys.stderr)
    best = max(results.values())
    print(json.dumps({
        'metric': 'aligned512_faces_per_sec_per_chip',
        'value': round(best, 2),
        'unit': 'faces/s',
        'vs_baseline': round(best / A100_REF_FACES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
