"""Diagnose the B=128 aligned-batch compile failure (bench.py round 2:
"OOMs the compiler"). Reproduces the failure, captures the real error,
and tries the cheap mitigations: buffer donation, and stepping batch
down to find the envelope."""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    from codeformer_tpu.models import CodeFormer
    from codeformer_tpu.utils.checkpoint import init_params_fast

    model = CodeFormer(dtype=jnp.bfloat16)
    variables = jax.device_put(init_params_fast(
        model, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), 0.5))

    def fwd_sum(variables, x, w):
        out, _, _ = model.apply(variables, x, w, adain=True)
        return jnp.sum(out.astype(jnp.float32))

    for batch, donate in [(128, False), (128, True), (120, False),
                          (112, False), (104, False)]:
        fn = jax.jit(fwd_sum, donate_argnums=(1,) if donate else ())
        x = jax.random.uniform(jax.random.PRNGKey(0),
                               (batch, 512, 512, 3), jnp.bfloat16,
                               -1.0, 1.0)
        tag = f'B={batch}{" donate" if donate else ""}'
        try:
            t0 = time.perf_counter()
            s = fn(variables, x, 0.5)
            for _ in range(2):
                s = fn(variables, x, 0.5 + 0.0 * s)
            float(s)
            t0 = time.perf_counter()
            n_iter = 3
            for _ in range(n_iter):
                s = fn(variables, x, 0.5 + 0.0 * s)
            float(s)
            dt = time.perf_counter() - t0
            print(f'{tag}: OK {batch * n_iter / dt:.1f} faces/s',
                  flush=True)
        except Exception as e:
            msg = str(e).split('\n')
            head = msg[0][:300]
            tail = [ln for ln in msg if 'hbm' in ln.lower()
                    or 'memory' in ln.lower()][:3]
            print(f'{tag}: FAIL {type(e).__name__}: {head}', flush=True)
            for ln in tail:
                print(f'    {ln[:200]}', flush=True)


if __name__ == '__main__':
    main()
