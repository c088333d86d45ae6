"""Per-segment budget of the stage-III joint train step on one TPU chip.

The round-3 measurement (scripts/bench_train_step.py) put the shipped
bf16 B=1 step at ~1266 ms — roughly 10x the time its ~5 TFLOP should
take at the model's own measured XLA conv ceilings (docs/roofline.md).
This bench decomposes the step into nested supersets so the gap can be
attributed line by line:

  idx       frozen-VQGAN encode + nearest-code indices (idx_gt)
  fwd       net_g forward (w=1.3, detach_16)
  loss      fwd + image losses (L1 + LPIPS[VGG16]) + disc fwd (value only)
  pull1_t   loss + ONE vjp pull w.r.t. the TRAINABLE subtree
  pull2_t   loss + TWO pulls (shipped adaptive-d-weight scheme), trainable
  pull1_f   loss + ONE pull w.r.t. ALL params (incl. frozen generator dW)
  pull2_f   loss + TWO pulls, all params (the round-3 shipped scheme)
  dstep     disc real/fake hinge value_and_grad (given images)
  opt       Adam update + EMA over the trainable tree

Differences: fwd = model forward; loss-fwd = loss-side forwards;
pull1_t-loss = one backward; pull2_t-pull1_t = the second cotangent
pull; pull1_f-pull1_t = the frozen generator/quantize backward-weight
work the trainable split eliminates.

Methodology (docs/roofline.md "Axon measurement pitfalls"): every
segment runs as an in-graph lax.fori_loop whose iterations are data-
chained through the segment's *input* (loop-carried scalar), weights
passed as jit args (never closed-over device arrays), one scalar fetch
per measurement, each chain run twice with rep0 discarded.

Run:  python scripts/bench_train_segments.py [--batch 1] [--iters 8]
CPU smoke:  JAX_PLATFORMS=cpu python scripts/bench_train_segments.py \
    --img 64 --batch 1 --iters 2
"""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from bench_train_step import build_opt, _patch_random_vgg  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--img', type=int, default=512)
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--mixed', type=str, default='bf16',
                   choices=['bf16', 'none'])
    args = p.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    from jax import lax
    if os.environ.get('JAX_PLATFORMS', '').lower() == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_platform_name', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    _patch_random_vgg()

    from codeformer_tpu.train.trainers import (_split_params, build_model)
    from codeformer_tpu.ops.vq import nearest_code_indices

    mixed = None if args.mixed == 'none' else args.mixed
    model = build_model(build_opt(args.batch, args.img, mixed))
    B, img = args.batch, args.img

    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.uniform(-1, 1, (B, img, img, 3)),
                       jnp.float32)
    gt = jnp.asarray(rng.uniform(-1, 1, (B, img, img, 3)), jnp.float32)
    p_train, frozen = _split_params(model.state.params_g,
                                    model._fix_keys)
    # CRITICAL: stage every operand on device ONCE. Freshly-initialized
    # trainer state holds host numpy leaves; passing those to a jit
    # re-uploads ~280 MB of params through the tunnel EVERY call, and
    # the "bench" times H2D transfer instead of compute (observed: the
    # same encoder 7.6 ms with device params vs 451 ms with host ones).
    p_train = jax.device_put(p_train)
    frozen = jax.device_put(frozen)
    params_d = jax.device_put(model.state.params_d)
    d_stats = jax.device_put(model.state.d_stats)
    vq = model.vqgan_params  # already device (trainers device_put it)
    w = jnp.float32(1.3)
    hw = img // 32

    def idx_fn(vq, g):
        x, _ = model.hq_vqgan.apply({'params': vq}, g,
                                    method=lambda m, im: m.encoder(im))
        emb = vq['quantize']['embedding']
        return nearest_code_indices(x.reshape(-1, emb.shape[1]),
                                    emb).reshape(g.shape[0], -1)

    idx_gt = jax.jit(idx_fn)(vq, gt)
    idx_gt = jax.block_until_ready(idx_gt)

    def losses(p_train, frozen, x, gt, idx_gt):
        """Mirrors CodeFormerJointModel._make_full_step.losses."""
        params_g = {**p_train, **frozen}
        out, logits, lq_feat = model.net_g.apply(
            {'params': params_g}, x, w, detach_16=True)
        code_total, _ = model._code_losses(params_g, logits, lq_feat,
                                           idx_gt)
        l_pix = model._pixel_loss(out, gt)
        l_percep = model.cri_perceptual(out, gt)
        fake_pred = model.net_d.apply(
            {'params': params_d, 'batch_stats': d_stats}, out,
            train=False)
        l_gan = model._gan_loss(fake_pred, True, is_disc=False)
        return (code_total + l_pix + l_percep, l_gan), out

    def _first_leaf(tree):
        """Chain scalar over the WHOLE tree. Chaining on a single leaf
        would let XLA dead-code-eliminate every other leaf's backward-
        weight kernel (measured: pull segments undercounting by ~2x,
        supersets timing below subsets)."""
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    # ---------------- segments: (carry_scalar) -> new scalar ----------
    def seg_idx(s, vq, gt):
        idx = idx_fn(vq, gt + s * 1e-6)
        return jnp.sum(idx).astype(jnp.float32) * 1e-12

    def seg_fwd(s, p_train, frozen, x, gt):
        params_g = {**p_train, **frozen}
        out, logits, lq_feat = model.net_g.apply(
            {'params': params_g}, x + s * 1e-6, w, detach_16=True)
        return jnp.mean(out).astype(jnp.float32) * 1e-3

    def seg_loss(s, p_train, frozen, x, gt, idx_gt):
        (main, l_gan), _ = losses(p_train, frozen, x + s * 1e-6, gt,
                                  idx_gt)
        return main.astype(jnp.float32) * 1e-6

    def _pulls(s, diff_params, static_params, x, gt, idx_gt, n_pulls):
        def f(dp):
            return losses(dp, static_params, x + s * 1e-6, gt, idx_gt)
        vals, vjp_fn, _ = jax.vjp(f, diff_params, has_aux=True)
        g1 = vjp_fn((jnp.float32(1.0), jnp.float32(0.0)))[0]
        out = _first_leaf(g1) * 1e-6
        if n_pulls == 2:
            g2 = vjp_fn((jnp.float32(0.0), jnp.float32(1.0)))[0]
            out = out + _first_leaf(g2) * 1e-6
        return out

    def seg_pull1_t(s, p_train, frozen, x, gt, idx_gt):
        return _pulls(s, p_train, frozen, x, gt, idx_gt, 1)

    def seg_pull2_t(s, p_train, frozen, x, gt, idx_gt):
        return _pulls(s, p_train, frozen, x, gt, idx_gt, 2)

    def seg_pull1_f(s, p_train, frozen, x, gt, idx_gt):
        merged = {**p_train, **frozen}
        return _pulls(s, merged, {}, x, gt, idx_gt, 1)

    def seg_pull2_f(s, p_train, frozen, x, gt, idx_gt):
        merged = {**p_train, **frozen}
        return _pulls(s, merged, {}, x, gt, idx_gt, 2)

    def seg_single(s, p_train, frozen, x, gt, idx_gt):
        """The round-4 shipped accum==1 scheme (trainers.py
        micro_single): two anchor-only d_weight probes (DCE'd to the
        decoder-tail + loss-head backward) + ONE full backward with
        the combined cotangent (1, d_weight)."""
        from codeformer_tpu.train.trainers import _get_leaf, _l2norm

        def f(dp):
            return losses(dp, frozen, x + s * 1e-6, gt, idx_gt)
        vals, vjp_fn, _ = jax.vjp(f, p_train, has_aux=True)
        leaf_m = _get_leaf(vjp_fn((1.0, 0.0))[0], model._anchor)
        leaf_g = _get_leaf(vjp_fn((0.0, 1.0))[0], model._anchor)
        dw = jnp.clip(_l2norm(leaf_m) / (_l2norm(leaf_g) + 1e-4),
                      0.0, 1.0) * 0.8
        grads = vjp_fn((jnp.float32(1.0), dw))[0]
        return _first_leaf(grads) * 1e-6

    def seg_dstep(s, params_d, d_stats, gt, x):
        (_, _), d_grads = jax.value_and_grad(
            model._d_loss_fn, has_aux=True)(
                params_d, d_stats, gt + s * 1e-6, x)
        return _first_leaf(d_grads) * 1e-6

    grads0 = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))(p_train)
    opt_state0 = jax.device_put(model.opt_g_tx.init(p_train))

    def seg_opt(s, p_train, grads0, opt_state0, ema0):
        import optax
        grads = jax.tree.map(lambda g: g + s * 1e-9, grads0)
        updates, _ = model.opt_g_tx.update(grads, opt_state0, p_train)
        new_p = optax.apply_updates(p_train, updates)
        from codeformer_tpu.train.gan_step import ema_update
        ema = ema_update(ema0, new_p, 0.997)
        return _first_leaf(ema) * 1e-6

    # ----------------------------- harness ---------------------------
    def measure(name, seg, *op_args):
        fn = jax.jit(
            lambda ops: lax.fori_loop(
                0, args.iters, lambda i, s: seg(s, *ops),
                jnp.float32(0.0)))
        try:
            # force with a VALUE FETCH: block_until_ready does not block
            # over the axon tunnel (docs/roofline.md)
            float(fn(op_args))            # compile + hot-start chain
            t0 = time.perf_counter()
            float(fn(op_args))
        except Exception as e:  # OOM at large B (e.g. pull2_f holds two
            print(f'{name:10s}   FAILED: {type(e).__name__} '
                  f'(likely HBM OOM)', flush=True)  # full grad trees)
            return float('nan')
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f'{name:10s} {dt:9.2f} ms/iter', flush=True)
        return dt

    print(f'stage-III joint segments: B={B} img={img} '
          f'mixed={mixed or "f32"} iters={args.iters} '
          f'(in-graph chained loops, rep0 discarded)', flush=True)
    t = {}
    t['idx'] = measure('idx', seg_idx, vq, gt)
    t['fwd'] = measure('fwd', seg_fwd, p_train, frozen, x_in, gt)
    t['loss'] = measure('loss', seg_loss, p_train, frozen, x_in, gt,
                        idx_gt)
    t['pull1_t'] = measure('pull1_t', seg_pull1_t, p_train, frozen,
                           x_in, gt, idx_gt)
    t['pull2_t'] = measure('pull2_t', seg_pull2_t, p_train, frozen,
                           x_in, gt, idx_gt)
    t['pull1_f'] = measure('pull1_f', seg_pull1_f, p_train, frozen,
                           x_in, gt, idx_gt)
    t['pull2_f'] = measure('pull2_f', seg_pull2_f, p_train, frozen,
                           x_in, gt, idx_gt)
    t['single'] = measure('single', seg_single, p_train, frozen,
                          x_in, gt, idx_gt)
    t['dstep'] = measure('dstep', seg_dstep, params_d, d_stats, gt,
                         x_in)
    t['opt'] = measure('opt', seg_opt, p_train, grads0, opt_state0,
                       jax.tree.map(jnp.asarray, p_train))

    print('\nderived:')
    print(f"  loss-side fwd (LPIPS+disc+code): "
          f"{t['loss'] - t['fwd']:8.2f} ms")
    print(f"  one backward (trainable):        "
          f"{t['pull1_t'] - t['loss']:8.2f} ms")
    print(f"  second cotangent pull:           "
          f"{t['pull2_t'] - t['pull1_t']:8.2f} ms")
    print(f"  frozen-dW waste (1 pull):        "
          f"{t['pull1_f'] - t['pull1_t']:8.2f} ms")
    print(f"  frozen-dW waste (2 pulls):       "
          f"{t['pull2_f'] - t['pull2_t']:8.2f} ms")
    print(f"  single-backward vs two-pull:     "
          f"{t['single'] - t['pull2_t']:8.2f} ms")
    shipped = (t['idx'] + t['single'] + t['dstep'] + t['opt'])
    print(f"  sum (r4 shipped: idx+single+dstep+opt) = {shipped:8.2f} "
          f"ms/iter -> {B / shipped * 1000:6.2f} faces/s")
    old = (t['idx'] + t['pull2_t'] + t['dstep'] + t['opt'])
    print(f"  sum (r3 scheme: idx+pull2_t+dstep+opt) = {old:8.2f} "
          f"ms/iter -> {B / old * 1000:6.2f} faces/s")


if __name__ == '__main__':
    main()
