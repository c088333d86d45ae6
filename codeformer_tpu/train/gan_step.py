"""Jittable GAN training steps for the CodeFormer stages.

Functional re-design of the reference's optimize_parameters loops
(basicsr/models/{vqgan_model,codeformer_model,codeformer_joint_model}.py):
one pure function per step = (state, batch) -> (state, metrics), pjit-able
over a device mesh. Gradient averaging across the data axis falls out of the
batch sharding — no DDP/dist.reduce machinery.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .losses import cross_entropy_loss, gan_loss, l1_loss, mse_loss


class GANTrainState(NamedTuple):
    step: jax.Array
    params_g: Any
    params_g_ema: Any
    opt_g: Any
    params_d: Any
    d_stats: Any          # discriminator BatchNorm running stats
    opt_d: Any


def ema_update(ema_params, params, decay: float = 0.999):
    """Shadow-EMA of the generator (reference base_model.py:51-58)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def _split_microbatches(tree, n: int):
    """Split every (B, ...) leaf into (n, B//n, ...) microbatches for
    gradient accumulation. The split INTERLEAVES elements
    (x.reshape(B//n, n).swapaxes(0, 1)) rather than slicing contiguous
    blocks: under a data-parallel mesh the leading dim is sharded over
    contiguous chunks, and the interleaved layout keeps every microbatch
    evenly spread across the devices instead of parking whole
    microbatches on single devices. Which elements share a microbatch is
    irrelevant to the accumulated gradient of a mean-reduced loss."""
    def split(x):
        b = x.shape[0]
        if b % n:
            raise ValueError(
                f'accum_steps={n} must divide the (padded) batch size, '
                f'got batch={b}')
        return jnp.swapaxes(x.reshape((b // n, n) + x.shape[1:]), 0, 1)
    return jax.tree.map(split, tree)


def _accum_microbatches(fn, batch, n: int, carry=None):
    """Gradient-accumulation driver: lax.scan `fn` over n interleaved
    microbatches of `batch`, averaging its outputs.

    fn(carry, microbatch, i) -> (carry, out_tree); every out_tree leaf
    is accumulated as a running mean in its own dtype. Gradients of
    mean-reduced losses over equal-size microbatches therefore average
    to the exact full-batch gradient, so one optimizer update after the
    scan reproduces the large-batch step while only one microbatch of
    activations is ever live (the reference has no accumulation — it
    reaches global batch 32 as 8 GPUs x 4, options/*.yml; this reaches
    it on any chip count). Returns (carry, mean_out_tree)."""
    micro = _split_microbatches(batch, n)
    mb0 = jax.tree.map(lambda x: x[0], micro)
    out_sd = jax.eval_shape(lambda c, m: fn(c, m, jnp.int32(0))[1],
                            carry, mb0)
    acc0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_sd)

    def body(state, xs):
        c, acc = state
        mb, i = xs
        c, out = fn(c, mb, i)
        acc = jax.tree.map(lambda a, o: a + o.astype(a.dtype) / n,
                           acc, out)
        return (c, acc), None

    (carry, acc), _ = jax.lax.scan(
        body, (carry, acc0), (micro, jnp.arange(n, dtype=jnp.int32)))
    return carry, acc


def make_codeformer_train_step(
    model, disc, opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation, *,
    fidelity_weight: float = 1.0,
    ce_weight: float = 0.5,
    feat_weight: float = 1.0,
    pixel_weight: float = 1.0,
    gan_weight: float = 1.0,
    ema_decay: float = 0.999,
    accum_steps: int = 1,
) -> Callable[[GANTrainState, Dict[str, jax.Array]],
              Tuple[GANTrainState, Dict[str, jax.Array]]]:
    """Build a joint stage-III-style train step.

    Losses follow codeformer_model.py:162-232: code cross-entropy + latent
    feature L2 + pixel L1 + hinge GAN for the generator; real/fake hinge for
    the discriminator; EMA of generator params.

    batch keys: 'in' (B,H,W,3) degraded, 'gt' (B,H,W,3) target,
                'latent_gt' (B, T) int32 ground-truth code indices,
                'quant_gt' (B, h, w, D) ground-truth quantized latents.

    accum_steps > 1 scans that many interleaved microbatches and averages
    the grads before the single optimizer update (_accum_microbatches) —
    exact for the generator; the discriminator's batchnorm sees
    microbatch statistics. Composes with mesh sharding: each device
    accumulates over its local share of every microbatch.
    """

    def g_loss_fn(params_g, params_d, d_stats, batch):
        out, logits, lq_feat = model.apply(
            {'params': params_g}, batch['in'], fidelity_weight,
            detach_16=True, adain=False)
        l_ce = cross_entropy_loss(
            logits, batch['latent_gt'], loss_weight=ce_weight)
        l_feat = mse_loss(lq_feat, batch['quant_gt'],
                          loss_weight=feat_weight)
        l_pix = l1_loss(out, batch['gt'], loss_weight=pixel_weight)
        fake_pred = disc.apply(
            {'params': params_d, 'batch_stats': d_stats}, out, train=False)
        l_gan = gan_loss(fake_pred, True, 'hinge', is_disc=False,
                         loss_weight=gan_weight)
        total = l_ce + l_feat + l_pix + l_gan
        metrics = {'l_ce': l_ce, 'l_feat': l_feat, 'l_pix': l_pix,
                   'l_g_gan': l_gan, 'out': out}
        return total, metrics

    def d_loss_fn(params_d, d_stats, real, fake):
        real_pred, mut = disc.apply(
            {'params': params_d, 'batch_stats': d_stats}, real, train=True,
            mutable=['batch_stats'])
        fake_pred, mut = disc.apply(
            {'params': params_d, 'batch_stats': mut['batch_stats']},
            fake, train=True, mutable=['batch_stats'])
        l_real = gan_loss(real_pred, True, 'hinge', is_disc=True)
        l_fake = gan_loss(fake_pred, False, 'hinge', is_disc=True)
        return l_real + l_fake, (mut['batch_stats'],
                                 {'l_d_real': l_real, 'l_d_fake': l_fake})

    def step(state: GANTrainState, batch):
        def micro(d_stats_chain, mb):
            (g_total, g_metrics), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params_g, state.params_d,
                                         state.d_stats, mb)
            out = g_metrics.pop('out')
            (d_total, (new_stats, d_metrics)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.params_d, d_stats_chain, mb['gt'],
                    jax.lax.stop_gradient(out))
            scalars = {'l_g_total': g_total, 'l_d_total': d_total,
                       **g_metrics, **d_metrics}
            return new_stats, (g_grads, d_grads, scalars)

        if accum_steps == 1:
            d_stats, (g_grads, d_grads, metrics) = micro(state.d_stats,
                                                         batch)
        else:
            d_stats, (g_grads, d_grads, metrics) = _accum_microbatches(
                lambda c, mb, i: micro(c, mb), batch, accum_steps,
                carry=state.d_stats)

        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g,
                                              state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)
        params_g_ema = ema_update(state.params_g_ema, params_g, ema_decay)

        d_updates, opt_d_state = opt_d.update(d_grads, state.opt_d,
                                              state.params_d)
        params_d = optax.apply_updates(state.params_d, d_updates)
        new_state = GANTrainState(
            step=state.step + 1, params_g=params_g,
            params_g_ema=params_g_ema, opt_g=opt_g_state,
            params_d=params_d, d_stats=d_stats, opt_d=opt_d_state)
        return new_state, metrics

    return step


def init_gan_train_state(model, disc, opt_g, opt_d, rng,
                         sample_batch) -> GANTrainState:
    """Initialize params/optimizers for the joint step."""
    rng_g, rng_d = jax.random.split(rng)
    vars_g = model.init(rng_g, sample_batch['in'], 1.0)
    vars_d = disc.init(rng_d, sample_batch['gt'], train=False)
    params_g = vars_g['params']
    params_d = vars_d['params']
    d_stats = vars_d.get('batch_stats', {})
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_g_ema=jax.tree.map(jnp.asarray, params_g),
        opt_g=opt_g.init(params_g),
        params_d=params_d,
        d_stats=d_stats,
        opt_d=opt_d.init(params_d))
