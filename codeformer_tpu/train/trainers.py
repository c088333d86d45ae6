"""Stage trainers: VQGAN (I), CodeFormerIdx (II), CodeFormer /
CodeFormerJoint (III).

Functional re-design of the reference model classes
(basicsr/models/{vqgan_model,codeformer_idx_model,codeformer_model,
codeformer_joint_model}.py): each trainer owns pure jitted step functions
over an explicit state pytree; the loss schedules, adaptive GAN weighting,
EMA, and frozen-module masking reproduce the reference semantics. Data
parallelism comes from batch sharding over a Mesh — no DDP wrapping.

Adaptive discriminator weight (vqgan_model.py:85-96): instead of torch's
retain_graph partial backwards we take ONE jax.vjp of the multi-output loss
and pull two cotangents through it — grads of (recon, gan) w.r.t. the
anchor layer come from the same forward residuals.
"""
from __future__ import annotations

import functools
import os.path as osp
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from codeformer_tpu.models import build_network
from codeformer_tpu.utils.checkpoint import (load_checkpoint, load_params,
                                             save_params)
from codeformer_tpu.utils.logger import get_root_logger
from codeformer_tpu.utils.registry import MODEL_REGISTRY
from .gan_step import _accum_microbatches, _split_microbatches, ema_update
from .losses import cross_entropy_loss, gan_loss, l1_loss
from .optimizers import build_optimizer
from .schedulers import build_schedule


def _get_leaf(tree, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


# gradient-accumulation machinery lives beside the pure step functions
# (gan_step.py); re-exported here for the trainers and their tests.


def _l2norm(x):
    return jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2))


def build_model(opt: Dict):
    """Factory mirroring basicsr/models/__init__.py:19-30."""
    model_type = opt['model_type']
    return MODEL_REGISTRY.get(model_type)(opt)


class TrainState(NamedTuple):
    step: jax.Array
    params_g: Any
    params_g_ema: Any
    opt_g: Any
    params_d: Optional[Any] = None
    d_stats: Optional[Any] = None
    opt_d: Optional[Any] = None


class BaseTrainer:
    """Common machinery: checkpoint IO, EMA, logging surface.

    Subclasses define _build() (nets + optimizers + jitted steps) and
    optimize_parameters(current_iter)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.logger = get_root_logger()
        self.log_dict: Dict[str, float] = {}
        self.train_opt = opt.get('train', {})
        self.ema_decay = self.train_opt.get('ema_decay', 0.0)
        # mixed_precision: bf16 — activations/compute in bfloat16,
        # params/optimizer/EMA/losses stay float32 (flax param_dtype
        # default; every loss in train/losses.py casts to f32 at entry).
        # The reference trains pure fp32 (no AMP anywhere in
        # basicsr/models/*); bf16 compute is the TPU-native policy that
        # halves the HBM activation traffic the 512^2 stages are bound
        # by. Off by default for bit-parity with the reference recipe.
        mp = str(opt.get('mixed_precision')
                 or self.train_opt.get('mixed_precision') or '').lower()
        if mp and mp not in ('bf16', 'bfloat16', 'none', 'fp32',
                             'float32'):
            raise ValueError(f'mixed_precision: unknown value {mp!r} '
                             f"(use 'bf16')")
        self.compute_dtype = jnp.bfloat16 if mp in ('bf16', 'bfloat16') \
            else jnp.float32
        # accum_steps: gradient accumulation — each optimizer step runs
        # accum_steps sequential microbatches (lax.scan) and averages
        # their grads, so only batch/accum_steps of activations is live
        # at once. Trades step latency for HBM: the reference recipe's
        # global batch 32 fits one chip as accum 16 x micro 2. Exact for
        # the generator update; the discriminator's batchnorm sees
        # microbatch statistics (the standard accumulation caveat).
        raw_accum = self.train_opt.get('accum_steps', 1)
        self.accum_steps = 1 if raw_accum is None else int(raw_accum)
        if self.accum_steps < 1:
            raise ValueError(
                f'accum_steps must be >= 1, got {self.accum_steps}')
        # remat: activation rematerialization — ResBlocks save only their
        # inputs for backward and recompute interiors (models/vqgan.py
        # `remat`), and the perceptual loss recomputes its VGG taps
        # instead of holding them. ~1/3 extra forward FLOPs on the
        # rematerialized pieces for a several-x cut in the activation
        # watermark the 512^2 training graph OOMs on. Exact (same grads,
        # same param tree); off by default.
        self.remat = bool(self.train_opt.get('remat', False))
        self._setup_mesh()
        self._build()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, P()))

    def _net(self, net_opt: Dict):
        """build_network with the trainer's compute dtype (and, for archs
        that support it, the remat flag) injected — explicit YAML keys
        win."""
        net_opt = dict(net_opt)
        if self.compute_dtype != jnp.float32:
            net_opt.setdefault('dtype', self.compute_dtype)
        if self.remat:
            import dataclasses
            from codeformer_tpu.utils.registry import ARCH_REGISTRY
            cls = ARCH_REGISTRY.get(net_opt['type'])
            if any(f.name == 'remat' for f in dataclasses.fields(cls)):
                net_opt.setdefault('remat', True)
        return build_network(net_opt)

    def _build_perceptual(self):
        """cri_perceptual from train: perceptual_opt (None if absent).
        Under remat the whole loss is jax.checkpoint'd: the backward
        keeps only (out, gt) and re-runs the VGG tap pyramid — at 512^2
        those taps (64ch@512^2, 128@256^2, ...) rival the generator's own
        activations."""
        self.has_perceptual = 'perceptual_opt' in self.train_opt
        if not self.has_perceptual:
            self.cri_perceptual = None
            return
        from .perceptual import build_perceptual_loss
        self.cri_perceptual = build_perceptual_loss(
            self.train_opt['perceptual_opt'], dtype=self.compute_dtype)
        if self.remat:
            self.cri_perceptual = jax.checkpoint(self.cri_perceptual,
                                                 prevent_cse=False)

    @staticmethod
    def _jit_step(fn):
        """jit a (state, ...) -> (state, metrics) step with the input
        state DONATED: every params/EMA/optimizer-moment buffer aliases
        its successor in place instead of coexisting with it, cutting
        the step's peak HBM by one full model+optimizer footprint
        (~1.1 GB for the 512 stage-III nets). Callers always replace
        self.state with the returned one, so the donated buffers are
        never re-read. CPU ignores donation (tests run unchanged)."""
        return jax.jit(fn, donate_argnums=(0,))

    def _setup_mesh(self):
        """Data-parallel mesh over all local devices (the DDP analog).
        Disable with opt['num_devices'] = 1."""
        self.mesh = None
        n = len(jax.devices())
        want = self.opt.get('num_devices')
        if n > 1 and (want is None or want > 1):
            from codeformer_tpu.parallel import create_mesh
            self.mesh = create_mesh(min(n, want or n), model_parallel=1)
            self.logger.info(
                f'data-parallel mesh over {self.mesh.shape["data"]} '
                f'devices')

    # ------------------------ checkpoint IO -------------------------
    def _net_path(self, name: str, current_iter) -> str:
        return osp.join(self.opt['path']['models'],
                        f'net_{name}_{current_iter}.ckpt')

    def save(self, epoch: int, current_iter: int):
        """Networks as {params, params_ema} + a .state file with optimizer
        states (the reference two-file scheme, base_model.py:170-280)."""
        tag = 'latest' if current_iter == -1 else current_iter
        save_params({'params': self.state.params_g,
                     'params_ema': self.state.params_g_ema},
                    self._net_path('g', tag))
        if self.state.params_d is not None:
            save_params({'params': self.state.params_d,
                         'batch_stats': self.state.d_stats or {}},
                        self._net_path('d', tag))
        state_dir = self.opt['path']['training_states']
        save_params({'opt_g': self.state.opt_g,
                     'opt_d': self.state.opt_d if self.state.opt_d
                     is not None else {},
                     'step': np.asarray(self.state.step),
                     'epoch': np.asarray(epoch),
                     'iter': np.asarray(current_iter)},
                    osp.join(state_dir, f'{tag}.state'))

    def resume_training(self, state_path: str):
        blob = load_params(state_path)
        tag = int(blob['iter'])
        g = load_params(self._net_path('g', tag))
        restored = {'params_g': g['params'], 'params_g_ema': g['params_ema'],
                    'step': jnp.asarray(blob['step'])}
        if self.state.params_d is not None:
            d = load_params(self._net_path('d', tag))
            restored.update(params_d=d['params'],
                            d_stats=d.get('batch_stats', {}))
        # optimizer states: restore leaf values into the existing treedefs
        def _refill(template, saved):
            leaves = jax.tree.leaves(saved)
            treedef = jax.tree.structure(template)
            return jax.tree.unflatten(treedef, leaves)
        restored['opt_g'] = _refill(self.state.opt_g, blob['opt_g'])
        if self.state.opt_d is not None:
            restored['opt_d'] = _refill(self.state.opt_d, blob['opt_d'])
        self.state = self.state._replace(**restored)
        return int(blob['epoch']), tag

    def _load_pretrain(self, net_key: str = 'network_g',
                       path_key: str = 'pretrain_network_g',
                       param_key: str = 'params_ema'):
        path = (self.opt.get('path') or {}).get(path_key)
        if path:
            variables = load_checkpoint(path, param_key=None)
            self.logger.info(f'Loaded pretrain for {net_key} from {path}')
            return variables.get('params', variables)
        return None

    # --------------------------- API --------------------------------
    def _stage_batch(self, data: Dict) -> Dict:
        """Transfer a host batch to device; with a mesh, shard it on the
        data axis (the per-device split DDP gets from its sampler).
        Batches whose leading dim does not divide the mesh are padded by
        repetition. Also the `stage` hook of data.loader.DevicePrefetcher
        (the CUDAPrefetcher analog): device_put is async, so staging one
        batch ahead overlaps H2D with the running step."""
        if any(isinstance(v, jax.Array) for v in data.values()):
            return {k: v for k, v in data.items()
                    if not isinstance(v, list)}  # already staged
        batch = {k: np.asarray(v) for k, v in data.items()
                 if not isinstance(v, list)}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = self.mesh.shape['data']
            b = next(iter(batch.values())).shape[0]
            if b % n:
                target = -(-b // n) * n
                reps = -(-target // b)
                batch = {k: np.concatenate([v] * reps)[:target]
                         for k, v in batch.items()}
            return {
                k: jax.device_put(
                    v, NamedSharding(self.mesh,
                                     P('data', *([None] * (v.ndim - 1)))))
                for k, v in batch.items()}
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def feed_data(self, data: Dict):
        """Stage a batch (no-op for batches a DevicePrefetcher already
        staged)."""
        self.batch = self._stage_batch(data)

    def get_current_log(self):
        return dict(self.log_dict)

    def get_current_learning_rate(self):
        return [float(self.schedule_g(self.state.step))]


def _merge_subtree(params: Dict, pretrained: Dict, keys) -> Dict:
    out = dict(params)
    for k in keys:
        if k in pretrained:
            out[k] = pretrained[k]
    return out


@MODEL_REGISTRY.register()
class SRModel(BaseTrainer):
    """Generic supervised SR trainer (basicsr/models/sr_model.py): net_g
    with pixel (+ perceptual) losses, single Adam, EMA, PSNR/SSIM
    validation via the metric registry."""

    def _build(self):
        opt = self.opt
        self.net_g = self._net(opt['network_g'])
        self._build_perceptual()
        pix = dict(self.train_opt.get('pixel_opt')
                   or {'type': 'L1Loss', 'loss_weight': 1.0})
        self.pixel_weight = pix.get('loss_weight', 1.0)
        self.pixel_type = pix.get('type', 'L1Loss')

        self.schedule_g = build_schedule(
            self.train_opt, self.train_opt['optim_g']['lr'])
        self.opt_g_tx = build_optimizer(self.train_opt['optim_g'],
                                        self.schedule_g)
        in_size = self.opt.get('datasets', {}).get('train', {}).get(
            'gt_size', 64)
        from codeformer_tpu.utils.checkpoint import init_params_fast
        sample = jnp.zeros((1, in_size, in_size, 3), jnp.float32)
        vars_g = init_params_fast(self.net_g, sample)
        params_g = self._load_pretrain() or vars_g['params']
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params_g=params_g,
            params_g_ema=jax.tree.map(jnp.asarray, params_g),
            opt_g=self.opt_g_tx.init(params_g))
        self._step = self._jit_step(self._make_step())

    def _pixel_loss(self, out, gt):
        from .losses import charbonnier_loss, mse_loss
        if self.pixel_type == 'MSELoss':
            return mse_loss(out, gt, loss_weight=self.pixel_weight)
        if self.pixel_type == 'CharbonnierLoss':
            return charbonnier_loss(out, gt, loss_weight=self.pixel_weight)
        return l1_loss(out, gt, loss_weight=self.pixel_weight)

    def _make_step(self):
        def loss_fn(params_g, batch):
            out = self.net_g.apply({'params': params_g}, batch['lq'])
            out = out[0] if isinstance(out, tuple) else out
            l_pix = self._pixel_loss(out, batch['gt'])
            total = l_pix
            metrics = {'l_pix': l_pix}
            if self.cri_perceptual:
                l_percep = self.cri_perceptual(out, batch['gt'])
                total = total + l_percep
                metrics['l_percep'] = l_percep
            return total, metrics

        accum = self.accum_steps

        def grads_of(params_g, batch):
            (total, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_g, batch)
            metrics['l_total'] = total
            return grads, metrics

        def step(state: TrainState, batch):
            if accum == 1:
                grads, metrics = grads_of(state.params_g, batch)
            else:
                _, (grads, metrics) = _accum_microbatches(
                    lambda c, mb, i: (c, grads_of(state.params_g, mb)),
                    batch, accum)
            updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                                  state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            params_g_ema = ema_update(state.params_g_ema, params_g,
                                      self.ema_decay or 0.999)
            return TrainState(state.step + 1, params_g, params_g_ema,
                              opt_g), metrics
        return step

    def optimize_parameters(self, current_iter: int):
        self.state, metrics = self._step(self.state, self.batch)
        self.log_dict = {k: float(v) for k, v in metrics.items()}


@MODEL_REGISTRY.register()
class VQGANModel(BaseTrainer):
    """Stage I: VQGAN GAN training (vqgan_model.py).

    g-step: L1 + perceptual + adaptive-weighted hinge GAN + codebook loss;
    d-step: real/fake hinge, gated by net_d_start_iter; EMA."""

    def _build(self):
        opt = self.opt
        self.net_g = self._net(opt['network_g'])
        self.net_d = self._net(opt.get('network_d', {
            'type': 'VQGANDiscriminator', 'nc': 3, 'ndf': 64}))
        self.l_weight_codebook = self.train_opt.get('codebook_loss_weight',
                                                    1.0)
        self.net_d_start_iter = int(self.train_opt.get('net_d_start_iter',
                                                       0))
        self.disc_weight = self.train_opt.get('disc_weight', 0.8)
        self._build_perceptual()

        self.schedule_g = build_schedule(
            self.train_opt, self.train_opt['optim_g']['lr'])
        self.schedule_d = build_schedule(
            self.train_opt, self.train_opt['optim_d']['lr'])
        self.opt_g_tx = build_optimizer(self.train_opt['optim_g'],
                                        self.schedule_g)
        self.opt_d_tx = build_optimizer(self.train_opt['optim_d'],
                                        self.schedule_d)

        img = opt['network_g'].get('img_size', 512)
        rng = jax.random.PRNGKey(opt.get('manual_seed', 0) or 0)
        sample = jnp.zeros((1, img, img, 3), jnp.float32)
        from codeformer_tpu.utils.checkpoint import init_params_fast
        vars_g = init_params_fast(self.net_g, sample)
        vars_d = self.net_d.init(jax.random.PRNGKey(1), sample, train=False)
        params_g = self._load_pretrain() or vars_g['params']
        params_d = vars_d['params']
        d_stats = vars_d.get('batch_stats', {})
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params_g=params_g,
            params_g_ema=jax.tree.map(jnp.asarray, params_g),
            opt_g=self.opt_g_tx.init(params_g), params_d=params_d,
            d_stats=d_stats, opt_d=self.opt_d_tx.init(params_d))

        # anchor for the adaptive GAN weight: last generator conv kernel
        # (vqgan_model.py:155: generator.blocks[-1].weight)
        last = max(int(k.split('_')[1])
                   for k in params_g['generator'] if k.startswith('blocks_'))
        self._anchor = ('generator', f'blocks_{last}', 'kernel')

        self._step = self._jit_step(self._make_step())

    def _make_step(self):
        is_gumbel = self.opt['network_g'].get('quantizer') == 'gumbel'

        def losses(params_g, params_d, d_stats, gt, temperature, rng):
            if is_gumbel:
                # temperature anneal handled by caller
                # (vqgan_model.py:120-123)
                out, l_codebook, stats = self.net_g.apply(
                    {'params': params_g}, gt, temperature=temperature,
                    train=True, rngs={'gumbel': rng})
                stats = dict(stats)
                stats.setdefault('perplexity', jnp.zeros(()))
            else:
                out, l_codebook, stats = self.net_g.apply(
                    {'params': params_g}, gt)
            l_codebook = l_codebook * self.l_weight_codebook
            l_pix = l1_loss(out, gt)
            l_percep = (self.cri_perceptual(out, gt)
                        if self.cri_perceptual else 0.0)
            recon = l_pix + l_percep
            fake_pred = self.net_d.apply(
                {'params': params_d, 'batch_stats': d_stats}, out,
                train=False)
            l_gan = gan_loss(fake_pred, True, 'hinge', is_disc=False)
            aux = {'l_g_pix': l_pix, 'l_codebook': l_codebook,
                   'perplexity': stats['perplexity'], 'out': out}
            if self.cri_perceptual:
                aux['l_g_percep'] = l_percep
            return (recon, l_gan, l_codebook), aux

        accum = self.accum_steps

        def step(state: TrainState, gt, current_iter):
            # gumbel temperature: max(1/16, 1 - iter/160000)
            temperature = jnp.maximum(
                1.0 / 16, 1.0 - current_iter.astype(jnp.float32) / 160000)
            rng = jax.random.fold_in(jax.random.PRNGKey(0), current_iter)

            def micro(d_stats_chain, gt_mb, rng_mb):
                """One microbatch: the two generator cotangent pulls +
                discriminator grads; chains the d batchnorm stats."""
                (vals, vjp_fn, aux) = jax.vjp(
                    functools.partial(losses, params_d=state.params_d,
                                      d_stats=state.d_stats, gt=gt_mb,
                                      temperature=temperature, rng=rng_mb),
                    state.params_g, has_aux=True)
                recon, l_gan, l_code = vals
                g_rc = vjp_fn((1.0, 0.0, 1.0))[0]
                g_gan = vjp_fn((0.0, 1.0, 0.0))[0]
                out = jax.lax.stop_gradient(aux.pop('out'))

                def d_loss(params_d, d_stats):
                    real_pred, mut = self.net_d.apply(
                        {'params': params_d, 'batch_stats': d_stats},
                        gt_mb, train=True, mutable=['batch_stats'])
                    fake_pred, mut = self.net_d.apply(
                        {'params': params_d,
                         'batch_stats': mut['batch_stats']}, out,
                        train=True, mutable=['batch_stats'])
                    l_real = gan_loss(real_pred, True, 'hinge',
                                      is_disc=True)
                    l_fake = gan_loss(fake_pred, False, 'hinge',
                                      is_disc=True)
                    return l_real + l_fake, (mut['batch_stats'],
                                             {'l_d_real': l_real,
                                              'l_d_fake': l_fake,
                                              'out_d_real':
                                                  jnp.mean(real_pred),
                                              'out_d_fake':
                                                  jnp.mean(fake_pred)})

                (_, (new_stats, d_aux)), d_grads = jax.value_and_grad(
                    d_loss, has_aux=True)(state.params_d, d_stats_chain)
                scalars = {'_recon': recon, '_l_gan': l_gan,
                           '_l_code': l_code, **aux, **d_aux}
                return new_stats, (g_rc, g_gan, d_grads, scalars)

            if accum == 1:
                d_stats, (g_rc, g_gan, d_grads, m) = micro(
                    state.d_stats, gt, rng)
            else:
                d_stats, (g_rc, g_gan, d_grads, m) = _accum_microbatches(
                    lambda c, mb, i: micro(c, mb['gt'],
                                           jax.random.fold_in(rng, i)),
                    {'gt': gt}, accum, carry=state.d_stats)
            recon = m.pop('_recon')
            l_gan = m.pop('_l_gan')
            l_code = m.pop('_l_code')
            aux = m
            leaf_rc = _get_leaf(g_rc, self._anchor)
            leaf_gan = _get_leaf(g_gan, self._anchor)
            d_weight = _l2norm(leaf_rc) / (_l2norm(leaf_gan) + 1e-4)
            d_weight = jnp.clip(d_weight, 0.0, 1.0) * self.disc_weight
            gan_on = (current_iter > self.net_d_start_iter).astype(
                jnp.float32)
            grads = jax.tree.map(
                lambda a, b: a + d_weight * gan_on * b, g_rc, g_gan)

            updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                                  state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            params_g_ema = ema_update(state.params_g_ema, params_g,
                                      self.ema_decay)

            # ---- discriminator ----
            d_grads = jax.tree.map(lambda g: g * gan_on, d_grads)
            d_stats = jax.tree.map(
                lambda new, old: gan_on * new + (1 - gan_on) * old,
                d_stats, state.d_stats)
            d_updates, opt_d = self.opt_d_tx.update(d_grads, state.opt_d,
                                                    state.params_d)
            params_d = optax.apply_updates(state.params_d, d_updates)

            metrics = {'l_g_total': recon + l_code
                       + d_weight * gan_on * l_gan,
                       'l_g_gan': d_weight * gan_on * l_gan,
                       'd_weight': d_weight, **aux}
            new_state = TrainState(
                step=state.step + 1, params_g=params_g,
                params_g_ema=params_g_ema, opt_g=opt_g, params_d=params_d,
                d_stats=d_stats, opt_d=opt_d)
            return new_state, metrics
        return step

    def optimize_parameters(self, current_iter: int):
        self.state, metrics = self._step(self.state, self.batch['gt'],
                                         jnp.int32(current_iter))
        self.log_dict = {k: float(v) for k, v in metrics.items()}


@MODEL_REGISTRY.register()
class CodeFormerIdxModel(BaseTrainer):
    """Stage II: code-sequence prediction pretraining
    (codeformer_idx_model.py): w=0, code_only, L2 latent-feature loss +
    cross-entropy on codebook indices; quantize/generator frozen."""

    def _build(self):
        opt = self.opt
        net_opt = dict(opt['network_g'])
        self.fix_modules = tuple(net_opt.pop('fix_modules',
                                             ('quantize', 'generator')))
        vqgan_path = net_opt.pop('vqgan_path', None)
        self.net_g = self._net(net_opt)

        self.hq_feat_loss = self.train_opt.get('use_hq_feat_loss', True)
        self.feat_loss_weight = self.train_opt.get('feat_loss_weight', 1.0)
        self.use_ce = self.train_opt.get('cross_entropy_loss', True)
        self.ce_weight = self.train_opt.get('entropy_loss_weight', 0.5)

        # frozen HQ VQGAN for on-the-fly latent GT
        # (codeformer_idx_model.py:46-57)
        self.generate_idx_gt = 'network_vqgan' in opt
        if self.generate_idx_gt:
            self.hq_vqgan = self._net(opt['network_vqgan'])

        self.schedule_g = build_schedule(
            self.train_opt, self.train_opt['optim_g']['lr'])
        self.opt_g_tx = build_optimizer(self.train_opt['optim_g'],
                                        self.schedule_g, self.fix_modules)

        img = 512 if 'img_size' not in opt['network_g'] else \
            opt['network_g']['img_size']
        img = self.opt.get('datasets', {}).get('train', {}).get(
            'in_size', img)
        from codeformer_tpu.utils.checkpoint import init_params_fast
        sample = jnp.zeros((1, img, img, 3), jnp.float32)
        vars_g = init_params_fast(self.net_g, sample, 0.0)
        params_g = self._load_pretrain() or vars_g['params']
        if vqgan_path and osp.exists(vqgan_path):
            vq = load_checkpoint(vqgan_path)
            params_g = _merge_subtree(
                params_g, vq['params'],
                ('encoder', 'quantize', 'generator'))
        if self.generate_idx_gt:
            vq_pre = self._load_pretrain('network_vqgan',
                                         'pretrain_network_vqgan')
            if vq_pre is None and vqgan_path and osp.exists(vqgan_path):
                vq_pre = load_checkpoint(vqgan_path)['params']
            if vq_pre is None:
                vq_pre = init_params_fast(
                    self.hq_vqgan, sample)['params']
            self.vqgan_params = jax.device_put(vq_pre)

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params_g=params_g,
            params_g_ema=jax.tree.map(jnp.asarray, params_g),
            opt_g=self.opt_g_tx.init(params_g))
        self._step = self._jit_step(self._make_step())

    def _latent_hw(self):
        # 512 -> 16 for the fixed backbone (codeformer_arch.py:259)
        return 16

    def _idx_gt(self, params_g, gt, batch):
        if 'latent_gt' in batch:
            return batch['latent_gt']
        x, _ = self.hq_vqgan.apply(
            {'params': self.vqgan_params}, gt,
            method=lambda m, g: m.encoder(g))
        # nearest-code indices from the frozen codebook
        from codeformer_tpu.ops.vq import nearest_code_indices
        emb = self.vqgan_params['quantize']['embedding']
        idx = nearest_code_indices(x.reshape(-1, emb.shape[1]), emb)
        return idx.reshape(gt.shape[0], -1)

    def _make_step(self):
        def loss_fn(params_g, batch, idx_gt):
            logits, lq_feat = self.net_g.apply(
                {'params': params_g}, batch['in'], 0.0, code_only=True)
            b = lq_feat.shape[0]
            hw = lq_feat.shape[1]
            total = 0.0
            metrics = {}
            if self.hq_feat_loss:
                from codeformer_tpu.ops.vq import codebook_lookup
                emb = params_g['quantize']['embedding']
                quant_gt = codebook_lookup(
                    idx_gt.reshape(-1), emb,
                    jnp.float32).reshape(b, hw, hw, -1)
                l_feat = jnp.mean(
                    (jax.lax.stop_gradient(quant_gt)
                     - lq_feat.astype(jnp.float32)) ** 2) \
                    * self.feat_loss_weight
                total = total + l_feat
                metrics['l_feat_encoder'] = l_feat
            if self.use_ce:
                l_ce = cross_entropy_loss(logits, idx_gt,
                                          loss_weight=self.ce_weight)
                total = total + l_ce
                metrics['cross_entropy_loss'] = l_ce
            return total, metrics

        accum = self.accum_steps

        def grads_of(params_g, batch, idx_gt):
            (total, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_g, batch, idx_gt)
            metrics['l_g_total'] = total
            return grads, metrics

        def step(state: TrainState, batch):
            if accum == 1:
                idx_gt = self._idx_gt(state.params_g, batch['gt'], batch)
                grads, metrics = grads_of(state.params_g, batch, idx_gt)
            else:
                # idx_gt (frozen-VQGAN encode) runs per microbatch too,
                # so its activations share the microbatch footprint
                def micro(c, mb, i):
                    idx_gt = self._idx_gt(state.params_g, mb['gt'], mb)
                    return c, grads_of(state.params_g, mb, idx_gt)
                _, (grads, metrics) = _accum_microbatches(
                    micro, batch, accum)
            updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                                  state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            params_g_ema = ema_update(state.params_g_ema, params_g,
                                      self.ema_decay)
            return TrainState(state.step + 1, params_g, params_g_ema,
                              opt_g), metrics
        return step

    def optimize_parameters(self, current_iter: int):
        self.state, metrics = self._step(self.state, self.batch)
        self.log_dict = {k: float(v) for k, v in metrics.items()}


@MODEL_REGISTRY.register()
class CodeFormerJointModel(BaseTrainer):
    """Stage III (shipped): joint schedule alternating small/large
    degradation (codeformer_joint_model.py:153-171):
      iter <= 40k: w=1 small; <= 80k: w=1.3 small; <= 120k: code-only
      large; then mixed (1 in 15 large)."""

    def _build(self):
        opt = self.opt
        net_opt = dict(opt['network_g'])
        self.fix_modules = tuple(net_opt.pop('fix_modules',
                                             ('quantize', 'generator')))
        net_opt.pop('vqgan_path', None)
        self.net_g = self._net(net_opt)
        self.net_d = self._net(opt.get('network_d', {
            'type': 'VQGANDiscriminator'}))
        self.fix_generator = 'generator' in self.fix_modules

        self.hq_feat_loss = self.train_opt.get('use_hq_feat_loss', True)
        self.feat_loss_weight = self.train_opt.get('feat_loss_weight', 1.0)
        self.use_ce = self.train_opt.get('cross_entropy_loss', True)
        self.ce_weight = self.train_opt.get('entropy_loss_weight', 0.5)
        self.scale_adaptive_gan_weight = self.train_opt.get(
            'scale_adaptive_gan_weight', 0.8)
        self.net_d_start_iter = int(self.train_opt.get('net_d_start_iter',
                                                       0))
        self._build_perceptual()

        self.generate_idx_gt = 'network_vqgan' in opt
        if self.generate_idx_gt:
            self.hq_vqgan = self._net(opt['network_vqgan'])

        self.schedule_g = build_schedule(
            self.train_opt, self.train_opt['optim_g']['lr'])
        self.schedule_d = build_schedule(
            self.train_opt, self.train_opt['optim_d']['lr'])
        self.opt_g_tx = build_optimizer(self.train_opt['optim_g'],
                                        self.schedule_g, self.fix_modules)
        self.opt_d_tx = build_optimizer(self.train_opt['optim_d'],
                                        self.schedule_d)

        img = self.opt.get('datasets', {}).get('train', {}).get(
            'in_size', 512)
        from codeformer_tpu.utils.checkpoint import init_params_fast
        sample = jnp.zeros((1, img, img, 3), jnp.float32)
        vars_g = init_params_fast(self.net_g, sample, 1.0)
        params_g = self._load_pretrain() or vars_g['params']
        vars_d = self.net_d.init(jax.random.PRNGKey(1), sample,
                                 train=False)
        params_d = self._load_pretrain(
            'network_d', 'pretrain_network_d') or vars_d['params']
        d_stats = vars_d.get('batch_stats', {})
        if self.generate_idx_gt:
            vq_pre = self._load_pretrain('network_vqgan',
                                         'pretrain_network_vqgan')
            if vq_pre is None:
                vq_pre = init_params_fast(self.hq_vqgan,
                                          sample)['params']
            self.vqgan_params = jax.device_put(vq_pre)

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params_g=params_g,
            params_g_ema=jax.tree.map(jnp.asarray, params_g),
            opt_g=self.opt_g_tx.init(params_g), params_d=params_d,
            d_stats=d_stats, opt_d=self.opt_d_tx.init(params_d))

        largest = str(max(int(s) for s in
                          opt['network_g']['connect_list']))
        if self.fix_generator:
            self._anchor = (f'fuse_convs_dict_{largest}', 'shift_2',
                            'kernel')
        else:
            last = max(int(k.split('_')[1])
                       for k in params_g['generator']
                       if k.startswith('blocks_'))
            self._anchor = ('generator', f'blocks_{last}', 'kernel')

        self._step_full = self._jit_step(self._make_full_step())
        self._step_code = self._jit_step(self._make_code_step())

    def _idx_gt(self, gt, batch):
        if 'latent_gt' in batch:
            return batch['latent_gt']
        x, _ = self.hq_vqgan.apply(
            {'params': self.vqgan_params}, gt,
            method=lambda m, g: m.encoder(g))
        from codeformer_tpu.ops.vq import nearest_code_indices
        emb = self.vqgan_params['quantize']['embedding']
        idx = nearest_code_indices(x.reshape(-1, emb.shape[1]), emb)
        return idx.reshape(gt.shape[0], -1)

    def _code_losses(self, params_g, logits, lq_feat, idx_gt):
        total = 0.0
        metrics = {}
        b, hw = lq_feat.shape[0], lq_feat.shape[1]
        if self.hq_feat_loss:
            from codeformer_tpu.ops.vq import codebook_lookup
            emb = params_g['quantize']['embedding']
            quant_gt = codebook_lookup(idx_gt.reshape(-1), emb,
                                       jnp.float32).reshape(b, hw, hw, -1)
            l_feat = jnp.mean((jax.lax.stop_gradient(quant_gt)
                               - lq_feat.astype(jnp.float32)) ** 2) \
                * self.feat_loss_weight
            total = total + l_feat
            metrics['l_feat_encoder'] = l_feat
        if self.use_ce:
            l_ce = cross_entropy_loss(logits, idx_gt,
                                      loss_weight=self.ce_weight)
            total = total + l_ce
            metrics['cross_entropy_loss'] = l_ce
        return total, metrics

    def _make_full_step(self):
        def losses(params_g, params_d, d_stats, batch, idx_gt, w):
            out, logits, lq_feat = self.net_g.apply(
                {'params': params_g}, batch['in'], w, detach_16=True)
            code_total, metrics = self._code_losses(params_g, logits,
                                                    lq_feat, idx_gt)
            l_pix = l1_loss(out, batch['gt'])
            l_percep = (self.cri_perceptual(out, batch['gt'])
                        if self.cri_perceptual else 0.0)
            recon = l_pix + l_percep
            fake_pred = self.net_d.apply(
                {'params': params_d, 'batch_stats': d_stats}, out,
                train=False)
            l_gan = gan_loss(fake_pred, True, 'hinge', is_disc=False)
            metrics.update(l_g_pix=l_pix, out=out)
            if self.cri_perceptual:
                metrics['l_g_percep'] = l_percep
            return (code_total + recon, l_gan), metrics

        accum = self.accum_steps

        def step(state: TrainState, batch, idx_gt, w, current_iter):
            def micro(d_stats_chain, mb, mb_idx):
                """One microbatch: generator cotangent pulls + d grads;
                chains the d batchnorm stats. mb_idx None -> compute
                idx_gt from the frozen VQGAN per microbatch."""
                if mb_idx is None:
                    mb_idx = self._idx_gt(mb['gt'], mb)
                (vals, vjp_fn, aux) = jax.vjp(
                    functools.partial(losses, params_d=state.params_d,
                                      d_stats=state.d_stats, batch=mb,
                                      idx_gt=mb_idx, w=w),
                    state.params_g, has_aux=True)
                main, l_gan = vals
                g_main = vjp_fn((1.0, 0.0))[0]
                g_gan = vjp_fn((0.0, 1.0))[0]
                out = jax.lax.stop_gradient(aux.pop('out'))

                def d_loss(params_d, d_stats):
                    real_pred, mut = self.net_d.apply(
                        {'params': params_d, 'batch_stats': d_stats},
                        mb['gt'], train=True, mutable=['batch_stats'])
                    fake_pred, mut = self.net_d.apply(
                        {'params': params_d,
                         'batch_stats': mut['batch_stats']}, out,
                        train=True, mutable=['batch_stats'])
                    l_real = gan_loss(real_pred, True, 'hinge',
                                      is_disc=True)
                    l_fake = gan_loss(fake_pred, False, 'hinge',
                                      is_disc=True)
                    return l_real + l_fake, (
                        mut['batch_stats'],
                        {'l_d_real': l_real, 'l_d_fake': l_fake})

                (_, (new_stats, d_aux)), d_grads = jax.value_and_grad(
                    d_loss, has_aux=True)(state.params_d, d_stats_chain)
                scalars = {'_main': main, '_l_gan': l_gan, **aux,
                           **d_aux}
                return new_stats, (g_main, g_gan, d_grads, scalars)

            if accum == 1:
                d_stats, (g_main, g_gan, d_grads, m) = micro(
                    state.d_stats, batch, idx_gt)
            else:
                d_stats, (g_main, g_gan, d_grads, m) = \
                    _accum_microbatches(
                        lambda c, mb, i: micro(c, mb, None),
                        batch, accum, carry=state.d_stats)
            main = m.pop('_main')
            l_gan = m.pop('_l_gan')
            metrics = m
            leaf_m = _get_leaf(g_main, self._anchor)
            leaf_g = _get_leaf(g_gan, self._anchor)
            d_weight = _l2norm(leaf_m) / (_l2norm(leaf_g) + 1e-4)
            d_weight = jnp.clip(d_weight, 0.0, 1.0) \
                * self.scale_adaptive_gan_weight
            gan_on = (current_iter > self.net_d_start_iter).astype(
                jnp.float32)
            grads = jax.tree.map(lambda a, b: a + d_weight * gan_on * b,
                                 g_main, g_gan)
            updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                                  state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            params_g_ema = ema_update(state.params_g_ema, params_g,
                                      self.ema_decay)

            d_grads = jax.tree.map(lambda g: g * gan_on, d_grads)
            d_stats = jax.tree.map(
                lambda new, old: gan_on * new + (1 - gan_on) * old,
                d_stats, state.d_stats)
            d_updates, opt_d = self.opt_d_tx.update(d_grads, state.opt_d,
                                                    state.params_d)
            params_d = optax.apply_updates(state.params_d, d_updates)

            metrics.update(d_weight=d_weight,
                           l_g_gan=d_weight * gan_on * l_gan,
                           l_g_total=main + d_weight * gan_on * l_gan)
            return TrainState(state.step + 1, params_g, params_g_ema,
                              opt_g, params_d, d_stats, opt_d), metrics
        return step

    def _make_code_step(self):
        """Large-degradation step: code losses only, no image-level loss,
        no d update (codeformer_joint_model.py:167-171,196,232)."""
        def loss_fn(params_g, batch, idx_gt):
            logits, lq_feat = self.net_g.apply(
                {'params': params_g}, batch['in_large_de'], 0.0,
                code_only=True)
            return self._code_losses(params_g, logits, lq_feat, idx_gt)

        accum = self.accum_steps

        def grads_of(params_g, batch, idx_gt):
            (total, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_g, batch, idx_gt)
            metrics['l_g_total'] = total
            return grads, metrics

        def step(state: TrainState, batch, idx_gt):
            if accum == 1:
                grads, metrics = grads_of(state.params_g, batch, idx_gt)
            else:
                def micro(c, mb, i):
                    mb_idx = self._idx_gt(mb['gt'], mb)
                    return c, grads_of(state.params_g, mb, mb_idx)
                _, (grads, metrics) = _accum_microbatches(
                    micro, batch, accum)
            updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                                  state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            params_g_ema = ema_update(state.params_g_ema, params_g,
                                      self.ema_decay)
            return state._replace(
                step=state.step + 1, params_g=params_g,
                params_g_ema=params_g_ema, opt_g=opt_g), metrics
        return step

    @staticmethod
    def _phase(current_iter: int):
        """(w, small_per_n) schedule (codeformer_joint_model.py:153-164)."""
        if current_iter <= 40000:
            return 1.0, 1
        if current_iter <= 80000:
            return 1.3, 1
        if current_iter <= 120000:
            return 0.0, 120000
        return 1.3, 15

    def optimize_parameters(self, current_iter: int):
        w, small_per_n = self._phase(current_iter)
        # accum > 1: idx_gt is computed per microbatch inside the step
        # (so the frozen-VQGAN encode shares the microbatch footprint)
        idx_gt = (None if self.accum_steps > 1
                  else self._idx_gt(self.batch['gt'], self.batch))
        if current_iter % small_per_n == 0:
            self.state, metrics = self._step_full(
                self.state, self.batch, idx_gt, jnp.float32(w),
                jnp.int32(current_iter))
        else:
            self.state, metrics = self._step_code(self.state, self.batch,
                                                  idx_gt)
        self.log_dict = {k: float(v) for k, v in metrics.items()}


@MODEL_REGISTRY.register()
class CodeFormerModel(CodeFormerJointModel):
    """Stage III (single-degradation variant, used by the inpainting
    config): same losses as the joint model but a fixed fidelity_weight
    and a single input branch (codeformer_model.py)."""

    def _build(self):
        super()._build()
        self.fidelity_weight = float(self.train_opt.get('fidelity_weight',
                                                        1.0))

    def optimize_parameters(self, current_iter: int):
        idx_gt = (None if self.accum_steps > 1
                  else self._idx_gt(self.batch['gt'], self.batch))
        self.state, metrics = self._step_full(
            self.state, self.batch, idx_gt,
            jnp.float32(self.fidelity_weight), jnp.int32(current_iter))
        self.log_dict = {k: float(v) for k, v in metrics.items()}
