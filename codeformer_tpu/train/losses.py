"""Loss functions — functional JAX equivalents of the reference loss zoo
(basicsr/losses/losses.py). All reduce to scalars in fp32.

Registered in LOSS_REGISTRY so YAML configs can select them by `type:`,
matching the reference's build_loss factory (basicsr/losses/__init__.py:15-26).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from codeformer_tpu.utils.registry import LOSS_REGISTRY

_REDUCTIONS = {'none': lambda x: x,
               'mean': jnp.mean,
               'sum': jnp.sum}


def _reduce(x: jax.Array, weight: Optional[jax.Array], reduction: str):
    if weight is not None:
        x = x * weight
    return _REDUCTIONS[reduction](x)


@LOSS_REGISTRY.register()
def l1_loss(pred, target, weight=None, reduction='mean', loss_weight=1.0):
    """Reference: losses.py:30-56 (L1Loss)."""
    return loss_weight * _reduce(jnp.abs(pred.astype(jnp.float32)
                                         - target.astype(jnp.float32)),
                                 weight, reduction)


@LOSS_REGISTRY.register()
def mse_loss(pred, target, weight=None, reduction='mean', loss_weight=1.0):
    """Reference: losses.py:59-85 (MSELoss)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return loss_weight * _reduce(d * d, weight, reduction)


@LOSS_REGISTRY.register()
def charbonnier_loss(pred, target, weight=None, reduction='mean',
                     loss_weight=1.0, eps=1e-12):
    """Reference: losses.py:88-121 (CharbonnierLoss, sqrt(d^2 + eps))."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return loss_weight * _reduce(jnp.sqrt(d * d + eps), weight, reduction)


@LOSS_REGISTRY.register()
def weighted_tv_loss(pred, weight=None, loss_weight=1.0):
    """Total-variation loss (losses.py:124-141)."""
    wy = None if weight is None else weight[:, :-1, :, :]
    wx = None if weight is None else weight[:, :, :-1, :]
    y = l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], wy)
    x = l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], wx)
    return loss_weight * (x + y)


def cross_entropy_loss(logits, labels, loss_weight=1.0):
    """Token cross-entropy for the code-index head (stage II/III,
    codeformer_idx_model.py:108-110). logits (..., K), labels (...,) int."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return loss_weight * jnp.mean(nll)


# ----------------------------- GAN losses ---------------------------------

def gan_loss(pred, target_is_real: bool, gan_type: str = 'hinge',
             is_disc: bool = False, real_label_val: float = 1.0,
             fake_label_val: float = 0.0, loss_weight: float = 1.0):
    """GAN loss family (losses.py:285-387): vanilla | lsgan | wgan |
    wgan_softplus | hinge. `loss_weight` applies only to generator steps,
    matching the reference (losses.py:381-387)."""
    pred = pred.astype(jnp.float32)
    if gan_type == 'hinge':
        if is_disc:
            pred = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1.0 + pred))
        else:
            loss = -jnp.mean(pred)
    elif gan_type == 'vanilla':
        target = jnp.full_like(
            pred, real_label_val if target_is_real else fake_label_val)
        loss = jnp.mean(
            jnp.maximum(pred, 0) - pred * target
            + jnp.log1p(jnp.exp(-jnp.abs(pred))))  # BCE-with-logits
    elif gan_type == 'lsgan':
        target = jnp.full_like(
            pred, real_label_val if target_is_real else fake_label_val)
        loss = jnp.mean((pred - target) ** 2)
    elif gan_type == 'wgan':
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == 'wgan_softplus':
        loss = (jnp.mean(jax.nn.softplus(-pred)) if target_is_real
                else jnp.mean(jax.nn.softplus(pred)))
    else:
        raise NotImplementedError(f'GAN type {gan_type} not implemented')
    return loss if is_disc else loss * loss_weight


def r1_penalty(real_grad: jax.Array) -> jax.Array:
    """R1 gradient penalty given d(D)/d(real) (losses.py:390-404)."""
    g = real_grad.astype(jnp.float32)
    return jnp.mean(jnp.sum(g * g, axis=(1, 2, 3)))


def g_path_regularize(fake_img_fn, latents, mean_path_length,
                      rng, decay: float = 0.01):
    """StyleGAN2 path-length regularizer (losses.py:407-416): penalizes
    variance of ||J^T n|| where n is image-shaped noise. `fake_img_fn` maps
    latents -> images so the JVP/VJP is taken here."""
    fake_img, vjp_fn = jax.vjp(fake_img_fn, latents)
    h, w = fake_img.shape[1:3]
    noise = jax.random.normal(rng, fake_img.shape) / jnp.sqrt(h * w)
    (grad,) = vjp_fn(noise)
    path_lengths = jnp.sqrt(jnp.mean(
        jnp.sum(grad.astype(jnp.float32) ** 2, axis=-1), axis=1))
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean(
        (path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
    return path_penalty, jax.lax.stop_gradient(path_mean), path_lengths


def gradient_penalty_loss(disc_fn, real_data, fake_data, rng,
                          weight=None):
    """WGAN-GP interpolated gradient penalty (losses.py:419-455).
    disc_fn: images -> critic scores."""
    alpha = jax.random.uniform(rng, (real_data.shape[0], 1, 1, 1))
    interpolates = alpha * real_data + (1.0 - alpha) * fake_data

    def critic_sum(x):
        return jnp.sum(disc_fn(x))

    grad = jax.grad(critic_sum)(interpolates).astype(jnp.float32)
    if weight is not None:
        grad = grad * weight
    penalty = jnp.mean(
        (jnp.sqrt(jnp.sum(grad ** 2, axis=(1, 2, 3)) + 1e-12) - 1.0) ** 2)
    if weight is not None:
        penalty = penalty / jnp.mean(weight)
    return penalty
