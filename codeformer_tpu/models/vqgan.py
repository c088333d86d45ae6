"""VQGAN autoencoder — TPU-native (NHWC, flax.linen, fp32-accum VQ).

Behavioral spec from the reference (basicsr/archs/vqgan_arch.py): conv
encoder 512->16 with ch_mult (1,2,2,4,4,8), nearest-neighbor 1024x256
codebook with straight-through estimator, mirror conv generator, PatchGAN
discriminator. The block *ordering* (and hence checkpoint key numbering) is
kept identical to the reference so released checkpoints convert 1:1, but the
implementation is a fresh JAX design: NHWC, static tap indices computed at
construction, one-hot MXU codebook lookup, Pallas argmin-L2 search on TPU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.nn.blocks import (AttnBlock, Downsample, FastConv3x3,
                                      GroupNorm32, ResBlock, Upsample,
                                      run_resblocks, run_edge_block,
                                      run_decoder_tail)
from codeformer_tpu.ops.vq import codebook_lookup, nearest_code_indices
from codeformer_tpu.utils.registry import ARCH_REGISTRY


class VectorQuantizer(nn.Module):
    """Nearest-neighbor codebook with commitment loss and straight-through.

    Reference: vqgan_arch.py:24-84. Distances and losses are computed in
    fp32 so bf16 compute policies do not perturb code selection.
    """
    codebook_size: int
    emb_dim: int
    beta: float = 0.25
    dtype: Any = jnp.float32

    def setup(self):
        scale = 1.0 / self.codebook_size
        self.embedding = self.param(
            'embedding',
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -scale, scale),
            (self.codebook_size, self.emb_dim))

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, Dict]:
        """z: NHWC (B, H, W, D) continuous latents."""
        z32 = z.astype(jnp.float32)
        z_flat = z32.reshape(-1, self.emb_dim)
        codebook = self.embedding

        indices = nearest_code_indices(z_flat, codebook)
        z_q = codebook_lookup(indices, codebook, jnp.float32).reshape(z32.shape)

        # Codebook + commitment loss (beta * ||z - sg[e]||^2).
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
                + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))

        # Straight-through estimator.
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)

        # Usage statistics (perplexity), matching vqgan_arch.py:59-61.
        one_hot = jax.nn.one_hot(indices, self.codebook_size,
                                 dtype=jnp.float32)
        e_mean = jnp.mean(one_hot, axis=0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

        # mean over the full (T, K) distance matrix (vqgan_arch.py:42).
        e32 = codebook.astype(jnp.float32)
        mean_distance = (jnp.mean(jnp.sum(z_flat ** 2, axis=1))
                         + jnp.mean(jnp.sum(e32 ** 2, axis=1))
                         - 2.0 * jnp.mean(z_flat @ e32.T))

        stats = {
            'perplexity': perplexity,
            'min_encoding_indices': indices,
            'mean_distance': mean_distance,
        }
        return z_q.astype(z.dtype), loss, stats

    def get_codebook_feat(self, indices: jax.Array,
                          shape: Optional[Sequence[int]] = None) -> jax.Array:
        """indices (B*T,) or (B, T) -> NHWC latents when `shape` is given.

        Reference: vqgan_arch.py:72-84 (shape there is NHWC too, then
        permuted; here we simply stay NHWC).
        """
        z_q = codebook_lookup(indices.reshape(-1), self.embedding,
                              self.dtype)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax alternative quantizer (vqgan_arch.py:87-114)."""
    codebook_size: int
    emb_dim: int
    num_hiddens: int
    straight_through: bool = False
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.proj = nn.Conv(self.codebook_size, (1, 1), dtype=self.dtype)
        self.embed = self.param('embed', nn.initializers.normal(1.0),
                                (self.codebook_size, self.emb_dim),
                                jnp.float32)

    def __call__(self, z: jax.Array, temperature: Optional[float] = None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array, Dict]:
        hard = self.straight_through if train else True
        tau = self.temp_init if temperature is None else temperature
        logits = self.proj(z).astype(jnp.float32)  # (B, H, W, K)

        if train:
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng('gumbel'), logits.shape,
                                   jnp.float32, 1e-20, 1.0) + 1e-20))
            y_soft = jax.nn.softmax((logits + gumbel) / tau, axis=-1)
        else:
            y_soft = jax.nn.softmax(logits / tau, axis=-1)

        indices = jnp.argmax(y_soft, axis=-1)
        if hard:
            y_hard = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
            soft_one_hot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            soft_one_hot = y_soft

        z_q = jnp.einsum('bhwk,kd->bhwd', soft_one_hot,
                         self.embed.astype(jnp.float32))

        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.mean(jnp.sum(
            qy * jnp.log(qy * self.codebook_size + 1e-10), axis=-1))

        return z_q.astype(z.dtype), diff, {'min_encoding_indices': indices}


def _build_encoder_blocks(nf, emb_dim, ch_mult, num_res_blocks, resolution,
                          attn_resolutions, dtype, remat=False):
    """Build encoder block list + {feature-size: last-ResBlock-index} taps.

    Ordering matches vqgan_arch.py:241-266 exactly (checkpoint parity).
    """
    # conv_in stays a plain conv: C_in=3 starves the MXU (2.3 TFLOP/s,
    # 6ms of the 40ms encoder at B=16) but the phase-packed alternative
    # measured SLOWER end-to-end (docs/roofline.md)
    blocks = [FastConv3x3(nf, dtype=dtype)]
    taps: Dict[str, int] = {}
    curr_res = resolution
    in_ch_mult = (1,) + tuple(ch_mult)
    block_in = nf
    for i in range(len(ch_mult)):
        block_in = nf * in_ch_mult[i]
        block_out = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            blocks.append(ResBlock(block_in, block_out, dtype=dtype,
                                   remat=remat))
            block_in = block_out
            taps[str(curr_res)] = len(blocks) - 1
            if curr_res in attn_resolutions:
                blocks.append(AttnBlock(block_in, dtype=dtype))
        if i != len(ch_mult) - 1:
            blocks.append(Downsample(block_in, dtype=dtype))
            curr_res //= 2
    blocks.append(ResBlock(block_in, block_in, dtype=dtype, remat=remat))
    blocks.append(AttnBlock(block_in, dtype=dtype))
    blocks.append(ResBlock(block_in, block_in, dtype=dtype, remat=remat))
    blocks.append(GroupNorm32(dtype=dtype))
    blocks.append(nn.Conv(emb_dim, (3, 3), dtype=dtype))
    return blocks, taps


def _build_generator_blocks(nf, emb_dim, ch_mult, num_res_blocks, resolution,
                            attn_resolutions, out_channels, dtype,
                            remat=False):
    """Build generator block list + fuse-point taps.

    Ordering matches vqgan_arch.py:290-316. Tap rule reproducing the
    reference's hardcoded fuse indices (codeformer_arch.py:206): the *first*
    ResBlock of each resolution stage, except at attention resolutions where
    it is the *last* ResBlock (i.e. just before its AttnBlock).
    """
    num_resolutions = len(ch_mult)
    block_in = nf * ch_mult[-1]
    curr_res = resolution // 2 ** (num_resolutions - 1)

    blocks = [nn.Conv(block_in, (3, 3), dtype=dtype)]
    taps: Dict[str, int] = {}
    blocks.append(ResBlock(block_in, block_in, dtype=dtype, remat=remat))
    blocks.append(AttnBlock(block_in, dtype=dtype))
    blocks.append(ResBlock(block_in, block_in, dtype=dtype, remat=remat))

    for i in reversed(range(num_resolutions)):
        block_out = nf * ch_mult[i]
        first_in_stage = True
        for _ in range(num_res_blocks):
            blocks.append(ResBlock(block_in, block_out, dtype=dtype,
                                   remat=remat))
            block_in = block_out
            if first_in_stage or curr_res in attn_resolutions:
                taps[str(curr_res)] = len(blocks) - 1
                first_in_stage = False
            if curr_res in attn_resolutions:
                blocks.append(AttnBlock(block_in, dtype=dtype))
        if i != 0:
            blocks.append(Upsample(block_in, dtype=dtype))
            curr_res *= 2
    blocks.append(GroupNorm32(dtype=dtype))
    blocks.append(FastConv3x3(out_channels, dtype=dtype))
    return blocks, taps


class Encoder(nn.Module):
    """Conv encoder: image -> (B, h, w, emb_dim) latents (vqgan_arch.py:229-273)."""
    in_channels: int = 3
    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    resolution: int = 512
    attn_resolutions: Sequence[int] = (16,)
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize ResBlocks under grad (training)

    def setup(self):
        self.blocks, self.tap_by_size = _build_encoder_blocks(
            self.nf, self.emb_dim, self.ch_mult, self.num_res_blocks,
            self.resolution, tuple(self.attn_resolutions), self.dtype,
            remat=self.remat)

    def __call__(self, x: jax.Array,
                 tap_indices: Sequence[int] = ()) -> Tuple[jax.Array, Dict]:
        feats = {}
        tap_indices = set(tap_indices)
        i = 0
        while i < len(self.blocks):
            x, j = run_resblocks(self.blocks, i, x, stop_after=tap_indices)
            if j > i:                   # fused colpack run
                # the run may legally END on a tapped block (stop_after
                # only stops it from crossing one) — record its output
                if (j - 1) in tap_indices:
                    feats[str(x.shape[1])] = x
                i = j
                continue
            if i not in tap_indices:
                x, handled = run_edge_block(self.blocks[i], x)
                if handled:
                    i += 1
                    continue
            x = self.blocks[i](x)
            if i in tap_indices:
                feats[str(x.shape[1])] = x
            i += 1
        return x, feats


class Generator(nn.Module):
    """Conv decoder: latents -> image (vqgan_arch.py:276-323).

    Supports SFT fusion injection: `fuse_fns` maps block index -> callable
    applied to the activation right after that block (used by CodeFormer's
    controllable feature transformation).
    """
    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    resolution: int = 512
    attn_resolutions: Sequence[int] = (16,)
    out_channels: int = 3
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize ResBlocks under grad (training)

    def setup(self):
        self.blocks, self.tap_by_size = _build_generator_blocks(
            self.nf, self.emb_dim, self.ch_mult, self.num_res_blocks,
            self.resolution, tuple(self.attn_resolutions), self.out_channels,
            self.dtype, remat=self.remat)

    def __call__(self, x: jax.Array, fuse_fns: Optional[Dict] = None,
                 start: int = 0,
                 stop_before: Optional[int] = None) -> jax.Array:
        """start/stop_before: run only blocks[start:stop_before] — the
        trainers' staged-apply split evaluates the decoder in two
        segments around the adaptive-d-weight anchor (train/trainers.py
        micro_single_staged) so the anchor probes' tail backward is not
        re-walked by the combined pull. Defaults run the whole
        decoder."""
        fuse_fns = fuse_fns or {}
        # NOTE: no bare run_resblocks here — a packed run sandwiched
        # between XLA ops loses ~11 ms to boundary relayouts (measured,
        # 512² B=16); only the full packed tail enclave wins.
        i = start
        stop = len(self.blocks) if stop_before is None else stop_before
        while i < stop:
            if stop_before is None:  # enclave runs to the END: whole-
                x, handled = run_decoder_tail(self.blocks, i, x,
                                              fuse_fns=fuse_fns)
                if handled:          # decoder calls only
                    return x
            x = self.blocks[i](x)
            if i in fuse_fns:
                x = fuse_fns[i](x)
            i += 1
        return x


@ARCH_REGISTRY.register()
class VQAutoEncoder(nn.Module):
    """VQGAN: encode -> quantize -> decode (vqgan_arch.py:326-389)."""
    img_size: int = 512
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    quantizer: str = 'nearest'
    res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25
    gumbel_straight_through: bool = False
    gumbel_kl_weight: float = 1e-8
    dtype: Any = jnp.float32
    # remat=True: every ResBlock saves only its input for backward and
    # recomputes its interior in the backward pass (see nn/blocks.py).
    # Training-memory knob (trainers inject it from `train: remat: true`);
    # inference is unaffected.
    remat: bool = False

    def setup(self):
        self._build_backbone()

    def _build_backbone(self):
        self.encoder = Encoder(
            in_channels=3, nf=self.nf, emb_dim=self.emb_dim,
            ch_mult=tuple(self.ch_mult), num_res_blocks=self.res_blocks,
            resolution=self.img_size,
            attn_resolutions=tuple(self.attn_resolutions), dtype=self.dtype,
            remat=self.remat)
        if self.quantizer == 'nearest':
            self.quantize = VectorQuantizer(
                self.codebook_size, self.emb_dim, self.beta, dtype=self.dtype)
        elif self.quantizer == 'gumbel':
            self.quantize = GumbelQuantizer(
                self.codebook_size, self.emb_dim, self.emb_dim,
                self.gumbel_straight_through, self.gumbel_kl_weight,
                dtype=self.dtype)
        else:
            raise ValueError(f'unknown quantizer {self.quantizer!r}')
        self.generator = Generator(
            nf=self.nf, emb_dim=self.emb_dim, ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.res_blocks, resolution=self.img_size,
            attn_resolutions=tuple(self.attn_resolutions), dtype=self.dtype,
            remat=self.remat)

    def __call__(self, x: jax.Array, **quant_kwargs):
        x, _ = self.encoder(x)
        quant, codebook_loss, quant_stats = self.quantize(x, **quant_kwargs)
        x = self.generator(quant)
        return x, codebook_loss, quant_stats


@ARCH_REGISTRY.register()
class VQGANDiscriminator(nn.Module):
    """PatchGAN discriminator (vqgan_arch.py:394-434): 4x4 stride-2 convs +
    BatchNorm + LeakyReLU(0.2) -> 1-channel logit map.

    Submodule names mirror the torch nn.Sequential indices so checkpoint
    conversion is positional.
    """
    nc: int = 3
    ndf: int = 64
    n_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name='main_0')(x)
        x = nn.leaky_relu(x, 0.2)
        idx = 2
        ndf_mult = 1
        for n in range(1, self.n_layers):
            ndf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * ndf_mult, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f'main_{idx}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'main_{idx + 1}')(x)
            x = nn.leaky_relu(x, 0.2)
            idx += 3
        ndf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * ndf_mult, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name=f'main_{idx}')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name=f'main_{idx + 1}')(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f'main_{idx + 3}')(x)
        return x
