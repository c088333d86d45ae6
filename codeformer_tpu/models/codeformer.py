"""CodeFormer — codebook-lookup Transformer with controllable feature
transformation, TPU-native.

Behavioral spec: reference basicsr/archs/codeformer_arch.py:160-280.
Differences by design (not behavior):
  * NHWC end to end; the 256-token path is batch-major (B, S, C).
  * `w` (fidelity weight) is a traced scalar — one compiled graph serves any
    w in (0, 1]; the `w > 0` structural gate of the reference is the static
    `enable_fuse` flag (the reference's gate is python-side too).
  * Code selection is argmax over logits — identical selection to the
    reference's softmax→top-1 (softmax is monotonic), one less kernel.
  * Encoder taps / generator fuse points are computed at construction and
    verified against the reference's hardcoded tables in tests
    (codeformer_arch.py:204-206).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from codeformer_tpu.nn.blocks import (FuseSftBlock,
                                      adaptive_instance_normalization)
from codeformer_tpu.nn.transformer import TransformerSALayer
from codeformer_tpu.utils.registry import ARCH_REGISTRY
from .vqgan import VQAutoEncoder


@ARCH_REGISTRY.register()
class CodeFormer(VQAutoEncoder):
    """VQAutoEncoder + 9-layer transformer index predictor + SFT fusion.

    Inherited backbone defaults match the reference's fixed super() call
    (codeformer_arch.py:166): img_size 512, nf 64, ch_mult (1,2,2,4,4,8),
    nearest quantizer, 2 res blocks, attention at 16.
    """
    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    latent_size: int = 256
    connect_list: Sequence[str] = ('32', '64', '128', '256')

    def setup(self):
        self._build_backbone()

        self.position_emb = self.param(
            'position_emb', nn.initializers.zeros,
            (self.latent_size, self.dim_embd), jnp.float32)
        self.feat_emb = nn.Dense(self.dim_embd, dtype=self.dtype)

        self.ft_layers = [
            TransformerSALayer(embed_dim=self.dim_embd, nhead=self.n_head,
                               dim_mlp=self.dim_embd * 2, dtype=self.dtype)
            for _ in range(self.n_layers)
        ]

        # logits head (reference idx_pred_layer: LayerNorm + biasless Linear)
        self.idx_pred_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.idx_pred_proj = nn.Dense(self.codebook_size, use_bias=False,
                                      dtype=self.dtype)

        # channel widths at each connectable feature size
        nf, ch_mult = self.nf, tuple(self.ch_mult)
        n_stage = len(ch_mult)
        self.channels = {
            str(self.img_size // 2 ** s): nf * ch_mult[min(s, n_stage - 1)]
            for s in range(n_stage)
        }
        self.fuse_convs_dict = {
            f_size: FuseSftBlock(self.channels[f_size],
                                 self.channels[f_size], dtype=self.dtype)
            for f_size in self.connect_list
        }

    def __call__(self, x: jax.Array, w: jax.Array | float = 0.0,
                 detach_16: bool = True, code_only: bool = False,
                 adain: bool = False,
                 enable_fuse: bool = True) -> Tuple[jax.Array, ...]:
        """x: (B, H, W, 3) normalized to [-1, 1].

        Returns (out, logits, lq_feat); or (logits, lq_feat) if code_only.
        `enable_fuse` is the static analog of the reference's `w > 0` gate —
        pass False to skip SFT fusion entirely (e.g. colorization, w=0).
        """
        trunk = self._trunk(x, detach_16=detach_16, adain=adain,
                            code_only=code_only)
        if code_only:  # training stage II
            return trunk[1], trunk[2]
        quant_feat, logits, lq_feat, enc_feat_dict = trunk
        fuse_fns = self._fuse_fns(enc_feat_dict, w) if enable_fuse else {}
        out = self.generator(quant_feat, fuse_fns=fuse_fns)
        return out, logits, lq_feat

    def _trunk(self, x, detach_16: bool, adain: bool,
               code_only: bool = False):
        """Encoder + transformer + quantization — everything before the
        generator (shared by __call__ and the staged-split methods)."""
        # ---------------- Encoder with feature taps ----------------
        tap_by_size = self.encoder.tap_by_size
        tap_indices = [tap_by_size[s] for s in self.connect_list]
        x, enc_feat_dict = self.encoder(x, tap_indices)
        lq_feat = x  # (B, h, w, emb_dim)

        # ---------------- Transformer over latent tokens ----------------
        b, h, wdt, c = lq_feat.shape
        tokens = self.feat_emb(lq_feat.reshape(b, h * wdt, c))
        pos = self.position_emb[None].astype(tokens.dtype)
        query = tokens
        for layer in self.ft_layers:
            query = layer(query, query_pos=pos)

        logits = self.idx_pred_proj(self.idx_pred_norm(query))  # (B, S, K)

        if code_only:  # training stage II: generator untouched
            return None, logits, lq_feat, None

        # ---------------- Quantization (argmax code selection) -----------
        top_idx = jnp.argmax(logits, axis=-1)  # == softmax→top-1
        quant_feat = self.quantize.get_codebook_feat(
            top_idx, shape=(b, h, wdt, self.emb_dim)).astype(lq_feat.dtype)

        if detach_16:
            quant_feat = jax.lax.stop_gradient(quant_feat)
        if adain:
            quant_feat = adaptive_instance_normalization(quant_feat, lq_feat)
        return quant_feat, logits, lq_feat, enc_feat_dict

    def _fuse_fns(self, enc_feat_dict, w, skip=None):
        """Generator-tap -> SFT fusion closures (skip: connect size to
        leave out — the staged split's anchor fuse)."""
        gen_taps = self.generator.tap_by_size
        fuse_fns = {}
        for f_size in self.connect_list:
            if f_size == skip:
                continue
            fuse = self.fuse_convs_dict[f_size]
            enc = jax.lax.stop_gradient(enc_feat_dict[f_size])
            fuse_fns[gen_taps[f_size]] = (
                lambda dec, fuse=fuse, enc=enc: fuse(enc, dec, w))
        return fuse_fns

    # ------------------------------------------------------------------
    # Staged-apply split (training): the adaptive-d-weight anchor's grad
    # probes and the combined backward share the expensive decoder-tail
    # transpose by evaluating the model in three segments around the
    # anchor op (train/trainers.py micro_single_staged; exactness by the
    # chain rule — tested against the single-backward step).
    #   anchor_size = largest connect size (fix_generator: the anchor is
    #   that FuseSftBlock, codeformer_joint_model.py:107-113) or None
    #   (trainable generator: the anchor is the final conv).
    # ------------------------------------------------------------------
    def split_point(self, anchor_size=None) -> int:
        """Static generator block index the split tail starts at."""
        if anchor_size is None:
            return len(self.generator.blocks) - 1
        return self.generator.tap_by_size[anchor_size] + 1

    def forward_body(self, x, w=0.0, detach_16: bool = True,
                     anchor_size=None):
        """Everything up to the anchor op's input. Returns
        (z_pre, logits, lq_feat, enc_anchor)."""
        quant_feat, logits, lq_feat, enc_feat_dict = self._trunk(
            x, detach_16=detach_16, adain=False)
        stop = self.split_point(anchor_size)
        if anchor_size is None:
            fuse_fns = self._fuse_fns(enc_feat_dict, w)
            enc_a = jnp.zeros((), lq_feat.dtype)
            z_pre = self.generator(quant_feat, fuse_fns=fuse_fns,
                                   stop_before=stop)
        else:
            # body stops AFTER the tap block but BEFORE its fuse — the
            # fuse IS the anchor op
            fuse_fns = self._fuse_fns(enc_feat_dict, w, skip=anchor_size)
            enc_a = jax.lax.stop_gradient(enc_feat_dict[anchor_size])
            z_pre = self.generator(quant_feat, fuse_fns=fuse_fns,
                                   stop_before=stop)
        return z_pre, logits, lq_feat, enc_a

    def apply_split_anchor(self, z_pre, enc_a, w, anchor_size=None):
        """The anchor op alone: the anchor-size FuseSftBlock, or the
        generator's final conv."""
        if anchor_size is None:
            return self.generator(z_pre,
                                  start=len(self.generator.blocks) - 1)
        return self.fuse_convs_dict[anchor_size](enc_a, z_pre, w)

    def decode_split_tail(self, a, anchor_size=None):
        """Generator blocks after the anchor (parameter-frozen in every
        configuration that selects a fuse anchor; identity for the
        final-conv anchor)."""
        if anchor_size is None:
            return a
        return self.generator(a, start=self.split_point(anchor_size))


def position_embedding_sine(shape_bhw: Tuple[int, int, int],
                            num_pos_feats: int = 64,
                            temperature: float = 10000.0,
                            normalize: bool = False,
                            scale: float | None = None,
                            mask: jax.Array | None = None) -> jax.Array:
    """Sine/cosine 2-D position embedding, NHWC.

    Behavioral spec: reference codeformer_arch.py:46-86
    (PositionEmbeddingSine). The reference defines it but never calls it
    (CodeFormer uses a learned `position_emb`); it is provided for
    completeness/parity as a pure function — stateless code has no
    business being an nn.Module on TPU. Returns (B, H, W, 2*num_pos_feats)
    with the channel order [pos_y || pos_x] matching the reference's
    channel-first concat.
    """
    if scale is not None and not normalize:
        raise ValueError('normalize should be True if scale is passed')
    if scale is None:
        scale = 2 * jnp.pi
    b, h, w = shape_bhw
    if mask is None:
        not_mask = jnp.ones((b, h, w), jnp.float32)
    else:
        not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def interleave_sin_cos(e):
        p = e[..., None] / dim_t
        return jnp.stack((jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])),
                         axis=-1).reshape(b, h, w, num_pos_feats)

    return jnp.concatenate([interleave_sin_cos(y_embed),
                            interleave_sin_cos(x_embed)], axis=-1)
