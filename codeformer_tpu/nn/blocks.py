"""Core convolutional building blocks — NHWC, flax.linen, TPU-first.

Behavioral spec comes from the reference VQGAN blocks
(basicsr/archs/vqgan_arch.py:14-226 and basicsr/archs/codeformer_arch.py:12-157);
the implementation is an idiomatic JAX re-design: NHWC layouts so convs map
straight onto the MXU, fp32 accumulation for attention/matmuls under a bf16
compute policy, and no Python-side dynamic control flow inside jit.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# GroupNorm(32, eps=1e-6) is the normalization used throughout the VQGAN
# (reference: vqgan_arch.py:14-15).
GroupNorm32 = functools.partial(nn.GroupNorm, num_groups=32, epsilon=1e-6)


def calc_mean_std(feat: jax.Array, eps: float = 1e-5):
    """Per-sample, per-channel spatial mean/std of an NHWC tensor.

    Matches the reference semantics (codeformer_arch.py:12-26), including the
    *unbiased* variance estimate (torch ``Tensor.var`` default).
    Returns arrays of shape (B, 1, 1, C).
    """
    assert feat.ndim == 4, 'expected NHWC tensor'
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    var = jnp.var(feat, axis=(1, 2), keepdims=True, ddof=1)
    std = jnp.sqrt(var + eps)
    return mean, std


def adaptive_instance_normalization(content_feat: jax.Array,
                                    style_feat: jax.Array) -> jax.Array:
    """AdaIN: re-color `content_feat` with the channel stats of `style_feat`.

    Reference: codeformer_arch.py:29-43 (used with quant_feat as content and
    the degraded lq_feat as style so the restored features keep the input's
    color/illumination).
    """
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


class ResBlock(nn.Module):
    """GroupNorm→swish→3x3conv ×2 with (possibly projected) skip.

    Reference: vqgan_arch.py:141-164. `in_channels` must be given statically
    because the 1x1 skip projection exists only when in != out, and flax
    setup-based modules fix their parameter structure ahead of tracing.
    """
    in_channels: int
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    def setup(self):
        out_ch = self.out_channels or self.in_channels
        self.norm1 = GroupNorm32(dtype=self.dtype)
        self.conv1 = nn.Conv(out_ch, (3, 3), dtype=self.dtype)
        self.norm2 = GroupNorm32(dtype=self.dtype)
        self.conv2 = nn.Conv(out_ch, (3, 3), dtype=self.dtype)
        if self.in_channels != out_ch:
            self.conv_out = nn.Conv(out_ch, (1, 1), dtype=self.dtype)

    def __call__(self, x_in: jax.Array) -> jax.Array:
        x = self.norm1(x_in)
        x = nn.silu(x)
        x = self.conv1(x)
        x = self.norm2(x)
        x = nn.silu(x)
        x = self.conv2(x)
        out_ch = self.out_channels or self.in_channels
        if self.in_channels != out_ch:
            x_in = self.conv_out(x_in)
        return x + x_in


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over an NHWC feature map.

    Reference: vqgan_arch.py:167-226 (1x1-conv q/k/v, softmax over keys,
    residual). QK^T and AV contract with fp32 accumulation so the bf16
    compute policy stays numerically safe on the MXU.
    """
    in_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.in_channels
        self.norm = GroupNorm32(dtype=self.dtype)
        self.q = nn.Conv(c, (1, 1), dtype=self.dtype)
        self.k = nn.Conv(c, (1, 1), dtype=self.dtype)
        self.v = nn.Conv(c, (1, 1), dtype=self.dtype)
        self.proj_out = nn.Conv(c, (1, 1), dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        h_ = self.norm(x)
        q = self.q(h_).reshape(b, h * w, c)
        k = self.k(h_).reshape(b, h * w, c)
        v = self.v(h_).reshape(b, h * w, c)

        attn = jnp.einsum('bqc,bkc->bqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, h, w, c)
        return x + self.proj_out(out)


class Downsample(nn.Module):
    """Stride-2 3x3 conv with the reference's asymmetric (0,1,0,1) padding
    (pad right/bottom only — vqgan_arch.py:117-126)."""
    in_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = nn.Conv(self.in_channels, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv(x)


class Upsample(nn.Module):
    """Nearest x2 upsample followed by a 3x3 conv (vqgan_arch.py:129-138)."""
    in_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = nn.Conv(self.in_channels, (3, 3), dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        # Exact nearest-neighbor 2x: repeat rows/cols. Static-shape friendly,
        # fuses into the following conv under XLA.
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


class FuseSftBlock(nn.Module):
    """Controllable feature transformation (CFT / SFT fusion).

    out = dec + w * (dec * scale(enc') + shift(enc')) where
    enc' = ResBlock(concat(enc, dec)). Reference: codeformer_arch.py:136-157.
    The fidelity weight `w` may be a traced scalar — no recompilation per w.
    """
    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.encode_enc = ResBlock(2 * self.in_channels, self.out_channels,
                                   dtype=self.dtype)
        self.scale_0 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)
        self.scale_2 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)
        self.shift_0 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)
        self.shift_2 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)

    def __call__(self, enc_feat: jax.Array, dec_feat: jax.Array,
                 w: jax.Array | float = 1.0) -> jax.Array:
        enc_feat = self.encode_enc(
            jnp.concatenate([enc_feat, dec_feat], axis=-1))
        scale = self.scale_2(nn.leaky_relu(self.scale_0(enc_feat), 0.2))
        shift = self.shift_2(nn.leaky_relu(self.shift_0(enc_feat), 0.2))
        residual = jnp.asarray(w, dec_feat.dtype) * (dec_feat * scale + shift)
        return dec_feat + residual
