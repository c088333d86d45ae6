"""Core convolutional building blocks — NHWC, flax.linen, TPU-first.

Behavioral spec comes from the reference VQGAN blocks
(basicsr/archs/vqgan_arch.py:14-226 and basicsr/archs/codeformer_arch.py:12-157);
the implementation is an idiomatic JAX re-design: NHWC layouts so convs map
straight onto the MXU, fp32 accumulation for attention/matmuls under a bf16
compute policy, and no Python-side dynamic control flow inside jit.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# GroupNorm(32, eps=1e-6) is the normalization used throughout the VQGAN
# (reference: vqgan_arch.py:14-15).
GroupNorm32 = functools.partial(nn.GroupNorm, num_groups=32, epsilon=1e-6)


class FastConv3x3(nn.Module):
    """3x3 SAME stride-1 conv, drop-in for nn.Conv(features, (3, 3)) with
    identical parameter names/shapes ('kernel' (3,3,Cin,Cout) + 'bias').

    `enable_phase_packing` dispatches thin-channel high-res shapes to the
    phase-packed stride-2 form (ops/s2d_conv.py). Measured on v5e it is
    OFF by default: despite better standalone MXU shapes (K=16C, N=4C),
    the depth-to-space transpose breaks XLA's GroupNorm/silu fusion
    chains and the packed model ran ~25% slower end to end
    (128 -> 96 faces/s). Kept as an exactness-tested building block for
    future layouts; the win that survived in-model is the fused
    nearest-x2 upsample conv below.
    """
    features: int
    dtype: Any = jnp.float32
    min_pixels: int = 256 * 256
    enable_phase_packing: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from codeformer_tpu.nn import quant
        from codeformer_tpu.ops.s2d_conv import (conv3x3_phase_packed,
                                                 use_phase_packing)
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        _, h, w, _ = x.shape
        if quant.quant_active(self):
            y = quant.conv_int8(x, kernel)
        elif self.enable_phase_packing and use_phase_packing(
                h, w, self.features, self.min_pixels):
            y = conv3x3_phase_packed(x, kernel)
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ('NHWC', 'HWIO', 'NHWC'))
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), 'SAME', dimension_numbers=dn)
        return y + bias.astype(self.dtype)


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

    On TPU with a bf16 compute policy, runs of consecutive 512²
    ResBlocks dispatch to the stage-resident column-packed Pallas path —
    see `run_resblocks` below and ops/colpack_conv.py.
    """
    in_channels: int
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32
    # remat=True rematerializes the block under differentiation: only the
    # block INPUT is saved as a backward residual and the five
    # intra-block activations (2x norm, 2x silu, conv1 out — each as
    # large as the input) are recomputed during the backward pass.
    # ~6x less activation HBM for ~1/3 extra forward FLOPs on the
    # rematerialized stages; forward-only use is unaffected. Parameter
    # structure is identical either way (lifted transform keeps scopes).
    remat: bool = False

    def setup(self):
        out_ch = self.out_channels or self.in_channels
        self.norm1 = GroupNorm32(dtype=self.dtype)
        self.conv1 = FastConv3x3(out_ch, dtype=self.dtype)
        self.norm2 = GroupNorm32(dtype=self.dtype)
        self.conv2 = FastConv3x3(out_ch, dtype=self.dtype)
        if self.in_channels != out_ch:
            self.conv_out = nn.Conv(out_ch, (1, 1), dtype=self.dtype)

    def _forward(self, x_in: jax.Array) -> jax.Array:
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

    def __call__(self, x_in: jax.Array) -> jax.Array:
        if self.remat:
            # prevent_cse=False: every train step runs under jit, where
            # CSE across the remat boundary cannot occur
            return nn.remat(ResBlock._forward,
                            prevent_cse=False)(self, x_in)
        return self._forward(x_in)


# --------------------------------------------------------------------
# Stage-resident colpack dispatch for consecutive ResBlock runs.
#
# The 512² C=64 stages dominate the CodeFormer forward and run at ~50%
# MXU on XLA's conv lowering (docs/roofline.md). `run_resblocks` keeps
# the whole run in the padded column-packed layout of
# ops/colpack_conv.py: each GroupNorm+silu+conv(+skip) is ONE Pallas
# kernel with full 128-lane GEMMs, GroupNorm statistics ride along as
# per-tile partials from the previous kernel, and the zero-pad
# relayout happens once per run instead of once per conv.
# --------------------------------------------------------------------

def _env_colpack_mode() -> str:
    v = os.environ.get('CODEFORMER_COLPACK', 'off')
    if v not in ('auto', 'off', 'interpret'):
        import warnings
        warnings.warn(f'CODEFORMER_COLPACK={v!r} is not one of '
                      f"'auto'/'off'/'interpret'; ignoring (mode stays off)")
        return 'off'
    return v


_COLPACK_MODE = _env_colpack_mode()


def set_colpack_mode(mode: str) -> None:
    """'auto' (TPU+bf16+shape gated), 'off', or 'interpret' (force the
    fused math through the Pallas interpreter — tests). Call before the
    first jit trace of the model; traces cache the dispatch decision."""
    global _COLPACK_MODE
    assert mode in ('auto', 'off', 'interpret'), mode
    _COLPACK_MODE = mode


def colpack_mode() -> str:
    return _COLPACK_MODE


def _colpack_ok(blk: ResBlock, x: jax.Array) -> bool:
    from codeformer_tpu.ops.colpack_conv import TY
    mode = _COLPACK_MODE
    if mode == 'off' or blk.is_initializing():
        return False
    if not isinstance(blk, ResBlock):
        return False
    out_ch = blk.out_channels or blk.in_channels
    b, h, w, c = x.shape
    # h >= 2*TY: conv3x3_dots needs >= 2 row tiles (colpack_conv.py
    # asserts h // ty >= 2, and ty halves when ci2 > 256)
    shape_ok = (h % TY == 0 and h >= 2 * TY and w % 2 == 0
                and c == blk.in_channels
                and c % 64 == 0 and out_ch % 64 == 0)
    if mode == 'interpret':
        return shape_ok
    return (shape_ok and blk.dtype == jnp.bfloat16
            and jax.default_backend() == 'tpu'
            and h * w >= 512 * 512)         # only where lanes starve


def run_resblocks(blocks, i: int, x: jax.Array, stop_after=()):
    """Apply the maximal colpack-eligible run of consecutive ResBlocks
    starting at blocks[i]. Returns (y, next_i); next_i == i means no
    block was eligible and the caller should apply blocks[i] normally.
    `stop_after`: block indices whose OUTPUT the caller needs (encoder
    taps, generator fuse points) — the run never crosses one.

    Only pays off when the run's entry and exit stay in the packed
    domain (measured: a packed run sandwiched between XLA ops loses
    ~11 ms to boundary relayouts at 512² B=16 — the decoder needs the
    packed Upsample entry and GN+conv_out exit of run_decoder_tail).

    Numerics match the sequential ResBlocks to bf16 rounding (the conv
    math is exact; GroupNorm statistics are computed from sum/sumsq
    partials instead of a two-pass mean/var).
    """
    from codeformer_tpu.ops import colpack_conv as cc
    if not (isinstance(blocks[i], ResBlock) and _colpack_ok(blocks[i], x)):
        return x, i
    dtype = blocks[i].dtype
    h, w = x.shape[1], x.shape[2]
    xc = cc.to_colpack(x.astype(dtype))
    st = cc.colpack_stats(xc)
    xc, st, c_cur, j = _packed_run(blocks, i, xc, st, h, w, stop_after)
    return cc.from_colpack(xc, c_cur).astype(x.dtype), j


def _packed_run(blocks, i: int, xc, st, h: int, w: int, stop_after=()):
    """Run consecutive eligible ResBlocks in the packed domain.

    xc: col-packed (B, h, w/2, 2C); st: its stats partials (gn_affine
    format). Returns (xc, st, c_out, next_i) still in the packed domain
    — st carries the LAST conv's output partials so a packed consumer
    (GroupNorm epilogue) gets its statistics for free.
    """
    from codeformer_tpu.ops import colpack_conv as cc
    interp = _COLPACK_MODE == 'interpret'
    dtype = blocks[i].dtype
    j = i
    c_cur = blocks[i].in_channels
    while j < len(blocks) and isinstance(blocks[j], ResBlock) \
            and blocks[j].in_channels == c_cur \
            and (j == i or (j - 1) not in stop_after) \
            and _colpack_ok(blocks[j], jax.ShapeDtypeStruct(
                (1, h, w, c_cur), dtype)):
        blk = blocks[j]
        out_ch = blk.out_channels or blk.in_channels
        p1 = blk.norm1.variables['params']
        p2 = blk.norm2.variables['params']
        k1 = blk.conv1.variables['params']
        k2 = blk.conv2.variables['params']
        a1, b1 = cc.gn_affine(st, p1['scale'], p1['bias'], h * w)
        wc1, wo1 = cc.pack_weights(k1['kernel'].astype(dtype))
        h1 = cc.silu_affine(xc, a1, b1)
        y1, st1 = cc.conv3x3_dots(
            h1, wc1, wo1, jnp.tile(k1['bias'].astype(dtype), 2),
            interpret=interp)
        a2, b2 = cc.gn_affine(st1, p2['scale'], p2['bias'], h * w)
        wc2, wo2 = cc.pack_weights(k2['kernel'].astype(dtype))
        if blk.in_channels != out_ch:
            ks = blk.conv_out.variables['params']
            w1x1 = cc.pack_1x1(ks['kernel'].astype(dtype))
            skip_bias = jnp.tile(ks['bias'].astype(dtype), 2)
        else:
            w1x1, skip_bias = None, 0.0
        h2 = cc.silu_affine(y1, a2, b2)
        xc, st = cc.conv3x3_dots(
            h2, wc2, wo2,
            jnp.tile(k2['bias'].astype(dtype), 2) + skip_bias,
            skip=xc, w1x1=w1x1, interpret=interp)
        c_cur = out_ch
        j += 1
    return xc, st, c_cur, j


def _upsample_colpack(blk, x: jax.Array) -> jax.Array:
    """Upsample (nearest x2 + 3x3 conv) emitting the col-packed layout.

    Same phase-collapsed math as _PhaseCollapsedUpConv, but the four
    low-res phase outputs assemble straight into (B, 2H, W, 2C): column
    phases concatenate on lanes and row phases stack on a new axis that
    merges row-major — no depth-to-space transpose, and the packed
    consumer sees a plain row-major array (no relayout at the Pallas
    boundary).
    """
    p = blk.conv.variables['params']
    kernel = p['kernel'].astype(blk.dtype)
    bias = p['bias'].astype(blk.dtype)
    x = x.astype(blk.dtype)
    b, h, w, cin = x.shape
    cmap = _PhaseCollapsedUpConv._MAP
    feats = kernel.shape[-1]

    def phase(pr, qc):
        k2 = jnp.zeros((2, 2, cin, feats), kernel.dtype)
        rmap, cm = cmap[pr], cmap[qc]
        for u in range(3):
            for v in range(3):
                k2 = k2.at[rmap[u], cm[v]].add(kernel[u, v])
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k2.shape, ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((1 - pr, pr), (1 - qc, qc)),
            dimension_numbers=dn)

    rows = [jnp.concatenate([phase(pr, 0), phase(pr, 1)], axis=-1)
            for pr in (0, 1)]                       # (B, h, w, 2C) x2
    y = jnp.stack(rows, axis=2)                     # (B, h, 2, w, 2C)
    y = y.reshape(b, 2 * h, w, 2 * feats)           # free: rows row-major
    return y + jnp.tile(bias, 2)


def run_decoder_tail(blocks, i: int, x: jax.Array, fuse_fns=()):
    """Generator tail [Upsample, ResBlock+, GroupNorm, FastConv3x3] in
    one packed enclave. Returns (rgb, True) when handled, (x, False)
    otherwise.

    A packed ResBlock run pays ~11 ms of boundary relayouts at 512² B=16
    when sandwiched between XLA ops; here the Upsample ENTERS the packed
    layout for free (_upsample_colpack) and the final GroupNorm+silu+
    conv_out consume the run's emitted statistics, so the only XLA<->
    Pallas boundary is the (B, 512, 512, 3) RGB output (25 MB at B=16).
    Reference semantics: vqgan_arch.py:290-316 tail + CodeFormer main
    branch (codeformer_arch.py:223-280).
    """
    from codeformer_tpu.ops import colpack_conv as cc
    n = len(blocks)
    mode = _COLPACK_MODE
    if mode == 'off' or x.ndim != 4 or not isinstance(blocks[i], Upsample):
        return x, False
    if blocks[i].is_initializing():
        return x, False
    j = i + 1
    while j < n and isinstance(blocks[j], ResBlock):
        j += 1
    if not (j > i + 1 and j == n - 2
            and isinstance(blocks[n - 2], nn.GroupNorm)
            and isinstance(blocks[n - 1], FastConv3x3)):
        return x, False
    if any(k in fuse_fns for k in range(i, n)):
        return x, False
    b, h, w, c = x.shape
    h2, w2 = 2 * h, 2 * w
    dtype = blocks[i + 1].dtype
    if not _colpack_ok(blocks[i + 1],
                       jax.ShapeDtypeStruct((1, h2, w2, c), dtype)):
        return x, False
    interp = mode == 'interpret'

    xc = _upsample_colpack(blocks[i], x)
    st = cc.colpack_stats(xc)
    xc, st, c_cur, j2 = _packed_run(blocks, i + 1, xc, st, h2, w2)
    if j2 != n - 2:            # a mid-run ineligible block: bail to XLA
        y = cc.from_colpack(xc, c_cur).astype(x.dtype)
        for k in range(j2, n):
            y = blocks[k](y)
        return y, True
    gn = blocks[n - 2].variables['params']
    co = blocks[n - 1]
    pco = co.variables['params']
    a, bb = cc.gn_affine(st, gn['scale'], gn['bias'], h2 * w2)
    hf = cc.apply_affine(xc, a, bb)     # no swish before conv_out
    wc6, wo6 = cc.pack_weights(pco['kernel'].astype(dtype))
    y, _ = cc.conv3x3_dots(hf, wc6, wo6,
                           jnp.tile(pco['bias'].astype(dtype), 2),
                           interpret=interp)
    return cc.from_colpack(y, co.features).astype(x.dtype), True


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
        self.conv = _QuantizableConv(self.in_channels, strides=(2, 2),
                                     padding=((0, 1), (0, 1)),
                                     dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv(x)


class _QuantizableConv(nn.Module):
    """3x3 conv with nn.Conv-compatible params ('kernel' HWIO + 'bias')
    that dispatches to the int8 serving path when quant mode is on."""
    features: int
    strides: tuple = (1, 1)
    padding: Any = 'SAME'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from codeformer_tpu.nn import quant
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if quant.quant_active(self):
            y = quant.conv_int8(x, kernel, self.strides, self.padding)
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ('NHWC', 'HWIO', 'NHWC'))
            y = jax.lax.conv_general_dilated(
                x, kernel, self.strides, self.padding,
                dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class Upsample(nn.Module):
    """Nearest x2 upsample followed by a 3x3 conv (vqgan_arch.py:129-138).

    TPU-first evaluation: under nearest x2, the 3x3 conv's nine taps
    collapse onto at most 2x2 distinct source pixels per output phase, so
    the whole op is computed as four phase-collapsed 2x2 convs at LOW
    resolution + depth-to-space — 4/9 of the naive FLOPs and the 4x
    upsampled intermediate never exists in HBM. Parameters are identical
    to nn.Conv(C, (3, 3)) ('conv/kernel', 'conv/bias'); the math is exact
    up to f32 accumulation order.
    """
    in_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        # keep the 'conv' scope so checkpoints/converters are unchanged
        self.conv = _PhaseCollapsedUpConv(self.in_channels,
                                          dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv(x)


class _PhaseCollapsedUpConv(nn.Module):
    """The fused nearest-x2 + 3x3 conv (see Upsample)."""
    features: int
    dtype: Any = jnp.float32

    # tap index -> 2-tap window slot, per phase (0: window {-1,0},
    # 1: window {0,+1}) under nearest x2
    _MAP = {0: (0, 1, 1), 1: (0, 0, 1)}

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from codeformer_tpu.nn import quant
        b, h, w, cin = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        use_q = quant.quant_active(self)
        if use_q:
            xq, sx = quant.quantize_act(x)

        outs = []
        for p in (0, 1):
            rmap = self._MAP[p]
            for q in (0, 1):
                cmap = self._MAP[q]
                k2 = jnp.zeros((2, 2, cin, self.features), kernel.dtype)
                for u in range(3):
                    for v in range(3):
                        k2 = k2.at[rmap[u], cmap[v]].add(kernel[u, v])
                pad = ((1 - p, p), (1 - q, q))
                if use_q:
                    outs.append(quant.conv_int8_prequant(
                        xq, sx, k2, (1, 1), pad, out_dtype=self.dtype))
                    continue
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, k2.shape, ('NHWC', 'HWIO', 'NHWC'))
                outs.append(jax.lax.conv_general_dilated(
                    x, k2, (1, 1), pad, dimension_numbers=dn))
        y = jnp.stack(outs, axis=3)  # (B, h, w, 4, C) in (p, q) order
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w,
                                                  self.features)
        return y + bias.astype(self.dtype)


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


def run_edge_block(blk, x: jax.Array):
    """Colpack dispatch for the stage-EDGE blocks around a 512² ResBlock
    run: conv_in (FastConv3x3 with tiny C_in) and Downsample. Returns
    (y, True) when handled in the packed domain, (x, False) otherwise.

    Keeping these in the packed domain matters as much as the ResBlock
    kernels themselves: an XLA conv adjacent to a Pallas call costs a
    full-feature-map relayout copy (~537 MB / 1.3 ms at 512² C64 B=16,
    see ops/colpack_conv.py stage-edge section).
    """
    from codeformer_tpu.ops import colpack_conv as cc
    mode = _COLPACK_MODE
    if mode == 'off' or blk.is_initializing() or x.ndim != 4:
        return x, False
    interp = mode == 'interpret'
    b, h, w, c = x.shape
    hw_ok = interp or (jax.default_backend() == 'tpu'
                       and h * w >= 512 * 512)
    if isinstance(blk, FastConv3x3) and c <= 4 and w % 2 == 0 and hw_ok \
            and (interp or blk.dtype == jnp.bfloat16):
        p = blk.variables['params']
        y = cc.conv_in_packed(x.astype(blk.dtype),
                              p['kernel'].astype(blk.dtype),
                              p['bias'].astype(blk.dtype))
        return cc.from_colpack(y, blk.features).astype(x.dtype), True
    if isinstance(blk, Downsample) and c % 64 == 0 and h % (4 * cc.TY) == 0 \
            and w % 4 == 0 and hw_ok \
            and (interp or blk.dtype == jnp.bfloat16):
        p = blk.conv.variables['params']
        xc = cc.to_colpack(x.astype(blk.dtype))
        y = cc.downsample_dots(xc, p['kernel'].astype(blk.dtype),
                               p['bias'].astype(blk.dtype),
                               interpret=interp)
        return cc.from_colpack(y, c).astype(x.dtype), True
    return x, False
