"""Column-packed 3x3 conv — a Pallas TPU kernel for thin-channel layers.

Problem (docs/roofline.md): the 512x512 C=64 stages dominate the
CodeFormer forward, and XLA's conv lowering runs them at ~45 TF/s because
C_out = 64 fills half of the MXU's 128 output lanes. Graph-level
reformulations all hand the shape win back (scripts/bench_conv512.py),
and the earlier phase-pair Pallas kernel (ops/pallas_conv.py) died on two
Mosaic limitations: concatenation of offset-mismatched slices and
lane-splitting reshapes.

This kernel packs COLUMN pairs only. Data layout: (B, H, W/2, 2C) where
lane block qx*C+c holds original pixel (y, 2X+qx, c) — "col-packed". For
each output cell the 3x3 conv needs original columns 2X-1 .. 2X+2, i.e.
packed cells X-1 (phase 1 only), X (both phases), X+1 (phase 0 only).
Per kernel row u this becomes exactly TWO full-K matmuls:

  center:  A = cell X                      (K = 2*Cin, dense weights)
  outer:   A = [cell X-1 phase1 | cell X+1 phase0]   (block-diag weights)

and the outer operand is built WITHOUT any misaligned concat — a single
VPU lane-select, with the half-period lane rotation folded into the
weight matrix on the host (dot(roll(pre, Cin), Wo) == dot(pre, Wo rows
rotated by Cin); Mosaic has no bf16 rotate, so the kernel never rolls):

  pre = where(lane < Cin, right_cell, left_cell)        # VPU select

MXU efficiency: 6 dots of (K=2Cin, N=2Cout) carry
18*Cin*Cout real MACs out of 24*Cin*Cout issued — 75% of peak, vs 50%
for the N=Cout XLA form.

The column halo is resolved by three HBM views (left/center/right column
shifts, sliced by XLA); the row halo by overlapping (TY+2)-row DMA
windows, double-buffered by hand so copies overlap compute. Everything a
previous Mosaic version rejected (concat, lane-split reshape, strided
store) is absent by construction.

Reference behavior matched: 3x3 stride-1 SAME conv, i.e. nn.Conv used by
ResBlock (reference vqgan_arch.py:141-164).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 16  # output rows per grid step (sublane-tile multiple for bf16)


# --------------------------------------------------------------- layouts
def to_colpack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/2, 2C); lanes ordered (qx, c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def from_colpack(xc: jax.Array, c: int) -> jax.Array:
    b, h, wp, _ = xc.shape
    return xc.reshape(b, h, 2 * wp, c)


# --------------------------------------------------------------- weights
def pack_weights(kernel: jax.Array):
    """(3,3,Ci,Co) -> (wc, wo): (3, 2Ci, 2Co) center / outer matrices.

    Pure jnp (jit/trace-safe).  wc[u] block [px, qx] = k[u, 1 + px - qx];
    wo[u] rows are pre-rotated by Ci: pre[0:Ci] is the RIGHT cell's
    phase 0 (original column 2X+2 -> qx=1 at v=2), pre[Ci:] the LEFT
    cell's phase 1 (column 2X-1 -> qx=0 at v=0).
    """
    k = kernel
    z = jnp.zeros_like(k[0, 0])

    def blk(r0c0, r0c1, r1c0, r1c1):
        return jnp.concatenate([
            jnp.concatenate([r0c0, r0c1], axis=1),
            jnp.concatenate([r1c0, r1c1], axis=1)], axis=0)

    wc = jnp.stack([blk(k[u, 1], k[u, 0], k[u, 2], k[u, 1])
                    for u in range(3)])
    wo = jnp.stack([blk(z, k[u, 2], k[u, 0], z) for u in range(3)])
    return wc, wo


# ---------------------------------------------------------------- kernel
def _dot(a, w):
    """(TY, wp, K) x (K, N) -> (TY, wp, N), f32 accumulation on the MXU."""
    return lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _kernel(xpad, wc, wo, bias, out, win, sem, *, n_tiles, ci2, wp):
    idx = pl.program_id(0)
    total = pl.num_programs(0)
    b = idx // n_tiles
    t = idx % n_tiles

    def dma(slot, bb, tt):
        return pltpu.make_async_copy(
            xpad.at[bb, pl.ds(tt * TY, TY + 2)],
            win.at[slot],
            sem.at[slot])

    @pl.when(idx == 0)
    def _():
        dma(0, b, t).start()

    nxt = idx + 1

    @pl.when(nxt < total)
    def _():
        dma(nxt % 2, nxt // n_tiles, nxt % n_tiles).start()

    slot = idx % 2
    dma(slot, b, t).wait()

    cin = ci2 // 2
    acc = jnp.zeros((TY, wp, wc.shape[-1]), jnp.float32)
    lane = lax.broadcasted_iota(jnp.int32, (TY, wp, ci2), 2)
    for u in range(3):
        left = win[slot, u:u + TY, 0:wp]         # (TY, wp, 2Ci)
        cent = win[slot, u:u + TY, 1:wp + 1]
        right = win[slot, u:u + TY, 2:wp + 2]
        pre = jnp.where(lane < cin, right, left)
        acc += _dot(cent, wc[u])
        acc += _dot(pre, wo[u])
    res = acc + bias[...].astype(jnp.float32)
    out[0] = res.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def conv3x3_colpack(xc: jax.Array, wc: jax.Array, wo: jax.Array,
                    bias2: jax.Array, interpret: bool = False) -> jax.Array:
    """Exact 3x3 stride-1 SAME conv in col-packed layout.

    xc: (B, H, W/2, 2*Cin) col-packed input (H a multiple of TY).
    wc, wo: packed weights from pack_weights().  bias2: (2*Cout,) = the
    conv bias tiled twice.  Returns (B, H, W/2, 2*Cout) col-packed.
    """
    b, h, wp, ci2 = xc.shape
    co2 = wc.shape[-1]
    assert h % TY == 0, f'H={h} must be a multiple of TY={TY}'
    n_tiles = h // TY

    # right-pad the packed-column dim to a sublane-tile multiple so the
    # HBM->VMEM window DMA is tile-aligned (Mosaic requirement)
    wpad = -(-(wp + 2) // 16) * 16
    xpad = jnp.pad(xc, ((0, 0), (1, 1), (1, wpad - wp - 1), (0, 0)))

    grid = (b * n_tiles,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles, ci2=ci2, wp=wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, ci2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, ci2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((co2,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, wp, co2),
            lambda i, n=n_tiles: (i // n, i % n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, co2), xc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 2, wpad, ci2), xc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, wc, wo, bias2)
    return out


def conv3x3_colpack_ref(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array) -> jax.Array:
    """Reference path: plain lax conv in the normal layout."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(x, kernel, (1, 1), 'SAME',
                                        dimension_numbers=dn) + bias


def pack_1x1(kernel: jax.Array) -> jax.Array:
    """1x1-conv kernel (1,1,Ci,Co) or (Ci,Co) -> block-diag (2Ci, 2Co)."""
    k = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    ci, co = k.shape
    z = jnp.zeros_like(k)
    return jnp.concatenate([
        jnp.concatenate([k, z], axis=1),
        jnp.concatenate([z, k], axis=1)], axis=0)


def colpack_stats(xc: jax.Array) -> jax.Array:
    """XLA fallback stats for a stage entry: (B, 1, 2, 2C) sums like the
    kernel's emitted partials (sum, sumsq over H, W per packed lane)."""
    x32 = xc.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2))
    s2 = jnp.sum(x32 * x32, axis=(1, 2))
    return jnp.stack([s1, s2], axis=1)[:, None]


def gn_affine(stats: jax.Array, gamma: jax.Array, beta: jax.Array,
              n_pixels: int, num_groups: int = 32, eps: float = 1e-6):
    """Fold GroupNorm into a per-sample per-packed-lane affine.

    stats: (B, n_tiles, 2, 2C) partial [sum, sumsq] over the ORIGINAL
    (H, W) pixels (each original pixel appears once across the two
    packed column phases, so summing lanes c and C+c gives the true
    channel sums).  gamma/beta: (C,) GroupNorm params.  n_pixels: H*W of
    the ORIGINAL feature map.  Returns (a, b): (B, 2C) f32 with
    gn(x) = a * x + b per packed lane.
    """
    s = jnp.sum(stats, axis=1)                      # (B, 2, 2C)
    bsz, _, c2 = s.shape
    c = c2 // 2
    g = num_groups
    per = c // g
    # packed lanes (qx, c): fold the two column phases together
    s1 = s[:, 0].reshape(bsz, 2, c).sum(1)          # (B, C)
    s2 = s[:, 1].reshape(bsz, 2, c).sum(1)
    cnt = n_pixels * per
    gs1 = s1.reshape(bsz, g, per).sum(-1)           # (B, G)
    gs2 = s2.reshape(bsz, g, per).sum(-1)
    mean = gs1 / cnt
    var = gs2 / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, per, axis=1)          # (B, C)
    rstd_c = jnp.repeat(rstd, per, axis=1)
    a = rstd_c * gamma.astype(jnp.float32)[None]
    b = beta.astype(jnp.float32)[None] - mean_c * a
    return jnp.tile(a, (1, 2)), jnp.tile(b, (1, 2))

# ===================================================================
# Production path: XLA elementwise prologue + halo-in-VMEM dots kernel.
#
# Findings that shaped this design (all measured, B=16 C=64 512² bf16):
#   - bare col-packed dots:            3.3 ms  (76% of issued-MXU peak)
#   - the same silu(gn(x)) prologue:   2.75 ms on the VPU inside the
#     kernel, 1.35 ms as ONE fused XLA elementwise pass (XLA's
#     bandwidth-bound loop beats Mosaic's op-by-op VPU stream ~2x, and
#     Mosaic will NOT overlap a VPU prologue with the MXU dots — a
#     software-pipelined variant measured identical to the serial one)
#   - jnp.pad never fuses into the elementwise pass (a padded-layout
#     "stage-resident" variant paid a full extra HBM pass per conv)
#
# So: silu(a*x+b) runs in XLA (silu_affine, pure elementwise, fused to
# one HBM pass), and the Pallas kernel does ONLY the conv dots plus the
# skip add, emitting per-tile [sum, sumsq] partials of the output so the
# next GroupNorm costs no reduction pass.  All halo handling lives in
# VMEM: the window holds LPAD zero columns on each side (zeroed once per
# buffer slot), and the top/bottom image rows use shorter DMAs with a
# destination row offset (rows are outer dims — any offset is legal).
# ===================================================================

LPAD = 8   # zero halo columns inside the VMEM window (8-aligned stores)


def silu_affine(xc: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """XLA prologue: silu(x * a + b) per packed lane — one fused pass.

    a, b: (B, 2C) from gn_affine(). Keeps xc.dtype.
    """
    out = jax.nn.silu(xc.astype(jnp.float32) * a[:, None, None]
                      + b[:, None, None])
    return out.astype(xc.dtype)


def apply_affine(xc: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """GroupNorm WITHOUT activation: x * a + b per packed lane (the
    generator/encoder tails run normalize -> conv directly, no swish —
    reference vqgan_arch.py:313-314)."""
    out = xc.astype(jnp.float32) * a[:, None, None] + b[:, None, None]
    return out.astype(xc.dtype)


def _dots_kernel(hf, wc, wo, bias, *rest, n_tiles, ci2, wp, ty, h_img,
                 skip_mode):
    it = iter(rest)
    skip = next(it) if skip_mode != 'none' else None
    w1x1 = next(it) if skip_mode == 'proj' else None
    out, stats, win, sem = it
    idx = pl.program_id(0)
    total = pl.num_programs(0)

    def start_dma(slot, bb, tt):
        # interior: image rows [tt*ty-1, tt*ty+ty+1) -> win rows [0, ty+2)
        # top  (tt==0):   rows [0, ty+1)        -> win rows [1, ty+2)
        # bottom (last):  rows [tt*ty-1, h_img) -> win rows [0, ty+1)
        @pl.when(tt == 0)
        def _():
            pltpu.make_async_copy(
                hf.at[bb, pl.ds(0, ty + 1)],
                win.at[slot, pl.ds(1, ty + 1), pl.ds(LPAD, wp)],
                sem.at[slot]).start()
            win[slot, 0, LPAD:LPAD + wp] = jnp.zeros(
                (wp, ci2), win.dtype)
        @pl.when((tt > 0) & (tt < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                hf.at[bb, pl.ds(tt * ty - 1, ty + 2)],
                win.at[slot, pl.ds(0, ty + 2), pl.ds(LPAD, wp)],
                sem.at[slot]).start()
        @pl.when(tt == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                hf.at[bb, pl.ds(tt * ty - 1, ty + 1)],
                win.at[slot, pl.ds(0, ty + 1), pl.ds(LPAD, wp)],
                sem.at[slot]).start()
            win[slot, ty + 1, LPAD:LPAD + wp] = jnp.zeros(
                (wp, ci2), win.dtype)

    b = idx // n_tiles
    t = idx % n_tiles

    @pl.when(idx == 0)
    def _():
        # one-time: zero the halo columns of both window slots
        for s in range(2):
            win[s, :, 0:LPAD] = jnp.zeros((ty + 2, LPAD, ci2), win.dtype)
            win[s, :, LPAD + wp:] = jnp.zeros(
                (ty + 2, win.shape[2] - LPAD - wp, ci2), win.dtype)
        start_dma(0, b, t)
    nxt = idx + 1

    @pl.when(nxt < total)
    def _():
        start_dma(nxt % 2, nxt // n_tiles, nxt % n_tiles)

    slot = idx % 2
    # wait: match the copy issued for THIS tile (size differs at edges)
    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(
            hf.at[b, pl.ds(0, ty + 1)],
            win.at[slot, pl.ds(1, ty + 1), pl.ds(LPAD, wp)],
            sem.at[slot]).wait()
    @pl.when((t > 0) & (t < n_tiles - 1))
    def _():
        pltpu.make_async_copy(
            hf.at[b, pl.ds(t * ty - 1, ty + 2)],
            win.at[slot, pl.ds(0, ty + 2), pl.ds(LPAD, wp)],
            sem.at[slot]).wait()
    @pl.when(t == n_tiles - 1)
    def _():
        pltpu.make_async_copy(
            hf.at[b, pl.ds(t * ty - 1, ty + 1)],
            win.at[slot, pl.ds(0, ty + 1), pl.ds(LPAD, wp)],
            sem.at[slot]).wait()

    cin = ci2 // 2
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, ci2), 2)
    acc = jnp.zeros((ty, wp, wc.shape[-1]), jnp.float32)
    for u in range(3):
        left = win[slot, u:u + ty, LPAD - 1:LPAD - 1 + wp]
        cent = win[slot, u:u + ty, LPAD:LPAD + wp]
        right = win[slot, u:u + ty, LPAD + 1:LPAD + 1 + wp]
        pre = jnp.where(lane < cin, right, left)
        acc += _dot(cent, wc[u])
        acc += _dot(pre, wo[u])
    acc += bias[...].astype(jnp.float32)
    if skip_mode == 'identity':
        acc += skip[0].astype(jnp.float32)
    elif skip_mode == 'proj':
        acc += _dot(skip[0], w1x1[...])
    res = acc.astype(out.dtype)
    out[0] = res
    r32 = res.astype(jnp.float32)
    stats[0, 0, 0] = jnp.sum(r32, axis=(0, 1))
    stats[0, 0, 1] = jnp.sum(r32 * r32, axis=(0, 1))


def conv3x3_dots(hf: jax.Array, wc: jax.Array, wo: jax.Array,
                 bias2: jax.Array, skip: Optional[jax.Array] = None,
                 w1x1: Optional[jax.Array] = None,
                 interpret: bool = False, ty: Optional[int] = None):
    """3x3 SAME conv dots over a pre-activated col-packed map (+ skip).

    hf: (B, H, Wp, 2Ci) — silu(gn(x)) from silu_affine(), unpadded.
    skip: optional (B, H, Wp, 2Co) residual (identity) or (B, H, Wp, 2Ci)
    with w1x1 (2Ci, 2Co) from pack_1x1().  Returns (y, stats): y
    (B, H, Wp, 2Co) col-packed; stats (B, n_tiles, 2, 2Co) f32 per-tile
    [sum, sumsq] of y for the next GroupNorm via gn_affine().
    """
    b, h, wp, ci2 = hf.shape
    co2 = wc.shape[-1]
    # row tile: TY at ci2<=256 (window 2*(TY+2)*272*256*2B = 5 MB of the
    # 16 MB scoped-VMEM stack); halved beyond that
    if ty is None:
        ty = TY if ci2 <= 256 else TY // 2
    assert h % ty == 0 and h // ty >= 2, (h, ty)
    n_tiles = h // ty
    ct = LPAD + wp + LPAD

    skip_mode = 'none'
    extra_in, extra_specs = [], []
    if skip is not None:
        skip_mode = 'identity' if w1x1 is None else 'proj'
        extra_in.append(skip)
        extra_specs.append(pl.BlockSpec(
            (1, ty, wp, skip.shape[-1]),
            lambda i, n=n_tiles: (i // n, i % n, 0, 0)))
        if w1x1 is not None:
            extra_in.append(w1x1)
            extra_specs.append(pl.BlockSpec(w1x1.shape, lambda i: (0, 0)))

    y, stats = pl.pallas_call(
        functools.partial(_dots_kernel, n_tiles=n_tiles, ci2=ci2, wp=wp,
                          ty=ty, h_img=h, skip_mode=skip_mode),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, ci2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, ci2, co2), lambda i: (0, 0, 0)),
            pl.BlockSpec((co2,), lambda i: (0,)),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, ty, wp, co2),
                         lambda i, n=n_tiles: (i // n, i % n, 0, 0)),
            pl.BlockSpec((1, 1, 2, co2),
                         lambda i, n=n_tiles: (i // n, i % n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, co2), hf.dtype),
            jax.ShapeDtypeStruct((b, n_tiles, 2, co2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ty + 2, ct, ci2), hf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(hf, wc, wo, bias2, *extra_in)
    return y, stats

# ===================================================================
# Stage-edge ops: conv_in and Downsample in the packed domain.
#
# Why: every XLA conv adjacent to a Pallas call costs a full-feature-map
# relayout copy (XLA convs prefer layouts like {3,0,2,1}; custom calls
# pin row-major) — measured 537 MB / ~1.3 ms per boundary at 512² C64
# B=16. Keeping the whole 512² encoder stage in the packed domain
# (conv_in -> ResBlock run -> Downsample) moves the only XLA<->Pallas
# boundaries to the image input (25 MB) and the 256² exit (134 MB).
# ===================================================================

def conv_in_packed(img: jax.Array, kernel: jax.Array,
                   bias: jax.Array) -> jax.Array:
    """3x3 SAME conv C_in->Co for tiny C_in, col-packed output — pure XLA.

    im2col over the packed cell (3 rows x 4 cols x C_in taps) followed by
    one einsum: K=12*C_in, N=2*Co full MXU lanes. Measured ~2x faster
    than XLA's native conv lowering for C_in=3 @512² (K=27 starves the
    systolic array) AND the output is a plain row-major dot result, so
    the downstream silu_affine/dots enclave sees no relayout.
    Reference: conv_in nn.Conv2d(3, nf, 3, 1, 1) (vqgan_arch.py:243).
    """
    b, h, w, cin = img.shape
    co = kernel.shape[-1]
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 2), (0, 0)))
    cols = [p[:, :, s:s + w:2] for s in range(4)]       # (B,H+2,W/2,Cin) x4
    pat = jnp.concatenate(cols, axis=-1)
    pat = jnp.concatenate([pat[:, u:u + h] for u in range(3)], axis=-1)
    z = jnp.zeros_like(kernel[0, 0])

    def blkrow(u, dx):
        return jnp.concatenate(
            [kernel[u, dx - qx] if 0 <= dx - qx < 3 else z
             for qx in range(2)], axis=1)

    wt = jnp.concatenate([blkrow(u, dx) for u in range(3)
                          for dx in range(4)], axis=0).astype(img.dtype)
    out = jnp.einsum('bhwk,kc->bhwc', pat, wt,
                     preferred_element_type=jnp.float32)
    return (out + jnp.tile(bias, 2).astype(jnp.float32)).astype(img.dtype)


def pack_weights_down(kernel: jax.Array):
    """(3,3,C,C) -> (wc, wo): (3, 4C, 2C) quad-packed stride-2 matrices.

    Output phase qx (col 2X'+qx) takes taps v at input col 2qx+v of the
    quad-cell X' (wc) or col 2qx+v-4 of quad-cell X'+1 (wo).
    """
    k = kernel
    z = jnp.zeros_like(k[0, 0])

    def cblk(u, col):
        return jnp.concatenate(
            [k[u, col - 2 * qx] if 0 <= col - 2 * qx < 3 else z
             for qx in range(2)], axis=1)

    def oblk(u, colp):
        return jnp.concatenate(
            [k[u, colp + 4 - 2 * qx] if 0 <= colp + 4 - 2 * qx < 3 else z
             for qx in range(2)], axis=1)

    wc = jnp.stack([jnp.concatenate([cblk(u, c) for c in range(4)], 0)
                    for u in range(3)])
    wo = jnp.stack([jnp.concatenate([oblk(u, c) for c in range(4)], 0)
                    for u in range(3)])
    return wc, wo


def _down_kernel(q, wc, wo, bias, out, wine, wino, seme, semo, *,
                 n_tiles, c4, wq, ty):
    """q: (B, H/2, 2, Wq, 4C) — row-pair view of the quad-packed input.

    The row-parity "split" is an index on an OUTER dim of a free
    row-major reshape, so the even/odd row streams come straight out of
    HBM with no XLA relayout (the old two-array form paid a 6.4 ms
    strided-slice copy per call at 512² C64 B=16).
    """
    idx = pl.program_id(0)
    total = pl.num_programs(0)

    def start_dma(slot, bb, tt):
        # even rows [tt*ty, tt*ty+ty+1) except the bottom edge tile,
        # which zero-fills the halo row (input row H == bottom pad)
        @pl.when(tt < n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                q.at[bb, pl.ds(tt * ty, ty + 1), 0],
                wine.at[slot, pl.ds(0, ty + 1), pl.ds(0, wq)],
                seme.at[slot]).start()
        @pl.when(tt == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                q.at[bb, pl.ds(tt * ty, ty), 0],
                wine.at[slot, pl.ds(0, ty), pl.ds(0, wq)],
                seme.at[slot]).start()
            wine[slot, ty, 0:wq] = jnp.zeros((wq, c4), wine.dtype)
        pltpu.make_async_copy(
            q.at[bb, pl.ds(tt * ty, ty), 1],
            wino.at[slot, pl.ds(0, ty), pl.ds(0, wq)],
            semo.at[slot]).start()

    def wait_dma(slot, tt):
        @pl.when(tt < n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                q.at[0, pl.ds(0, ty + 1), 0],
                wine.at[slot, pl.ds(0, ty + 1), pl.ds(0, wq)],
                seme.at[slot]).wait()
        @pl.when(tt == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                q.at[0, pl.ds(0, ty), 0],
                wine.at[slot, pl.ds(0, ty), pl.ds(0, wq)],
                seme.at[slot]).wait()
        pltpu.make_async_copy(
            q.at[0, pl.ds(0, ty), 1],
            wino.at[slot, pl.ds(0, ty), pl.ds(0, wq)],
            semo.at[slot]).wait()

    b = idx // n_tiles
    t = idx % n_tiles

    @pl.when(idx == 0)
    def _():
        for s in range(2):
            wine[s, :, wq:] = jnp.zeros(
                (ty + 1, wine.shape[2] - wq, c4), wine.dtype)
            wino[s, :, wq:] = jnp.zeros(
                (ty, wino.shape[2] - wq, c4), wino.dtype)
        start_dma(0, b, t)
    nxt = idx + 1

    @pl.when(nxt < total)
    def _():
        start_dma(nxt % 2, nxt // n_tiles, nxt % n_tiles)
    slot = idx % 2
    wait_dma(slot, t)

    acc = jnp.zeros((ty, wq, wc.shape[-1]), jnp.float32)
    rows = [wine[slot, 0:ty], wino[slot, 0:ty], wine[slot, 1:ty + 1]]
    for u in range(3):
        acc += _dot(rows[u][:, 0:wq], wc[u])
        acc += _dot(rows[u][:, 1:wq + 1], wo[u])
    acc += bias[...].astype(jnp.float32)
    out[0] = acc.astype(out.dtype)


def downsample_dots(xc: jax.Array, kernel: jax.Array, bias: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Reference Downsample (pad (0,1,0,1), 3x3 stride-2 conv,
    vqgan_arch.py:117-126) on a col-packed map.

    xc: (B, H, Wp, 2C) col-packed. Returns (B, H/2, Wp/2, 2C)
    col-packed at the new resolution. The row-parity split runs in XLA
    (Mosaic rejects strided window reads); everything else is two
    K=4C dots per kernel row on the quad-packed view.
    """
    b, h, wp, c2 = xc.shape
    c = c2 // 2
    wq = wp // 2
    # row-pair view: BOTH regroupings are free row-major reshapes (no
    # transpose); the parity axis lands outer so the kernel DMAs index it
    q = xc.reshape(b, h // 2, 2, wq, 4 * c)
    wc, wo = pack_weights_down(kernel.astype(xc.dtype))
    bias2 = jnp.tile(bias, 2).astype(xc.dtype)
    ho = h // 2
    ty = TY if 4 * c <= 256 else TY // 2
    assert ho % ty == 0, (ho, ty)
    n_tiles = ho // ty
    wqp = wq + 8                          # zero right halo (8-aligned)

    out = pl.pallas_call(
        functools.partial(_down_kernel, n_tiles=n_tiles, c4=4 * c,
                          wq=wq, ty=ty),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, 4 * c, c2), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, 4 * c, c2), lambda i: (0, 0, 0)),
            pl.BlockSpec((c2,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, ty, wq, c2),
            lambda i, n=n_tiles: (i // n, i % n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ho, wq, c2), xc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ty + 1, wqp, 4 * c), xc.dtype),
            pltpu.VMEM((2, ty, wqp, 4 * c), xc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(q, wc, wo, bias2)
    return out
