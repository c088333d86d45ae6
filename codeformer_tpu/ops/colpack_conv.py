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
    """(3,3,Ci,Co) -> (wc, wo): (3, 2Ci, 2Co) center / outer matrices."""
    k = np.asarray(kernel, np.float32)
    _, _, ci, co = k.shape
    wc = np.zeros((3, 2 * ci, 2 * co), np.float32)
    wo = np.zeros((3, 2 * ci, 2 * co), np.float32)
    for u in range(3):
        for px in (0, 1):
            for qx in (0, 1):
                v = 1 + px - qx
                wc[u, px * ci:(px + 1) * ci, qx * co:(qx + 1) * co] = k[u, v]
        # rows pre-rotated by Cin: pre[0:Ci] is the RIGHT cell's phase 0
        # (original column 2X+2, contributes to qx=1 at v=2) and
        # pre[Ci:2Ci] the LEFT cell's phase 1 (column 2X-1, qx=0, v=0)
        wo[u, :ci, co:] = k[u, 2]
        wo[u, ci:, :co] = k[u, 0]
    return (jnp.asarray(wc, kernel.dtype), jnp.asarray(wo, kernel.dtype))


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
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    return lax.conv_general_dilated(x, kernel, (1, 1), 'SAME',
                                    dimension_numbers=dn) + bias
