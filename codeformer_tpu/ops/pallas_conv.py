"""Pallas TPU kernel: 3x3 stride-1 SAME conv for thin-channel (C<=64)
high-resolution layers.

Why: with C_out = 64, XLA's conv lowering fills only half of the MXU's
128 output lanes — measured 50-62 TFLOP/s on the 512x512 stages that
dominate the CodeFormer forward (docs/roofline.md). Graph-level rewrites
(phase packing, space-to-depth) lose their shape gains to relayouts and
broken fusion. This kernel changes the GEMM shape instead: each matmul
computes TWO adjacent output columns of all 64 channels

    out(y, 2j + ph, co) = sum_{u, v'} W[u, v', ci, co] x(y+u-1, 2j+ph+v'-1, ci)

so the B-matrix packs both x-phases: B[(u, v, ci), ph*64 + co] =
W[u, v - ph, ci, co] (zero where v - ph is outside 0..2), giving
K = 3*4*64 = 768, N = 128 — full lanes at 4/3 the MACs.

Grid: (batch, row-tiles). The row halo comes from three shifted views of
the input (Pallas auto-pipelines the blocks); W-edge zero padding happens
in-register. Accumulation in f32 via preferred_element_type.

STATUS: exactness-verified (interpret mode + CPU tests) but NOT wired
into the model. Mosaic (jax 0.8 / libtpu in this image) rejects the two
efficient lowerings of the phase math on real TPU hardware:
  * `tpu.concatenate` of the 12 im2col tap slices — "result/input offset
    mismatch on non-concat dimension" (the u/ph shifts give each slice a
    different sublane/lane offset), and
  * the output phase un-interleave — both the (.., 2*cout) -> (.., 2,
    cout) lane-splitting reshape and the slice+stack form hit the same
    offset-mismatch error.
The surviving formulation (12 accumulating K=64 matmuls + phase-major
output with a host-side interleave) caps at the same ~98 TFLOP/s ceiling
as XLA's native conv and re-introduces the relayout that made the
graph-level phase packing a net loss (docs/roofline.md). Kept as a
documented, tested starting point for when Mosaic grows offset-tolerant
concat or strided stores.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-tile height: keeps in/out blocks + the im2col buffer well under VMEM
TY = 8

# tap v -> (x-phase, phase-block offset) for a left pad of 2 columns
_V_SLICES = ((1, 0), (0, 1), (1, 1), (0, 2))


def pack_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 4, Cin, 2*Cout) phase-pair B-matrix."""
    k3, _, cin, cout = kernel.shape
    w4 = jnp.zeros((3, 4, cin, 2 * cout), kernel.dtype)
    for ph in (0, 1):
        for v in range(4):
            if 0 <= v - ph <= 2:
                w4 = w4.at[:, v, :, ph * cout:(ph + 1) * cout].set(
                    kernel[:, v - ph])
    return w4


def _kernel(top_ref, mid_ref, bot_ref, w_ref, out_ref, *, ty, w, cin,
            cout):
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    top = top_ref[0]  # (ty, w, cin)
    mid = mid_ref[0]
    bot = bot_ref[0]
    zero_row = jnp.zeros((1, w, cin), mid.dtype)
    row_above = jnp.where(t == 0, zero_row, top[-1:])
    row_below = jnp.where(t == nt - 1, zero_row, bot[:1])
    x = jnp.concatenate([row_above, mid, row_below], axis=0)
    x = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))  # W-edge zeros
    xp = x.reshape(ty + 2, (w + 4) // 2, 2, cin)

    # accumulate 12 tap matmuls (K=cin each): a single concatenated
    # im2col GEMM would have K=12*cin, but Mosaic rejects concatenating
    # slices whose sublane/lane offsets differ (the u/ph shifts)
    y = jnp.zeros((ty * (w // 2), 2 * cout), jnp.float32)
    for u in range(3):
        for v, (ph, off) in enumerate(_V_SLICES):
            xs = xp[u:u + ty, off:off + w // 2, ph, :].reshape(
                ty * (w // 2), cin)
            y = y + jnp.dot(xs, w_ref[u, v],
                            preferred_element_type=jnp.float32)
    # un-interleave the two x-phases: column 2j+ph = lanes [ph*cout:...]
    # of pair j. A direct (.., 2*cout) -> (.., 2, cout) reshape is a lane
    # split Mosaic rejects; slice + stack keeps the lane dim intact.
    y = y.reshape(ty, w // 2, 2 * cout)
    y = jnp.stack([y[:, :, :cout], y[:, :, cout:]], axis=2)
    out_ref[0] = y.reshape(ty, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def conv3x3_pallas(x: jax.Array, kernel: jax.Array,
                   bias: Optional[jax.Array] = None) -> jax.Array:
    """3x3 SAME stride-1 conv. x: (B, H, W, Cin) with H % TY == 0 and
    W even; kernel: (3, 3, Cin, Cout). Compute dtype follows x."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % TY == 0 and w % 2 == 0, (h, w)
    w4 = pack_weights(kernel)

    grid = (b, h // TY)
    nt = h // TY
    # halo views: block indices clamped at the edges (the kernel replaces
    # the out-of-image halo rows with zeros anyway)
    blk = lambda dt: pl.BlockSpec(  # noqa: E731
        (1, TY, w, cin),
        lambda i, t, _d=dt: (i, jnp.clip(t + _d, 0, nt - 1), 0, 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, ty=TY, w=w, cin=cin, cout=cout),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            blk(-1),  # previous row-tile (halo above)
            blk(0),   # current row-tile
            blk(1),   # next row-tile (halo below)
            pl.BlockSpec((3, 4, cin, 2 * cout), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TY, w, cout),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (w // 2) * 12 * cin * 2 * cout,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + b * h * w * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() == 'cpu',
    )(x, x, x, w4)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
