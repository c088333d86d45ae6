"""Pallas TPU kernel: weight-stationary 3x3 stride-1 SAME conv packing
TWO 64-channel images per 128-lane tile (the "image-pair" design named
in docs/roofline.md "Remaining theoretical headroom").

Why this formulation: with C=64 the MXU's 128 output lanes are half
idle under XLA's conv lowering (measured 50-62 TF/s on the 512x512
stages, docs/roofline.md). Packing two BATCH elements channel-wise
fills both the K lanes (input: 128 channels per tap) and the N lanes
(output: 128 channels) with a block-diagonal weight matrix

    Wd[u, v] = [[W[u,v], 0], [0, W[u,v]]]          (128 x 128)

so each grid step runs 9 accumulating (TY*W, 128) @ (128, 128) MXU
dots. The arithmetic honesty up front: the block-diagonal halves are
ZEROS the MXU still multiplies, so the kernel does 2x the conventional
conv MACs — it only wins if its raw GEMM rate is >2x XLA's effective
C64 conv rate (i.e. raw > ~124 TF/s). The colpack/phase-pair designs
need only 4/3x but hit Mosaic lowering traps or relayout losses
(ops/pallas_conv.py, ops/colpack_conv.py). This kernel exists to close
VERDICT r4 item 4 with MEASURED numbers either way; see
scripts/bench_imgpair.py and the roofline round-5 serving section for
the verdict.

Layout: xp (B/2, H, W, 2C) = channel-concat of images (2b, 2b+1)
(pack_images / unpack_images). The kernel itself is the colpack
scaffold (double-buffered HBM->VMEM row-window DMA, sublane-shift tap
views, f32 accumulation) minus the phase algebra — taps shift in both
y (sublanes) and x (2nd minor) only; lanes never move, which is
exactly the part Mosaic rejected in the phase-pair kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TY = 16   # output rows per grid step (bf16 sublane tile)
TX = 256  # output columns per grid step (bounds the f32 accumulator)


# --------------------------------------------------------------- layouts
def pack_images(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B//2, H, W, 2C), lanes = (img, c)."""
    return jnp.concatenate([x[0::2], x[1::2]], axis=-1)


def unpack_images(xp: jax.Array, c: int) -> jax.Array:
    b2, h, w, _ = xp.shape
    out = jnp.stack([xp[..., :c], xp[..., c:]], axis=1)  # (B/2, 2, ...)
    return out.reshape(2 * b2, h, w, c)


# --------------------------------------------------------------- weights
def pack_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, 3, 2Ci, 2Co) block-diagonal pair matrix."""
    k = kernel
    z = jnp.zeros_like(k[0, 0])
    rows = []
    for u in range(3):
        cols = []
        for v in range(3):
            top = jnp.concatenate([k[u, v], z], axis=1)
            bot = jnp.concatenate([z, k[u, v]], axis=1)
            cols.append(jnp.concatenate([top, bot], axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


# ---------------------------------------------------------------- kernel
def _dot(a, w):
    return lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _kernel(xpad, wd, bias, out, win, sem, *, n_ty, n_tx, ci2):
    idx = pl.program_id(0)
    total = pl.num_programs(0)
    per_b = n_ty * n_tx

    def coords(i):
        return i // per_b, (i % per_b) // n_tx, (i % per_b) % n_tx

    def dma(slot, i):
        b, ty, tx = coords(i)
        return pltpu.make_async_copy(
            xpad.at[b, pl.ds(ty * TY, TY + 2),
                    pl.ds(tx * TX, TX + 16)],
            win.at[slot],
            sem.at[slot])

    @pl.when(idx == 0)
    def _():
        dma(0, 0).start()

    @pl.when(idx + 1 < total)
    def _():
        dma((idx + 1) % 2, idx + 1).start()

    slot = idx % 2
    dma(slot, idx).wait()

    acc = jnp.zeros((TY, TX, wd.shape[-1]), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = win[slot, u:u + TY, v:v + TX]  # (TY, TX, 2Ci)
            acc += _dot(tap, wd[u, v])
    res = acc + bias[...].astype(jnp.float32)
    out[0] = res.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def conv3x3_imgpair(xp: jax.Array, wd: jax.Array, bias2: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Exact 3x3 stride-1 SAME conv on an image-pair-packed batch.

    xp: (B/2, H, W, 2*Cin) from pack_images (H % TY == 0, W % TX == 0).
    wd: (3, 3, 2Ci, 2Co) from pack_weights. bias2: (2*Cout,) = conv
    bias tiled twice. Returns (B/2, H, W, 2*Cout) packed.
    """
    b2, h, w, ci2 = xp.shape
    co2 = wd.shape[-1]
    assert h % TY == 0 and w % TX == 0, (h, w)
    n_ty, n_tx = h // TY, w // TX

    # SAME halo: 1 row/col each side; right-pad the column dim to the
    # 16-sublane multiple the window DMA needs (TX + 2 -> TX + 16)
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 15), (0, 0)))

    grid = (b2 * n_ty * n_tx,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_ty=n_ty, n_tx=n_tx, ci2=ci2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, 3, ci2, co2), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((co2,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, TX, co2),
            lambda i, nty=n_ty, ntx=n_tx: (
                i // (nty * ntx), (i % (nty * ntx)) // ntx,
                (i % (nty * ntx)) % ntx, 0)),
        out_shape=jax.ShapeDtypeStruct((b2, h, w, co2), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 2, TX + 16, ci2), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, wd, bias2)
    return out


def conv3x3_pair(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Convenience wrapper: NHWC single-image API around the packed
    kernel (pads odd batches). For benchmarking / parity tests."""
    b = x.shape[0]
    if b % 2:
        x = jnp.concatenate([x, x[-1:]], axis=0)
    xp = pack_images(x)
    wd = pack_weights(kernel)
    bias2 = jnp.concatenate([bias, bias])
    yp = conv3x3_imgpair(xp, wd, bias2, interpret=interpret)
    y = unpack_images(yp, kernel.shape[-1])
    return y[:b]
