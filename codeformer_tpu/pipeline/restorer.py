"""Batched aligned-face restoration — the jit-compiled core of the pipeline.

Replaces the reference's per-face Python loop
(inference_codeformer.py:197-213): faces are batched through ONE compiled
graph (normalize -> CodeFormer -> denormalize, all on device) with bucketed
batch sizes so every shape is static. The fidelity weight `w` is a traced
scalar — no recompile per w.
"""
from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from codeformer_tpu.models import CodeFormer
from codeformer_tpu.nn.blocks import set_colpack_mode
from codeformer_tpu.nn.quant import set_quant_mode
from codeformer_tpu.utils.checkpoint import init_params_fast, load_checkpoint
from codeformer_tpu.utils.misc import setup_jax


class CodeFormerRestorer:
    """Loads weights and serves batched 512x512 aligned-face restoration.

    Args mirror the reference CLI's network construction
    (inference_codeformer.py:135-142): codebook_size / connect_list select
    the restoration, colorization or inpainting variant.
    """

    def __init__(self, checkpoint: Optional[str] = None,
                 dim_embd: int = 512, codebook_size: int = 1024,
                 n_head: int = 8, n_layers: int = 9,
                 connect_list: Sequence[str] = ('32', '64', '128', '256'),
                 dtype=jnp.bfloat16, face_size: int = 512,
                 batch_buckets: Sequence[int] = (1, 2, 4, 8, 16),
                 rng_seed: int = 0, mesh=None, model=None,
                 quant: Optional[str] = None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the
        face batch is sharded across it (multi-chip serving); buckets are
        rounded up to multiples of the data-axis size.
        `model`: optional pre-built CodeFormer module (custom topology,
        e.g. tiny test configs); overrides the arch kwargs above."""
        setup_jax()  # persistent compilation cache
        if os.environ.get('CODEFORMER_COLPACK'):
            # experimental: stage-resident Pallas conv enclaves for the
            # 512x512 stages (forward-only kernels). Measured in-model at
            # parity-to-slightly-slower vs XLA's fused lowering on v5e
            # (docs/roofline.md "colpack enclaves"), so off by default.
            set_colpack_mode(os.environ['CODEFORMER_COLPACK'])
        if quant is not None:
            # int8 serving path (nn/quant.py): s8xs8->s32 convs on the
            # MXU, dynamic per-tensor act scales. Opt-in, quality-gated
            # by tests/test_int8.py; default bf16.
            set_quant_mode(quant)
        self.face_size = face_size
        self.mesh = mesh
        if mesh is not None:
            n = mesh.shape['data']
            batch_buckets = sorted({max(b // n, 1) * n
                                    for b in batch_buckets} | {n})
        self.batch_buckets = sorted(batch_buckets)
        self.model = model if model is not None else CodeFormer(
            dim_embd=dim_embd, codebook_size=codebook_size, n_head=n_head,
            n_layers=n_layers, connect_list=tuple(connect_list),
            dtype=dtype)
        if checkpoint is not None:
            self.variables = load_checkpoint(checkpoint)
        else:
            self.variables = init_params_fast(
                self.model, jnp.zeros((1, face_size, face_size, 3), dtype),
                0.5, seed=rng_seed)
        self.variables = jax.device_put(self.variables)

        def _fwd(variables, x, w, adain, enable_fuse):
            # x: uint8 RGB (B,H,W,3); normalize/denormalize on device and
            # return uint8 so only 1 byte/px crosses host<->device
            xn = (x.astype(jnp.float32) / 127.5 - 1.0).astype(dtype)
            out, logits, _ = self.model.apply(
                variables, xn, w, adain=adain, enable_fuse=enable_fuse)
            out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
            return jnp.round((out + 1.0) * 127.5).astype(jnp.uint8)

        # unjitted core: the fused device pipeline traces this inside its
        # merged per-chunk graph (pipeline/device_pipeline.py)
        self.fwd_core = _fwd

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._fwd = jax.jit(
                _fwd, static_argnames=('adain', 'enable_fuse'),
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P('data')),
                              NamedSharding(mesh, P())),
                out_shardings=NamedSharding(mesh, P('data')))
            self.variables = jax.device_put(
                self.variables, NamedSharding(mesh, P()))
        else:
            self._fwd = jax.jit(_fwd,
                                static_argnames=('adain', 'enable_fuse'))

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return int(self.batch_buckets[-1] *
                   math.ceil(n / self.batch_buckets[-1]))

    def restore_batch(self, faces_bgr: Sequence[np.ndarray],
                      w: float = 0.5, adain: bool = True,
                      enable_fuse: Optional[bool] = None
                      ) -> List[np.ndarray]:
        """uint8 BGR face crops (face_size^2) -> restored uint8 BGR faces.

        enable_fuse defaults to (w > 0), the reference's structural gate
        (codeformer_arch.py:276). On per-chunk failure the inputs pass
        through unchanged, mirroring the reference's runtime guard
        (inference_codeformer.py:203-211).
        """
        from codeformer_tpu.utils.profiler import stage
        if enable_fuse is None:
            enable_fuse = w > 0
        out: List[np.ndarray] = []
        max_b = self.batch_buckets[-1]
        faces = list(faces_bgr)
        for i in range(0, len(faces), max_b):
            chunk = faces[i:i + max_b]
            try:
                with stage('restore_batch'):
                    out.extend(self._restore_chunk(chunk, w, adain,
                                                   enable_fuse))
            except Exception as error:  # passthrough fallback
                print(f'\tFailed inference for CodeFormer: {error}')
                out.extend(chunk)
        return out

    def restore_device(self, x_rgb_uint8, w: float = 0.5,
                       adain: bool = True,
                       enable_fuse: Optional[bool] = None):
        """Device-resident restoration: (B, face, face, 3) uint8 RGB
        (device or host array; B should be a bucket size) -> uint8 RGB on
        DEVICE. No device->host transfer — the building block of the
        fused frames->frames pipeline (pipeline/device_pipeline.py)."""
        if enable_fuse is None:
            enable_fuse = w > 0
        return self._fwd(self.variables, jnp.asarray(x_rgb_uint8),
                         jnp.float32(w), adain, enable_fuse)

    def _restore_chunk(self, chunk, w, adain, enable_fuse):
        n = len(chunk)
        b = self._bucket(n)
        x = np.zeros((b, self.face_size, self.face_size, 3), np.uint8)
        for j, face in enumerate(chunk):
            assert face.shape[:2] == (self.face_size, self.face_size), \
                f'face {j} has shape {face.shape}, expected {self.face_size}'
            x[j] = face[..., ::-1]  # BGR -> RGB
        y = self._fwd(self.variables, jnp.asarray(x), jnp.float32(w),
                      adain, enable_fuse)
        y = np.asarray(y)[:n]
        return [im[..., ::-1] for im in y]
