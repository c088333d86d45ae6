"""codeformer_tpu — TPU-native blind face restoration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sczhou/CodeFormer (NeurIPS 2022): VQGAN autoencoder + codebook-lookup
Transformer with controllable feature transformation, plus the full
whole-image/video pipeline (detection, alignment, parsing, paste-back)
and the 3-stage training framework.

Design stance (not a port):
  * NHWC layouts everywhere, flax.linen functional modules.
  * Single jit-compiled restoration graph per config; faces/frames are
    batched through it instead of Python loops.
  * Data/tensor parallelism via jax.sharding.Mesh + NamedSharding,
    collectives inserted by XLA (no NCCL-style process groups).
  * Pallas kernels for the hot ops (codebook argmin-L2 quantizer, ...).
"""

__version__ = "0.1.0"
