"""Transformer layers for the codebook-lookup predictor — batch-major, TPU-first.

Behavioral spec: reference TransformerSALayer (codeformer_arch.py:99-134) —
pre-LN self-attention where the learned position embedding is added to the
queries and keys only (not values), followed by a GELU MLP. The reference runs
seq-major (S, B, C) through torch.nn.MultiheadAttention; here everything is
batch-major (B, S, C) with one packed QKV projection so XLA keeps the matmuls
large on the MXU. Attention math accumulates in fp32.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiheadSelfAttention(nn.Module):
    """Multi-head self-attention matching torch.nn.MultiheadAttention math.

    Parameters are stored packed exactly like torch's ``in_proj_weight``
    (transposed to (E, 3E) for the row-major x @ W convention) so checkpoint
    conversion is a pure transpose. Query/key inputs may differ from the
    value input (the caller adds positional embeddings to q, k only).
    """
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qk_in: jax.Array, v_in: jax.Array) -> jax.Array:
        e = self.embed_dim
        h = self.num_heads
        d = e // h
        assert d * h == e, 'embed_dim must be divisible by num_heads'
        b, s, _ = qk_in.shape

        w = self.param('in_proj_weight', nn.initializers.xavier_uniform(),
                       (e, 3 * e), jnp.float32)
        bias = self.param('in_proj_bias', nn.initializers.zeros,
                          (3 * e,), jnp.float32)
        w = w.astype(self.dtype)
        bias = bias.astype(self.dtype)

        qk = jnp.dot(qk_in, w[:, :2 * e], preferred_element_type=jnp.float32)
        qk = qk.astype(self.dtype) + bias[:2 * e]
        v = jnp.dot(v_in, w[:, 2 * e:], preferred_element_type=jnp.float32)
        v = v.astype(self.dtype) + bias[2 * e:]

        q, k = qk[..., :e], qk[..., e:]
        q = q.reshape(b, s, h, d) * (d ** -0.5)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)

        attn = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, s, e)
        return nn.Dense(e, dtype=self.dtype, name='out_proj')(out)


class TransformerSALayer(nn.Module):
    """Pre-LN transformer block: LN → MHA(q,k=+pos) → LN → GELU MLP.

    Reference: codeformer_arch.py:99-134 (dropout is 0 in every shipped
    config, so it is omitted). GELU is the exact erf form (torch F.gelu
    default), not the tanh approximation.
    """
    embed_dim: int
    nhead: int = 8
    dim_mlp: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiheadSelfAttention(self.embed_dim, self.nhead,
                                                dtype=self.dtype)
        self.linear1 = nn.Dense(self.dim_mlp, dtype=self.dtype)
        self.linear2 = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, tgt: jax.Array,
                 query_pos: Optional[jax.Array] = None) -> jax.Array:
        # Self-attention with positional embedding on q, k only.
        tgt2 = self.norm1(tgt)
        qk = tgt2 if query_pos is None else tgt2 + query_pos
        tgt = tgt + self.self_attn(qk, tgt2)

        # MLP.
        tgt2 = self.norm2(tgt)
        tgt2 = self.linear2(nn.gelu(self.linear1(tgt2), approximate=False))
        return tgt + tgt2
