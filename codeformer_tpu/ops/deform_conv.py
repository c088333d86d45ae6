"""Modulated deformable convolution (DCNv2) — TPU-native.

Equivalent of the reference CUDA extension (basicsr/ops/dcn/src/
deform_conv_cuda_kernel.cu: im2col with bilinearly-sampled offsets + mask,
then matmul). TPU design: the bilinear sampling is a batched gather on the
VPU producing the deformable im2col tensor, the contraction is one
dot_general on the MXU, and JAX autodiff through the gather/interp gives the
exact backward (the hand-written col2im kernels of the CUDA version).
Used by DCNv2Pack (basicsr/archs/arch_util.py:209-237) for EDVR-style
alignment modules — not on the CodeFormer path, provided for framework
parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def modulated_deform_conv2d(x: jax.Array, offset: jax.Array,
                            mask: jax.Array, weight: jax.Array,
                            bias: jax.Array | None = None,
                            stride: int = 1, padding: int = 1,
                            dilation: int = 1,
                            groups: int = 1) -> jax.Array:
    """NHWC modulated deformable conv.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2*kh*kw) ordered like torchvision
    (per-tap [dy, dx] pairs, tap-major); mask: (B, Ho, Wo, kh*kw);
    weight: (kh, kw, Cin/groups, Cout); bias: (Cout,).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    n_taps = kh * kw

    # base sampling grid per output position and tap
    ys = jnp.arange(ho) * stride - padding
    xs = jnp.arange(wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # ho,1,kh,1
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # 1,wo,1,kw
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo,
                                                                n_taps)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo,
                                                                n_taps)

    off = offset.reshape(b, ho, wo, n_taps, 2)
    py = base_y[None] + off[..., 0]
    px = base_x[None] + off[..., 1]

    # bilinear sample: (B, Ho, Wo, taps, Cin)
    def sample(img, yy, xx):
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = (yy - y0)[..., None]
        wx = (xx - x0)[..., None]
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        def gather(yi, xi):
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            return jnp.where(valid, img[yc, xc], 0.0)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                + (v10 * (1 - wx) + v11 * wx) * wy)

    cols = jax.vmap(sample)(x.astype(jnp.float32), py, px)
    cols = cols * mask.reshape(b, ho, wo, n_taps, 1)

    # contraction on the MXU: (B,Ho,Wo,taps,Cin) x (taps,Cin,Cout)
    wmat = weight.astype(jnp.float32).reshape(kh * kw, cin_g, cout)
    if groups == 1:
        out = jnp.einsum('bhwtc,tco->bhwo', cols, wmat,
                         preferred_element_type=jnp.float32)
    else:
        cols_g = cols.reshape(b, ho, wo, n_taps, groups, cin_g)
        wmat_g = wmat.reshape(n_taps, groups, cin_g, cout // groups)
        out = jnp.einsum('bhwtgc,tgco->bhwgo', cols_g, wmat_g,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d(x, offset, weight, bias=None, stride=1, padding=1,
                  dilation=1, groups=1):
    """Unmodulated DCNv1: mask of ones."""
    b, h, w, _ = x.shape
    kh, kw = weight.shape[:2]
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    mask = jnp.ones((b, ho, wo, kh * kw), x.dtype)
    return modulated_deform_conv2d(x, offset, mask, weight, bias, stride,
                                   padding, dilation, groups)
