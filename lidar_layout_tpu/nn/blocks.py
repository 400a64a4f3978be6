"""Backbone blocks for the range-image autoencoder (lidm encoder/decoder family).

Behavioral parity: ``lidm/modules/diffusion/model_lidm.py`` — asymmetric-stride
ResNet blocks with circular convs, bilinear(align_corners)+conv upsampling,
strided-conv downsampling, and single-head spatial self-attention.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conv import CircularConv, Conv1x1

Array = jax.Array

# stride-specific kernels/pads, from model_lidm.py:44-45 (upsample) and :64-65
# (downsample); pad tuples are (left, right, top, bottom)
UPSAMPLE_KERNEL = {(1, 2): (1, 5), (1, 4): (1, 7), (2, 1): (5, 1), (2, 2): (3, 3)}
UPSAMPLE_PAD = {(1, 2): (2, 2, 0, 0), (1, 4): (3, 3, 0, 0), (2, 1): (0, 0, 2, 2), (2, 2): (1, 1, 1, 1)}
DOWNSAMPLE_KERNEL = {(1, 2): (3, 3), (1, 4): (3, 5), (2, 1): (3, 3), (2, 2): (3, 3)}
DOWNSAMPLE_PAD = {(1, 2): (0, 1, 1, 1), (1, 4): (1, 1, 1, 1), (2, 1): (1, 1, 1, 1), (2, 2): (0, 1, 0, 1)}
# uniform kernel -> pad for ResnetBlock convs (model_lidm.py:85)
KERNEL_PAD = {(3, 3): (1, 1, 1, 1), (1, 4): (1, 2, 0, 0)}


def nonlinearity(x: Array) -> Array:
    return jax.nn.silu(x)


class _GNParams(nn.Module):
    """Scale/bias holder named ``GroupNorm_0`` so the param tree (and the
    torch converters keyed on ``.../GroupNorm_0/scale``) is identical to the
    previous ``nn.GroupNorm`` child."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class Normalize(nn.Module):
    """GroupNorm(32, eps=1e-6), computed in fp32 regardless of activation dtype.

    ``act=True`` fuses the SiLU that follows every norm in the ResNet blocks.
    On TPU the qualifying shapes run through the VMEM-resident Pallas kernel
    (ops/pallas_groupnorm) — one bf16 HBM read + write instead of the XLA
    f32-cast round trips; elsewhere the plain XLA path with identical math.
    """

    num_groups: int = 32
    act: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.pallas_groupnorm import group_norm
        c = x.shape[-1]
        g = min(self.num_groups, c)
        while c % g:  # largest divisor of C not exceeding num_groups
            g -= 1
        scale, bias = _GNParams(c, name="GroupNorm_0")()
        return group_norm(x, scale, bias, num_groups=g, eps=1e-6,
                          act=self.act)


def resize_align_corners(x: Array, scale: Tuple[int, int]) -> Array:
    """Bilinear upsample with align_corners=True semantics (torch interpolate parity).

    Implemented as two constant interpolation matmuls (H then W) so the whole op
    lowers to MXU matrix products instead of gathers.
    """
    def interp_matrix(n_in: int, n_out: int) -> np.ndarray:
        if n_out == n_in:
            return np.eye(n_in, dtype=np.float32)
        if n_in == 1:
            return np.ones((n_out, 1), dtype=np.float32)
        src = np.linspace(0.0, n_in - 1.0, n_out)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), dtype=np.float32)
        m[np.arange(n_out), lo] += 1.0 - frac
        m[np.arange(n_out), hi] += frac
        return m

    b, h, w, c = x.shape
    sh, sw = scale
    if sh != 1:
        mh = jnp.asarray(interp_matrix(h, h * sh), dtype=x.dtype)
        x = jnp.einsum("oh,bhwc->bowc", mh, x)
    if sw != 1:
        mw = jnp.asarray(interp_matrix(w, w * sw), dtype=x.dtype)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


class Upsample(nn.Module):
    """Bilinear(align_corners) x stride, then stride-specific circular conv."""

    stride: Tuple[int, int]
    with_conv: bool = True
    wrap: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = resize_align_corners(x, self.stride)
        if self.with_conv:
            k = UPSAMPLE_KERNEL[self.stride]
            p = UPSAMPLE_PAD[self.stride]
            x = CircularConv(x.shape[-1], k, (1, 1), p, wrap=self.wrap,
                             dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Strided circular conv (or average pool) with stride-specific kernel/pad."""

    stride: Tuple[int, int]
    with_conv: bool = True
    wrap: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.with_conv:
            k = DOWNSAMPLE_KERNEL[self.stride]
            p = DOWNSAMPLE_PAD[self.stride]
            return CircularConv(x.shape[-1], k, self.stride, p, wrap=self.wrap,
                                dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, self.stride, strides=self.stride)


class ResnetBlock(nn.Module):
    """norm-swish-cconv x2 with optional timestep projection (model_lidm.py:88-147)."""

    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int] = (3, 3)
    conv_shortcut: bool = False
    dropout: float = 0.0
    wrap: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        out_ch = self.out_channels or x.shape[-1]
        pad = KERNEL_PAD[self.kernel_size]

        h = Normalize(act=True, name="norm1")(x)
        h = CircularConv(out_ch, self.kernel_size, (1, 1), pad, wrap=self.wrap,
                         dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            h = h + nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(
                nonlinearity(temb))[:, None, None, :]

        h = Normalize(act=True, name="norm2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = CircularConv(out_ch, self.kernel_size, (1, 1), pad, wrap=self.wrap,
                         dtype=self.dtype, name="conv2")(h)

        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = CircularConv(out_ch, self.kernel_size, (1, 1), pad,
                                 wrap=self.wrap,
                                 dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = Conv1x1(out_ch, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over H*W positions (model_lidm.py:157-208)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = Normalize(name="norm")(x)
        q = Conv1x1(c, dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = Conv1x1(c, dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = Conv1x1(c, dtype=self.dtype, name="v")(y).reshape(b, h * w, c)

        attn = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = attn.reshape(b, h, w, c)
        out = Conv1x1(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class LinearAttnBlock(nn.Module):
    """Linear attention variant (attention.py:80, heads=1)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        qkv = Conv1x1(3 * c, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=1)
        context = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bde,bnd->bne", context, q).reshape(b, h, w, c)
        out = Conv1x1(c, dtype=self.dtype, name="to_out")(out)
        return x + out


def make_attn(attn_type: str = "vanilla", dtype=jnp.float32, name=None):
    if attn_type == "vanilla":
        return AttnBlock(dtype=dtype, name=name)
    if attn_type == "linear":
        return LinearAttnBlock(dtype=dtype, name=name)
    if attn_type == "none":
        return lambda x: x
    raise ValueError(f"unknown attn_type {attn_type}")
