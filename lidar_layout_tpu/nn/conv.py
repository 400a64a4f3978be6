"""Curve-wise (circular) convolutions for panoramic range images.

The signature op of the reference (``lidm/modules/basic.py:35-59`` CircularConv2d):
horizontal circular padding for the 360 degree azimuth wrap + vertical zero padding.
Here it is expressed as ``jnp.pad(mode='wrap')`` on the width axis followed by a
VALID convolution, which XLA fuses into a single conv with halo — no copy on TPU.

Layout is NHWC throughout (TPU-native; the MXU consumes the channel dimension).
Padding follows the reference tuple convention ``(left, right, top, bottom)``.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
PadSpec = Union[int, Tuple[int, int, int, int]]


def circular_pad(x: Array, pad: Tuple[int, int, int, int],
                 wrap: bool = True) -> Array:
    """Pad NHWC: wrap on W (azimuth) — or zeros when ``wrap=False`` (the
    model_ldm plain-conv variant) — and zeros on H (elevation)."""
    left, right, top, bottom = pad
    if left or right:
        x = jnp.pad(x, ((0, 0), (0, 0), (left, right), (0, 0)),
                    mode="wrap" if wrap else "constant")
    if top or bottom:
        x = jnp.pad(x, ((0, 0), (top, bottom), (0, 0), (0, 0)), mode="constant")
    return x


def _norm_pad(padding: PadSpec) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        return (padding, padding, padding, padding)
    return tuple(padding)  # type: ignore[return-value]


class CircularConv(nn.Module):
    """2D conv with horizontal circular + vertical constant padding (NHWC).

    ``kernel_size``/``strides`` use (kh, kw) ordering to match the reference's
    torch (H, W) convention, so its stride/kernel tables carry over verbatim.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: PadSpec = 0
    use_bias: bool = True
    wrap: bool = True   # False => plain zero padding (lib_name: ldm variant)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = circular_pad(x, _norm_pad(self.padding), wrap=self.wrap)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class Conv1x1(nn.Module):
    """Pointwise conv (pure channel matmul -> straight onto the MXU)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


def conv_nd(dims: int, features: int, kernel_size, *, cconv: bool = False,
            strides=None, padding: PadSpec = 0, dtype=jnp.float32,
            param_dtype=jnp.float32, name=None):
    """Factory mirroring the reference's ``conv_nd(..., cconv=)`` dispatch
    (basic.py:344-357): circular conv for the lidm backbone, plain conv otherwise."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * dims
    if strides is None:
        strides = (1,) * dims
    elif isinstance(strides, int):
        strides = (strides,) * dims
    if dims == 2 and cconv:
        return CircularConv(features, kernel_size, strides, padding,
                            dtype=dtype, param_dtype=param_dtype, name=name)
    pad = _norm_pad(padding) if dims == 2 else padding
    if dims == 2:
        pad_spec = [(pad[2], pad[3]), (pad[0], pad[1])]  # ((top,bot),(left,right))
    elif isinstance(pad, int):
        pad_spec = [(pad, pad)] * dims
    else:
        pad_spec = pad
    return nn.Conv(features, kernel_size, strides, padding=pad_spec,
                   dtype=dtype, param_dtype=param_dtype, name=name)
