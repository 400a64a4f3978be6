"""Pallas TPU kernel: tiled nearest-neighbor (chamfer) distance.

The production path for ``ops/chamfer.py`` on TPU: the (N, M) distance matrix
never materializes in HBM — each grid step streams one x-tile through VMEM,
computes the three-term expansion ||x||^2 + ||y||^2 - 2 x.y^T against one
y-tile with an MXU matmul, and reduces the running min in the output block
across the (innermost) y grid axis.

Masking: invalid y rows are replaced host-side by a far-away sentinel point
(SENTINEL coords), so the kernel needs no mask operand — sub-(8,128) mask
blocks lower incorrectly on some Mosaic versions, and the sentinel distance
(~3e8 m^2) can never win against real returns.

The kernel is forward-only; chamfer *loss* gradients use the XLA version
(ops.chamfer), which autodiffs.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SENTINEL = 1e4   # sentinel coordinate for masked rows: dist^2 ~ 3e8
TILE_X = 256
TILE_Y = 512
LANES = 128      # feature dim padded to a full lane tile: sub-128 blocks read
                 # garbage lanes on the current Mosaic lowering


def _nn_kernel(x_ref, y_ref, out_ref):
    """Grid: (num_x_tiles, num_y_tiles); out[xtile] = running min over y."""
    j = pl.program_id(1)

    x = x_ref[...]          # (TILE_X, LANES) — xyz in cols 0..2, zeros after
    y = y_ref[...]          # (TILE_Y, LANES)

    x2 = jnp.sum(x * x, axis=1, keepdims=True)          # (TX, 1)
    y2 = jnp.sum(y * y, axis=1)[None, :]                # (1, TY)
    # precision=HIGHEST is required: the default in-kernel MXU precision on
    # this toolchain is bf16-class, which corrupts the small |d| differences
    xy = jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    d = x2 + y2 - 2.0 * xy                              # (TX, TY)
    tile_min = jnp.min(d, axis=1, keepdims=True)        # (TX, 1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = tile_min

    @pl.when(j > 0)
    def _():
        out_ref[...] = jnp.minimum(out_ref[...], tile_min)


def _pad_rows(a: Array, mult: int, fill: float) -> Array:
    pad = (-a.shape[0]) % mult
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_dist_pallas(x: Array, y: Array, y_mask: Optional[Array] = None,
                   interpret: bool = False) -> Array:
    """Per-x squared distance to nearest valid y. (N,) out."""
    n = x.shape[0]
    yv = y.astype(jnp.float32)
    if y_mask is not None:
        yv = jnp.where(y_mask[:, None], yv, SENTINEL)

    def pad_lanes(a, fill_row):
        out = jnp.zeros((a.shape[0], LANES), jnp.float32)
        return out.at[:, :3].set(a)

    xp = _pad_rows(pad_lanes(x.astype(jnp.float32), 0.0), TILE_X, 0.0)
    yp = _pad_rows(pad_lanes(yv, SENTINEL), TILE_Y, 0.0)
    # sentinel must survive lane padding: re-mark padded rows in col 0..2
    yp = yp.at[y.shape[0]:, :3].set(SENTINEL)

    nx, ny = xp.shape[0] // TILE_X, yp.shape[0] // TILE_Y
    out = pl.pallas_call(
        _nn_kernel,
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((TILE_X, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Y, LANES), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_X, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * yp.shape[0] * 3,
            bytes_accessed=4 * (xp.size + yp.size * nx + xp.shape[0]),
            transcendentals=0),
        interpret=interpret,
    )(xp, yp)
    return out[:n, 0]


def chamfer_pallas(x: Array, y: Array, x_mask: Optional[Array] = None,
                   y_mask: Optional[Array] = None,
                   interpret: bool = False) -> Tuple[Array, Array]:
    """Bidirectional chamfer via the Pallas kernel (semantics of
    ops.chamfer.chamfer_distance)."""
    d_x = nn_dist_pallas(x, y, y_mask, interpret)
    d_y = nn_dist_pallas(y, x, x_mask, interpret)
    if x_mask is not None:
        d_x = jnp.where(x_mask, d_x, 0.0)
    if y_mask is not None:
        d_y = jnp.where(y_mask, d_y, 0.0)
    return d_x, d_y
