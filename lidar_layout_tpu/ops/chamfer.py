"""Chamfer distance (2D/3D) as batched, masked, jit-able JAX.

Replaces the reference CUDA kernels (``lidm/eval/modules/chamfer3D/chamfer3D.cu``,
``chamfer2D.cu``, and the loss copy ``lidm/modules/losses/chamfer/``): the
nearest-neighbor search is a tiled distance computation that XLA maps straight
onto the MXU (one ``x·yᵀ`` matmul per tile pair), with row-chunking to bound
memory for large clouds. Gradients come free via autodiff (the CUDA backward
is replaced by jax.grad through the min).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BIG = 1e10


def _sq_dists(x: Array, y: Array) -> Array:
    """(N, D), (M, D) -> (N, M) squared distances via the matmul identity.

    precision=HIGHEST: TPU default matmul precision is bf16-class, which is
    visible error on small squared distances (the metric regime).
    """
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def nn_dist_one_way(x: Array, y: Array, y_mask: Optional[Array] = None,
                    chunk: int = 4096) -> Array:
    """Per-point squared distance from each x to its nearest y. (N,) out.

    Row-chunked so the (chunk, M) distance tile stays on-chip; masked y rows
    are pushed to +BIG so padding never wins.
    """
    n = x.shape[0]
    if n <= chunk:
        # single tile: no scan, no padding (padding to a full 4096-row
        # chunk made small-cloud metric calls up to 64x more work and a
        # much bigger program to compile)
        d = _sq_dists(x, y)
        if y_mask is not None:
            d = jnp.where(y_mask[None, :], d, BIG)
        return jnp.min(d, axis=-1)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xs = xp.reshape(-1, chunk, x.shape[-1])

    def body(carry, xt):
        d = _sq_dists(xt, y)
        if y_mask is not None:
            d = jnp.where(y_mask[None, :], d, BIG)
        return carry, jnp.min(d, axis=-1)

    _, mins = jax.lax.scan(body, 0, xs)
    return mins.reshape(-1)[:n]


def chamfer_distance(x: Array, y: Array,
                     x_mask: Optional[Array] = None,
                     y_mask: Optional[Array] = None,
                     chunk: int = 4096) -> Tuple[Array, Array]:
    """Bidirectional squared chamfer: (dist_x (N,), dist_y (M,)).

    Semantics match chamfer_3DDist: dist1[i] = min_j ||x_i - y_j||^2 (squared!).
    Masked x rows return 0 (exclude them from your mean with the mask).
    """
    d_x = nn_dist_one_way(x, y, y_mask, chunk)
    d_y = nn_dist_one_way(y, x, x_mask, chunk)
    if x_mask is not None:
        d_x = jnp.where(x_mask, d_x, 0.0)
    if y_mask is not None:
        d_y = jnp.where(y_mask, d_y, 0.0)
    return d_x, d_y


def _masked_mean(d: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return d.mean()
    m = mask.astype(d.dtype)
    return (d * m).sum() / jnp.maximum(m.sum(), 1.0)


def pairwise_cd(x: Array, y: Array, x_mask: Optional[Array] = None,
                y_mask: Optional[Array] = None) -> Array:
    """Scalar CD as the eval toolbox defines it (metric_utils.py:415-421):
    (mean_i d1 + mean_j d2) / 2, squared distances."""
    d_x, d_y = chamfer_distance(x, y, x_mask, y_mask)
    return (_masked_mean(d_x, x_mask) + _masked_mean(d_y, y_mask)) / 2.0


@partial(jax.jit, static_argnames=("chunk",))
def batch_chamfer(xs: Array, ys: Array, x_masks: Optional[Array] = None,
                  y_masks: Optional[Array] = None, chunk: int = 4096) -> Array:
    """(B, N, D) vs (B, M, D) -> (B,) scalar CDs (vmapped)."""
    def one(x, y, xm, ym):
        return pairwise_cd(x, y, xm, ym)
    if x_masks is None:
        return jax.vmap(lambda x, y: pairwise_cd(x, y))(xs, ys)
    return jax.vmap(one)(xs, ys, x_masks, y_masks)


def chamfer_loss(x: Array, y: Array) -> Array:
    """Differentiable symmetric chamfer loss used by forward_s2
    (vqperceptual.py:226-231): dist1.mean() + dist2.mean()."""
    d_x, d_y = chamfer_distance(x, y)
    return d_x.mean() + d_y.mean()
