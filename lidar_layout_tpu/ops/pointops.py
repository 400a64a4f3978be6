"""Point-cloud operators: FPS, kNN, ball query, grouping, 3-NN interpolation.

Replaces the reference CUDA libraries (SURVEY.md §2.8 N7-N9):
``pointcept/libs/pointops`` (sampling/query/grouping/interpolation) and the
``lidm/ops/chamferdist`` KNN. All fixed-shape, masked, jit/vmap-composable:
distance tiles ride the MXU (same expansion as ops.chamfer), FPS is a
``lax.fori_loop`` over the running min-distance field.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BIG = 1e10


def _sq_dists(x: Array, y: Array) -> Array:
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    # HIGHEST: TPU default matmul precision is bf16-class — visible on small d^2
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(points: Array, n_samples: int,
                          mask: Optional[Array] = None) -> Array:
    """(N, 3) -> (n_samples,) indices via iterative FPS (pointops furthestsampling)."""
    n = points.shape[0]
    valid = mask if mask is not None else jnp.ones((n,), bool)
    dist = jnp.where(valid, BIG, -1.0)  # invalid points can never be selected
    first = jnp.argmax(valid)           # first valid point

    def body(i, state):
        dist, idx, last = state
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(dist)
        idx = idx.at[i].set(nxt)
        return dist, idx, nxt

    idx0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    dist, idx, _ = jax.lax.fori_loop(
        1, n_samples, body, (dist, idx0, first.astype(jnp.int32)))
    return idx


@partial(jax.jit, static_argnames=("k",))
def knn_query(query: Array, points: Array, k: int,
              points_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """(M, 3) queries vs (N, 3) points -> (M, k) indices + squared distances
    (pointops knnquery / chamferdist knn)."""
    d = _sq_dists(query, points)
    if points_mask is not None:
        d = jnp.where(points_mask[None, :], d, BIG)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d


@partial(jax.jit, static_argnames=("k",))
def ball_query(query: Array, points: Array, radius: float, k: int,
               points_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """Up to k neighbors within radius; missing slots repeat the nearest
    neighbor (CUDA ballquery semantics). Returns (idx (M,k), valid (M,k))."""
    idx, d2 = knn_query(query, points, k, points_mask)
    inside = d2 <= radius * radius
    fallback = idx[:, 0:1]
    idx = jnp.where(inside, idx, fallback)
    return idx, inside


def group_points(points: Array, feats: Optional[Array], idx: Array,
                 centers: Array) -> Array:
    """Gather + center neighborhoods (pointops grouping): (M, k, 3[+C])."""
    grouped = points[idx] - centers[:, None, :]
    if feats is not None:
        grouped = jnp.concatenate([grouped, feats[idx]], axis=-1)
    return grouped


@partial(jax.jit, static_argnames=())
def three_nn_interpolate(query: Array, points: Array, feats: Array,
                         points_mask: Optional[Array] = None) -> Array:
    """Inverse-distance-weighted 3-NN feature interpolation
    (pointops interpolation). k clamps to the source count for tiny
    (capacity < 3) coarse levels."""
    idx, d2 = knn_query(query, points, min(3, points.shape[0]), points_mask)
    w = 1.0 / jnp.maximum(d2, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("mk,mkc->mc", w, feats[idx])


def subtraction(query_feats: Array, neighbor_feats: Array) -> Array:
    """Vector-attention subtraction op (pointops2): (M, C) - (M, k, C)."""
    return query_feats[:, None, :] - neighbor_feats


def aggregation(values: Array, weights: Array) -> Array:
    """Weighted neighborhood aggregation: (M, k, C) x (M, k, C|1) -> (M, C)."""
    return jnp.sum(values * weights, axis=1)
