"""Connected-component clustering over sparse voxels (pointgroup_ops N10).

Replaces ``pointcept/libs/pointgroup_ops`` (ballooned BFS clustering for
instance segmentation): iterative min-label propagation over the 27-stencil of
a fixed-capacity voxel grid — each ``lax.while_loop`` sweep halves the label
diameter, so it converges in O(log(diameter)) fully-vectorized rounds.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .voxel import OFFSETS_27, VoxelGrid, build_grid, lookup

Array = jax.Array


@partial(jax.jit, static_argnames=("bits", "max_iters"))
def voxel_connected_components(grid: VoxelGrid, bits: int = 10,
                               max_iters: int = 64) -> Array:
    """(cap,) component label per voxel (padding rows get label = capacity)."""
    cap = grid.coords.shape[0]
    labels0 = jnp.where(grid.mask, jnp.arange(cap), cap).astype(jnp.int32)

    # precompute neighbor indices once
    def one_offset(off):
        idx, hit = lookup(grid, grid.coords + off[None, :], bits)
        return jnp.where(hit, idx, cap)

    nbrs = jax.vmap(one_offset)(OFFSETS_27).T  # (cap, 27)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        padded = jnp.concatenate([labels, jnp.asarray([cap], jnp.int32)])
        nb_labels = padded[nbrs]                 # (cap, 27)
        new = jnp.minimum(labels, nb_labels.min(axis=1))
        new = jnp.where(grid.mask, new, cap)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body,
                                      (labels0, jnp.asarray(True), 0))
    return labels


def cluster_points(points: Array, mask: Array, voxel_size: float = 0.3,
                   capacity: int = 8192, bits: int = 10
                   ) -> Tuple[Array, Array]:
    """Point-level clustering: voxelize then propagate labels.

    Returns (per-point component labels (N,), per-voxel labels (capacity,)).
    Padding/invalid points get label = capacity.
    """
    origin = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    g = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    g = jnp.clip(g, 0, (1 << bits) - 1)
    grid, p2v = build_grid(g, mask, capacity, bits)
    vlabels = voxel_connected_components(grid, bits)
    plabels = jnp.where(mask, vlabels[p2v], capacity)
    return plabels, vlabels
