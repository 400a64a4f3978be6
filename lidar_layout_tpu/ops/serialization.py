"""Space-filling-curve codes (Morton/z-order and Hilbert) for point serialization.

Parity: ``pointcept/models/utils/serialization/`` (z_order.py, hilbert.py) —
the orders PT-v3 uses: 'z', 'z-trans' (swap x/y), 'hilbert', 'hilbert-trans'.

Pure bit-twiddling, int32 throughout (JAX x64 is off by default): up to 10 bits
per axis -> 30-bit codes. At PT-v3's 0.05 m grid that covers a 51 m cube per
level; LiDAR scenes larger than that coarsen the grid or clip (the curves only
drive *locality ordering*, so clipping the far tail is benign).
The Hilbert code follows Skilling's transpose algorithm (public-domain method).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_BITS = 10


def part1by2_32(x: Array) -> Array:
    """Spread the low 10 bits of int32 x with 2 zeros between each bit."""
    x = x.astype(jnp.int32) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def z_order_code(grid: Array, bits: int = MAX_BITS) -> Array:
    """(N, 3) non-negative grid coords -> (N,) Morton codes (int32).

    Bit layout matches pointcept's z_order (x in the HIGHEST bit of each
    triplet: ``(x&m)<<(2i+2) | (y&m)<<(2i+1) | (z&m)<<2i``, z_order.py) so
    PT-v3 patch groupings agree with converted reference checkpoints:
    code = z | y<<1 | x<<2 interleaved. ``bits`` <= 10.
    """
    assert bits <= MAX_BITS
    g = jnp.clip(grid, 0, (1 << bits) - 1)
    x, y, z = g[:, 0], g[:, 1], g[:, 2]
    return (part1by2_32(z) | (part1by2_32(y) << 1) | (part1by2_32(x) << 2))


def hilbert_code(grid: Array, bits: int = MAX_BITS) -> Array:
    """(N, 3) grid coords -> (N,) Hilbert indices via Skilling transpose."""
    assert bits <= MAX_BITS
    n_dims = 3
    g = jnp.clip(grid, 0, (1 << bits) - 1)
    X = [g[:, i].astype(jnp.int32) for i in range(n_dims)]

    m = 1 << (bits - 1)  # python int: bits is static

    # Axes -> transposed Hilbert (Skilling: inverse undo, then Gray encode)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n_dims):
            cond = (X[i] & q) > 0
            x0_flip = X[0] ^ p
            t = (X[0] ^ X[i]) & p
            x0_exch = X[0] ^ t
            xi_exch = X[i] ^ t
            new_x0 = jnp.where(cond, x0_flip, x0_exch)
            if i != 0:
                X[i] = jnp.where(cond, X[i], xi_exch)
            X[0] = new_x0
        q >>= 1

    for i in range(1, n_dims):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    q = m
    while q > 1:
        t = jnp.where((X[n_dims - 1] & q) > 0, t ^ (q - 1), t)
        q >>= 1
    for i in range(n_dims):
        X[i] = X[i] ^ t

    # interleave transposed bits (X[0] carries the MSBs)
    code = jnp.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(n_dims):
            code = (code << 1) | ((X[i] >> b) & 1)
    return code


ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def serialize_code(grid: Array, order: str, bits: int = MAX_BITS) -> Array:
    """Dispatch over PT-v3's four orders; '-trans' swaps x and y first."""
    if order.endswith("-trans"):
        grid = grid[:, jnp.asarray([1, 0, 2])]
        order = order[: -len("-trans")]
    if order == "z":
        return z_order_code(grid, bits)
    if order == "hilbert":
        return hilbert_code(grid, bits)
    raise ValueError(order)


def grid_coords(points: Array, grid_size: float, origin: Array = None) -> Array:
    """Points -> non-negative integer grid coords."""
    if origin is None:
        origin = jnp.min(points, axis=0, keepdims=True)
    return jnp.floor((points - origin) / grid_size).astype(jnp.int32)


def argsort_with_mask(codes: Array, mask: Array) -> Array:
    """Sort order that pushes padding (mask=False) to the end."""
    big = jnp.iinfo(jnp.int32).max
    keyed = jnp.where(mask, codes, big)
    return jnp.argsort(keyed)
