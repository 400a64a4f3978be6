"""Patched (fold/unfold) inference for inputs larger than the training size.

Parity: the reference's ``split_input_params`` path (ddpm.py:608-658, 727-764,
911-992): encode/decode/U-Net applied on overlapping crops, stitched back with
border-weighted averaging. The azimuth axis wraps, so patches taken past the
right edge continue from the left (circular unfold) — this is the framework's
"long-context" mechanism (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _weight_kernel(ph: int, pw: int, clip_min: float = 0.01) -> np.ndarray:
    """Border-decay weighting (the reference's delta_border/weighting)."""
    wy = np.minimum(np.arange(ph) + 1, np.arange(ph)[::-1] + 1) / (ph / 2)
    wx = np.minimum(np.arange(pw) + 1, np.arange(pw)[::-1] + 1) / (pw / 2)
    w = np.clip(np.outer(wy, wx), clip_min, 1.0)
    return w.astype(np.float32)


def unfold_patches(x: Array, patch: Tuple[int, int], stride: Tuple[int, int]
                   ) -> Tuple[Array, list]:
    """(B, H, W, C) -> (B, n_patches, ph, pw, C), circular along W."""
    b, h, w, c = x.shape
    ph, pw = patch
    sh, sw = stride
    ys = list(range(0, max(h - ph, 0) + 1, sh)) or [0]
    if ys[-1] != h - ph:
        ys.append(h - ph)
    xs = list(range(0, w, sw))
    # pad W circularly so the last patches wrap
    xpad = jnp.concatenate([x, x[:, :, :pw]], axis=2)

    tiles = []
    coords = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(jax.lax.dynamic_slice(
                xpad, (0, y0, x0, 0), (b, ph, pw, c)))
            coords.append((y0, x0))
    return jnp.stack(tiles, axis=1), coords


def fold_patches(tiles: Array, coords: list, out_shape: Tuple[int, int, int, int]
                 ) -> Array:
    """Weighted overlap-add back onto the (wrapped) canvas."""
    b, h, w, c = out_shape
    ph, pw = tiles.shape[2], tiles.shape[3]
    wgt = jnp.asarray(_weight_kernel(ph, pw))[None, :, :, None]

    acc = jnp.zeros((b, h, w + pw, c))
    den = jnp.zeros((b, h, w + pw, 1))
    for i, (y0, x0) in enumerate(coords):
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, y0, x0, 0), (b, ph, pw, c))
            + tiles[:, i] * wgt, (0, y0, x0, 0))
        den = jax.lax.dynamic_update_slice(
            den, jax.lax.dynamic_slice(den, (0, y0, x0, 0), (b, ph, pw, 1))
            + wgt, (0, y0, x0, 0))
    # fold the wrapped strip back onto the left edge
    acc = acc.at[:, :, :pw].add(acc[:, :, w:])
    den = den.at[:, :, :pw].add(den[:, :, w:])
    return acc[:, :, :w] / jnp.maximum(den[:, :, :w], 1e-8)


def patched_apply(fn: Callable[[Array], Array], x: Array,
                  patch: Tuple[int, int], stride: Tuple[int, int]) -> Array:
    """Apply ``fn`` (shape-preserving, e.g. a U-Net eval) patch-wise."""
    tiles, coords = unfold_patches(x, patch, stride)
    outs = jax.vmap(fn, in_axes=1, out_axes=1)(tiles)
    return fold_patches(outs, coords, x.shape[:3] + (outs.shape[-1],))


def patched_apply_scaled(fn: Callable[[Array], Array], x: Array,
                         patch: Tuple[int, int], stride: Tuple[int, int],
                         scale: Tuple[float, float] = (1.0, 1.0)) -> Array:
    """Patch-wise apply for resolution-changing ``fn`` (VQ encode/decode).

    The reference's patch_distributed_vq path (ddpm.py:727-786, 838-872):
    unfold at image resolution, run the first stage on each crop, fold the
    (rescaled) outputs on a canvas ``scale`` times the input's spatial size.
    ``scale`` is 1/vqf for encode and vqf for decode.
    """
    b, h, w, _ = x.shape
    sh, sw = scale
    tiles, coords = unfold_patches(x, patch, stride)
    outs = jax.vmap(fn, in_axes=1, out_axes=1)(tiles)
    oh, ow = int(round(h * sh)), int(round(w * sw))
    ocoords = [(int(round(y0 * sh)), int(round(x0 * sw))) for y0, x0 in coords]
    return fold_patches(outs, ocoords, (b, oh, ow, outs.shape[-1]))
