"""Differentiable range-image geometry for losses.

Parity: ``lidm/modules/losses/geometric.py`` GeoConverter — batch range->xyz/BEV
with precomputed angle grids, normal-from-depth, curve-wise average-pool
compression. NHWC layout; the angle grids are folded as XLA constants.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lidar import LidarGeometry

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GeoConverter:
    """Functional equivalent of the reference GeoConverter module."""

    geom: LidarGeometry
    curve_length: int = 4
    bev_only: bool = False

    def _trig(self, dtype):
        yaw, pitch = self.geom.angle_grids()
        return (jnp.asarray(np.cos(yaw), dtype), jnp.asarray(np.sin(yaw), dtype),
                jnp.asarray(np.cos(pitch), dtype), jnp.asarray(np.sin(pitch), dtype))

    def rescale_depth(self, imgs01: Array) -> Array:
        """[0,1]-scaled image -> metric depth, clamped (geometric.py:53-58)."""
        d = imgs01 * self.geom.depth_scale
        if self.geom.log_scale:
            d = jnp.exp2(d) - 1.0
        return jnp.clip(d, self.geom.depth_range[0], self.geom.depth_range[1])

    def range2xyz(self, imgs01: Array) -> Array:
        """(B, H, W, 1) in [0,1] -> (B, H, W, 3) xyz."""
        cos_yaw, sin_yaw, cos_pitch, sin_pitch = self._trig(imgs01.dtype)
        depth = self.rescale_depth(imgs01)[..., 0]
        x = cos_yaw * cos_pitch * depth
        y = -sin_yaw * cos_pitch * depth
        z = sin_pitch * depth
        return jnp.stack([x, y, z], axis=-1)

    def range2bev(self, imgs01: Array) -> Array:
        return self.range2xyz(imgs01)[..., :2]

    def range2normal(self, coord: Array) -> Array:
        """(B, H, W, 3) xyz -> (B, H, W, 3) normals, zero border
        (geometric.py:72-78: central differences + normalized cross product)."""
        dx = coord[:, 2:, 1:-1, :] - coord[:, :-2, 1:-1, :]
        dy = coord[:, 1:-1, 2:, :] - coord[:, 1:-1, :-2, :]
        n = jnp.cross(dx, dy)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return jnp.pad(n, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def curve_compress(self, coord: Array) -> Array:
        """(1, curve_length) average pooling along the scan line (geometric.py:80-83)."""
        if self.curve_length <= 1:
            return coord
        return nn.avg_pool(coord, (1, self.curve_length), strides=(1, self.curve_length))

    def __call__(self, imgs: Array) -> Array:
        """Model-space [-1,1] (B, H, W, 1) -> compressed coords (geometric.py:85-92)."""
        imgs01 = imgs * 0.5 + 0.5
        coord = self.range2bev(imgs01) if self.bev_only else self.range2xyz(imgs01)
        return self.curve_compress(coord)

    def depth_from_model(self, imgs: Array) -> Array:
        """Model-space [-1,1] -> metric depth (used by smoothness loss)."""
        return self.rescale_depth(imgs * 0.5 + 0.5)


def square_dist_loss(x: Array, y: Array) -> Array:
    """sum over coord channel of squared distance (losses/__init__.py)."""
    return jnp.sum((x - y) ** 2, axis=-1, keepdims=True)


def smoothness_loss(pred_depth: Array, gt_depth: Array, grad_clip: float = 0.01) -> Array:
    """Masked first-difference L1 on metric depth (vqperceptual.py:116-137).

    Only pixels whose GT gradient magnitude is below ``grad_clip`` and whose both
    neighbors have returns contribute.
    """
    p, g = pred_depth[..., 0], gt_depth[..., 0]

    gx = g[:, :, :-1] - g[:, :, 1:]
    gy = g[:, :-1, :] - g[:, 1:, :]
    mx = (g[:, :, :-1] > 0) & (g[:, :, 1:] > 0) & (jnp.abs(gx) < grad_clip)
    my = (g[:, :-1, :] > 0) & (g[:, 1:, :] > 0) & (jnp.abs(gy) < grad_clip)
    px = p[:, :, :-1] - p[:, :, 1:]
    py = p[:, :-1, :] - p[:, 1:, :]

    lx = jnp.sum(jnp.abs(px - gx) * mx) / jnp.maximum(jnp.sum(mx), 1.0)
    ly = jnp.sum(jnp.abs(py - gy) * my) / jnp.maximum(jnp.sum(my), 1.0)
    return lx + ly


def normal_consistency_loss(geo: GeoConverter, input_coord: Array,
                            rec_coord: Array) -> Array:
    """1 - <n_gt, n_pred> averaged over the interior (vqperceptual.py:139-146)."""
    n_gt = geo.range2normal(input_coord)
    n_pred = geo.range2normal(rec_coord)
    dot = jnp.sum(n_gt * n_pred, axis=-1)
    return jnp.mean(1.0 - dot[:, 1:-1, 1:-1])
