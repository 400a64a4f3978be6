"""Gaussian-surfel dense decoder: point features -> surfels -> rendered range.

Parity: ``pointcept/models/gaussians/gaussians_model.py:11`` GSDecoder —
per-point MLPs emit n_offsets=6 surfel anchors (sigmoid offsets around the
point), 2D scaling (exp) + quaternion rotation, tanh opacity, sigmoid
color/raydrop; ``models/default.py:96`` DenseDecoderV0 = backbone -> GSDecoder
-> rasterize -> GSLoss (``gaussians_loss.py:5``: range + raydrop supervision).

The CUDA surfel rasterizer is replaced by ``ops.gaussian_raster`` (surfels =
flattened 3D gaussians, min-axis scale epsilon).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.gaussian_raster import RasterConfig, rasterize
from ..ops.lidar import LidarGeometry
from .ptv3 import PTv3, PTv3Config

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GSDecoderConfig:
    feat_dim: int = 64
    n_offsets: int = 6
    hidden: int = 32
    color_channel: int = 2     # [intensity, raydrop]
    offset_scale: float = 1.0  # metres spanned by the sigmoid offset
    min_surfel_scale: float = 1e-3


class GSDecoder(nn.Module):
    cfg: GSDecoderConfig

    @nn.compact
    def __call__(self, coords: Array, feats: Array, mask: Array
                 ) -> Dict[str, Array]:
        """(N, 3) coords + (N, F) feats -> per-surfel gaussian params
        (N * n_offsets rows each)."""
        c = self.cfg
        k = c.n_offsets

        def mlp(out_dim, name, final=None):
            def f(x):
                h = nn.Dense(c.hidden, name=f"{name}_in")(x)
                h = nn.relu(h)
                h = nn.Dense(out_dim, name=f"{name}_out")(h)
                return final(h) if final is not None else h
            return f

        n = coords.shape[0]
        offset = mlp(k * 3, "mlp_offset", jax.nn.sigmoid)(feats)
        opacity = mlp(k, "mlp_opacity", jnp.tanh)(feats)
        scale_rot = mlp(k * 6, "mlp_cov")(feats)
        color = mlp(k * (c.color_channel - 1), "mlp_color", jax.nn.sigmoid)(feats)
        raydrop = mlp(k, "mlp_raydrop", jax.nn.sigmoid)(feats)

        # anchors around each point (create_from_pcd parity: coord + offset)
        off = (offset.reshape(n, k, 3) - 0.5) * 2.0 * c.offset_scale
        anchors = (coords[:, None, :] + off).reshape(n * k, 3)

        sr = scale_rot.reshape(n, k, 6)
        scales2d = jnp.exp(jnp.clip(sr[..., :2], -6.0, 3.0)).reshape(n * k, 2)
        scales = jnp.concatenate(
            [scales2d, jnp.full((n * k, 1), c.min_surfel_scale)], axis=-1)
        quats = sr[..., 2:].reshape(n * k, 4)
        quats = quats + jnp.asarray([1.0, 0, 0, 0])  # bias toward identity

        surfel_mask = jnp.repeat(mask, k)
        return {
            "means": anchors,
            "scales": scales,
            "quats": quats,
            "opacities": jnp.clip(opacity.reshape(n * k), 0.0, 1.0),
            "color": color.reshape(n * k, c.color_channel - 1),
            "raydrop": raydrop.reshape(n * k),
            "mask": surfel_mask,
        }


def render_surfels(surfels: Dict[str, Array], geom: LidarGeometry,
                   raster_cfg=RasterConfig()) -> Dict[str, Array]:
    """Rasterize decoder surfels -> pred_range / pred_intensity / pred_raydrop.

    ``raster_cfg`` picks the implementation:
      - ``ops.gaussian_raster.SurfelConfig`` — exact ray-disc intersection
        (the reference ``diff_lidargs_surfel_rasterization`` semantics,
        true per-ray depths);
      - ``ops.gaussian_raster_tiled.BandedConfig`` — banded fast path
        (~4x at production scale, flattened-3D approximation);
      - ``RasterConfig`` (default) — dense flattened-3D approximation."""
    feats = jnp.concatenate([surfels["color"],
                             surfels["raydrop"][:, None]], axis=-1)
    from ..ops.gaussian_raster import SurfelConfig, rasterize_surfels
    from ..ops.gaussian_raster_tiled import BandedConfig, rasterize_banded
    if isinstance(raster_cfg, SurfelConfig):
        impl = rasterize_surfels
    elif isinstance(raster_cfg, BandedConfig):
        impl = rasterize_banded
    else:
        impl = rasterize
    out = impl(surfels["means"], surfels["quats"], surfels["scales"],
               surfels["opacities"], feats, geom, mask=surfels["mask"],
               cfg=raster_cfg)
    alpha = jnp.maximum(out["alpha"], 1e-6)
    return {
        "pred_range": out["depth"] / alpha,
        "pred_intensity": out["feature"][..., 0] / alpha,
        "pred_raydrop": out["feature"][..., -1] / alpha,
        "alpha": out["alpha"],
    }


def gs_loss(render: Dict[str, Array], gt_range: Array, gt_mask: Array,
            range_weight: float = 1.0, raydrop_weight: float = 0.1
            ) -> Tuple[Array, Dict[str, Array]]:
    """GSLoss parity (gaussians_loss.py): masked L1 on metric range + BCE-style
    raydrop supervision. gt_mask: True where a real return exists."""
    m = gt_mask.astype(jnp.float32)
    l_range = jnp.sum(jnp.abs(render["pred_range"] - gt_range) * m) \
        / jnp.maximum(m.sum(), 1.0)
    rd = jnp.clip(render["pred_raydrop"], 1e-6, 1 - 1e-6)
    target_drop = 1.0 - m  # raydrop=1 where no return
    l_raydrop = -jnp.mean(target_drop * jnp.log(rd)
                          + (1 - target_drop) * jnp.log(1 - rd))
    loss = range_weight * l_range + raydrop_weight * l_raydrop
    return loss, {"loss": loss, "loss_range": l_range, "loss_raydrop": l_raydrop}


class DenseDecoder(nn.Module):
    """DenseDecoderV0 (models/default.py:96): PT-v3 backbone -> GSDecoder."""

    backbone_cfg: PTv3Config
    gs_cfg: GSDecoderConfig = GSDecoderConfig()

    @nn.compact
    def __call__(self, points: Array, feats: Array, mask: Array
                 ) -> Dict[str, Array]:
        h, _ = PTv3(self.backbone_cfg, name="backbone")(points, feats, mask)
        h = nn.Dense(self.gs_cfg.feat_dim, name="neck")(h)
        return GSDecoder(self.gs_cfg, name="gs_decoder")(points, h, mask)
