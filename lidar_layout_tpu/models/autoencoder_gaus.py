"""VQ autoencoder with a Gaussian-splat decoder head (VQModel_Gaus).

Parity: ``lidm/models/ae/autoencoder_gaus.py:10`` — a VQModel whose decoder
also emits per-pixel Gaussian parameters (rotation quat 4 + scale 3 + opacity 1
+ features; ``model_lidm.py:419-566`` Gaus_Decoder heads), renders panoramic
views through the differentiable rasterizer (render_range :85) and supervises
the rendered range with the s2 loss (``vqperceptual.py:217`` forward_s2:
L1 + chamfer + smoothness + normal consistency).

The CUDA ``diff-gaussian-rasterization-2d`` is replaced by
``ops.gaussian_raster``; gaussian centers come from unprojecting the decoded
range image (``ae/utils.py range2pcd_gpu`` equivalent = ops.lidar.range2xyz).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.geometric import GeoConverter
from ..ops.gaussian_raster import RasterConfig, rasterize
from ..ops.lidar import LidarGeometry, range2xyz
from .autoencoder import AEConfig, Decoder, Encoder, VQModel

Array = jax.Array


class GausHead(nn.Module):
    """Per-pixel Gaussian parameter head on the decoder's pre-final features."""

    @nn.compact
    def __call__(self, h: Array) -> Dict[str, Array]:
        rot = nn.Dense(4, name="rot_head")(h)
        rot = rot + jnp.asarray([1.0, 0, 0, 0])          # bias to identity
        scale = jnp.exp(jnp.clip(nn.Dense(3, name="scale_head")(h), -6.0, 2.0))
        opacity = jax.nn.sigmoid(nn.Dense(1, name="opacity_head")(h))
        feat = jax.nn.sigmoid(nn.Dense(1, name="feat_head")(h))
        return {"rot": rot, "scale": scale, "opacity": opacity[..., 0],
                "feat": feat[..., 0]}


class VQModelGaus(VQModel):
    """VQModel + Gaussian head; ``decode_gaussians`` returns splat params."""

    def setup(self):
        super().setup()
        self.gaus_head = GausHead()

    def decode_gaussians(self, quant: Array, deterministic: bool = True
                         ) -> Tuple[Array, Dict[str, Array]]:
        dec, prefinal = self.decoder(self.post_quant_conv(quant),
                                     deterministic=deterministic,
                                     return_prefinal=True)
        return dec, self.gaus_head(prefinal)

    def __call__(self, x: Array, deterministic: bool = True):
        """Full forward incl. the gaussian head (so init creates its params)."""
        quant, diff, ind = self.encode(x, deterministic=deterministic)
        dec, gaus = self.decode_gaussians(quant, deterministic=deterministic)
        return dec, diff, ind, gaus


def render_range_from_gaussians(dec_range: Array, gaus: Dict[str, Array],
                                geom: LidarGeometry,
                                raster_cfg: RasterConfig = RasterConfig()
                                ) -> Dict[str, Array]:
    """Place one gaussian per pixel at the unprojected range and re-render the
    panorama (autoencoder_gaus.py render_range :85 equivalent)."""
    b = dec_range.shape[0]

    def one(img, rot, scale, opacity, feat):
        xyz, valid = range2xyz(img[..., 0], geom, from_model_space=True,
                               fill=0.0)
        means = xyz.reshape(-1, 3)
        out = rasterize(means, rot.reshape(-1, 4), scale.reshape(-1, 3),
                        opacity.reshape(-1) * valid.reshape(-1),
                        feat.reshape(-1, 1), geom, mask=valid.reshape(-1),
                        cfg=raster_cfg)
        alpha = jnp.maximum(out["alpha"], 1e-6)
        return out["depth"] / alpha, out["alpha"]

    rng_img, alpha = jax.vmap(one)(dec_range, gaus["rot"], gaus["scale"],
                                   gaus["opacity"], gaus["feat"])
    return {"rendered_range": rng_img, "alpha": alpha}


def s2_loss(geo: GeoConverter, inputs: Array, rendered_model: Array,
            smooth_factor: float = 0.1, norm_factor: float = 0.1
            ) -> Tuple[Array, Dict[str, Array]]:
    """forward_s2 parity (vqperceptual.py:217-273): L1 on the rendered range
    (model space) + smoothness + normal consistency. Chamfer omitted when
    chamfer_factor == 0 (the reference default)."""
    from ..losses.geometric import normal_consistency_loss, smoothness_loss

    l1 = jnp.mean(jnp.abs(inputs - rendered_model))
    in_coord = geo(inputs)
    ren_coord = geo(rendered_model)
    gt_d = geo.depth_from_model(inputs)
    pr_d = geo.depth_from_model(rendered_model)
    sm = smoothness_loss(pr_d, gt_d) * smooth_factor
    nc = normal_consistency_loss(geo, in_coord, ren_coord) * norm_factor
    loss = l1 + sm + nc
    return loss, {"s2_l1": l1, "s2_smooth": sm, "s2_normal": nc, "s2_loss": loss}
