"""VQ autoencoder with a Gaussian-splat decoder tower (VQModel_Gaus).

Parity: ``lidm/models/ae/autoencoder_gaus.py:10`` — a VQModel with a SECOND
full decoder (``model_lidm.py:419-566`` Gaus_Decoder) that emits per-pixel
Gaussian parameters: rotation quat (4) + scale (3) + opacity (1) + SH
coefficients (4 channels x 16 coeffs, degree 3 — ``sh_out`` channels
``4*(sh_degree+1)**2``, model_lidm.py:521-530). Gaussians are placed at the
unprojected range-decode (``ae/utils.py range2pcd_gpu``) and re-rendered
through the differentiable rasterizer; the rendered panorama is supervised by
the s2 loss (``vqperceptual.py:217`` forward_s2).

Camera model: the reference splits the panorama into forward/backward 180°
``Camera``s because its CUDA rasterizer only does pinhole frusta
(autoencoder_gaus.py:36-72 build_camera, render_range:90-110 concatenates the
two halves). ``ops.gaussian_raster`` projects spherically over the full 360°
in ONE pass, so the two-camera workaround is unnecessary — the single
panoramic render equals concat(forward 180°, backward 180°) by construction
(seam continuity is covered by tests/test_gaussian_raster.py).

SH payload: each gaussian's view direction is its normalized center (the
sensor sits at the origin), so ``eval_sh`` collapses the view-dependent
(N, 4, 16) coefficients to 4 feature channels [2 aux, intensity, raydrop]
(gaussian_renderer/__init__.py:96 split [2,1,1]).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.geometric import GeoConverter
from ..nn.conv import CircularConv
from ..ops.gaussian_raster import RasterConfig, rasterize
from ..ops.lidar import LidarGeometry, range2xyz
from ..ops.sh import eval_sh
from .autoencoder import AEConfig, Decoder, Encoder, VQModel

Array = jax.Array

SH_DEGREE = 3
SH_CHANNELS = 4  # [aux0, aux1, intensity, raydrop]


class GausParamHead(nn.Module):
    """conv(1,4) -> ReLU -> conv(1,4) head (Gaus_Decoder rot/scale/opacity/
    sh_out, model_lidm.py:484-530)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: Array) -> Array:
        c = h.shape[-1]
        h = CircularConv(c, (1, 4), (1, 1), (1, 2, 0, 0), dtype=self.dtype,
                         name="conv1")(h)
        h = jax.nn.relu(h)
        return CircularConv(self.out_ch, (1, 4), (1, 1), (1, 2, 0, 0),
                            dtype=self.dtype, name="conv2")(h)


class GausDecoder(nn.Module):
    """Full second decoder tower from the quantized latent to per-pixel
    gaussian parameters (Gaus_Decoder, model_lidm.py:419-566)."""

    cfg: AEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, deterministic: bool = True
                 ) -> Dict[str, Array]:
        tower_cfg = dataclasses.replace(self.cfg, give_pre_end=True)
        h = Decoder(tower_cfg, dtype=self.dtype, name="tower")(
            z, deterministic=deterministic)
        # norm_out + nonlinearity as in the torch decoder end
        from ..nn.blocks import Normalize
        h = Normalize(act=True, name="norm_out")(h)

        rot = GausParamHead(4, dtype=self.dtype, name="rot_out")(h)
        rot = rot + jnp.asarray([1.0, 0, 0, 0], rot.dtype)  # identity bias
        scale = GausParamHead(3, dtype=self.dtype, name="scale_out")(h)
        scale = jnp.exp(jnp.clip(scale, -6.0, 2.0))
        opacity = GausParamHead(1, dtype=self.dtype, name="opacity_out")(h)
        opacity = jax.nn.sigmoid(opacity)
        n_coef = (SH_DEGREE + 1) ** 2
        sh = GausParamHead(SH_CHANNELS * n_coef, dtype=self.dtype,
                           name="sh_out")(h)
        b, hh, ww, _ = sh.shape
        return {"rot": rot, "scale": scale, "opacity": opacity[..., 0],
                "sh": sh.reshape(b, hh, ww, SH_CHANNELS, n_coef)}


class VQModelGaus(VQModel):
    """VQModel + second gaussian decoder; ``decode_gaussians`` returns the
    range decode and the splat parameter dict."""

    def setup(self):
        super().setup()
        self.gaus_decoder = GausDecoder(self.cfg, dtype=self.dtype)

    def decode_gaussians(self, quant: Array, deterministic: bool = True
                         ) -> Tuple[Array, Dict[str, Array]]:
        hq = self.post_quant_conv(quant)
        dec = self.decoder(hq, deterministic=deterministic)
        gaus = self.gaus_decoder(hq, deterministic=deterministic)
        return dec, gaus

    def __call__(self, x: Array, deterministic: bool = True):
        """Full forward incl. the gaussian decoder (so init creates params)."""
        quant, diff, ind = self.encode(x, deterministic=deterministic)
        dec, gaus = self.decode_gaussians(quant, deterministic=deterministic)
        return dec, diff, ind, gaus

    def forward_with_prefinal_gaus(self, x: Array, deterministic: bool = True):
        """forward_with_prefinal + the gaussian head (for the s2 loss in the
        two-optimizer trainer; vqperceptual.py:217-273 forward_s2)."""
        quant, diff, ind = self.encode(x, deterministic=deterministic)
        hq = self.post_quant_conv(quant)
        dec, prefinal = self.decoder(hq, deterministic=deterministic,
                                     return_prefinal=True)
        gaus = self.gaus_decoder(hq, deterministic=deterministic)
        return dec, diff, ind, prefinal, gaus


def render_range_from_gaussians(dec_range: Array, gaus: Dict[str, Array],
                                geom: LidarGeometry,
                                raster_cfg: RasterConfig = RasterConfig()
                                ) -> Dict[str, Array]:
    """Place one gaussian per pixel at the unprojected range and re-render the
    panorama in a single spherical pass (render_range, autoencoder_gaus.py:90
    — see module docstring for the dual-camera equivalence)."""

    def one(img, rot, scale, opacity, sh):
        xyz, valid = range2xyz(img[..., 0], geom, from_model_space=True,
                               fill=0.0)
        means = xyz.reshape(-1, 3)
        # view-dependent payload: SH evaluated along each gaussian's bearing
        dirs = means / jnp.maximum(
            jnp.linalg.norm(means, axis=-1, keepdims=True), 1e-6)
        n = means.shape[0]
        feats = eval_sh(SH_DEGREE, sh.reshape(n, SH_CHANNELS, -1), dirs)
        out = rasterize(means, rot.reshape(-1, 4), scale.reshape(-1, 3),
                        opacity.reshape(-1) * valid.reshape(-1),
                        feats, geom, mask=valid.reshape(-1), cfg=raster_cfg)
        alpha = jnp.maximum(out["alpha"], 1e-6)
        return out["depth"] / alpha, out["alpha"], out["feature"] / alpha[..., None]

    rng_img, alpha, feats = jax.vmap(one)(dec_range, gaus["rot"],
                                          gaus["scale"], gaus["opacity"],
                                          gaus["sh"])
    return {"rendered_range": rng_img, "alpha": alpha,
            "rendered_feat": feats,                     # [aux0, aux1, ...]
            "rendered_intensity": feats[..., 2],
            "rendered_raydrop": feats[..., 3]}


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
