"""Config system: YAML configs with ``target:``/``params:`` instantiation.

Parity: the reference's OmegaConf + ``instantiate_from_config``
(``lidm/utils/misc_utils.py:118-133``) — but resolved through an explicit
registry instead of importlib-by-string, with aliases for the reference's
config target names (including the stale ``lidm.models.autoencoder.*``
paths its shipped YAMLs still carry — SURVEY.md §5 config notes) so published
configs translate mechanically.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

REGISTRY: Dict[str, Callable] = {}


def register(name: str, *aliases: str):
    def deco(fn):
        REGISTRY[name] = fn
        for a in aliases:
            REGISTRY[a] = fn
        return fn
    return deco


def _builders():
    """Lazy-registered builders (imports deferred to avoid cycles)."""
    if REGISTRY:
        return
    import jax.numpy as jnp

    from .models.autoencoder import (AEConfig, AutoencoderKL, VQModel,
                                     VQModelInterface)
    from .models.diffusion import DiffusionConfig, LatentDiffusion
    from .models.layout_diffusion import LayoutDiffusion, LayoutDiffusionConfig
    from .models.unet import UNetConfig, UNetModel
    from .models.unet1d import UNet1DConfig
    from .encoders.modules import (ClassEmbedder, FrozenCLIPTextEmbedder,
                                   FrozenClipMultiImageEmbedder,
                                   FrozenClipMultiTextEmbedder, SpatialRescaler)
    from .losses.vq_loss import VQLossConfig

    def _ae_cfg(dd: Dict[str, Any]) -> AEConfig:
        return AEConfig(
            ch=dd.get("ch", 64), out_ch=dd.get("out_ch", 1),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 2, 4))),
            strides=tuple(tuple(s) for s in dd.get("strides",
                                                   ((1, 2), (2, 2), (2, 2)))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_levels=tuple(dd.get("attn_levels", ())),
            dropout=dd.get("dropout", 0.0),
            in_channels=dd.get("in_channels", 1),
            z_channels=dd.get("z_channels", 8),
            double_z=dd.get("double_z", False))

    def build_vq(params, interface=False, dtype=jnp.float32):
        cls = VQModelInterface if interface else VQModel
        return cls(_ae_cfg(params["ddconfig"]),
                   n_embed=params.get("n_embed", 16384),
                   embed_dim=params.get("embed_dim", 8),
                   use_mask=params.get("use_mask", False), dtype=dtype)

    register("vq_model", "lidm.models.autoencoder.VQModel",
             "lidm.models.ae.autoencoder.VQModel")(
        lambda params, **kw: build_vq(params, interface=False, **kw))
    register("vq_model_interface", "lidm.models.autoencoder.VQModelInterface",
             "lidm.models.ae.autoencoder.VQModelInterface")(
        lambda params, **kw: build_vq(params, interface=True, **kw))

    def build_unet_cfg(params) -> UNetConfig:
        return UNetConfig(
            in_channels=params["in_channels"],
            model_channels=params["model_channels"],
            out_channels=params["out_channels"],
            num_res_blocks=params["num_res_blocks"],
            attention_resolutions=tuple(params.get("attention_resolutions", ())),
            channel_mult=tuple(params.get("channel_mult", (1, 2, 4))),
            dropout=params.get("dropout", 0.0),
            num_heads=params.get("num_heads", -1),
            num_head_channels=params.get("num_head_channels", -1),
            use_spatial_transformer=params.get("use_spatial_transformer", False),
            transformer_depth=params.get("transformer_depth", 1),
            context_dim=params.get("context_dim"),
            num_classes=params.get("num_classes"),
            cconv=params.get("lib_name", "lidm") in ("lidm", "lidm_v0"))

    register("unet", "lidm.modules.diffusion.openaimodel.UNetModel")(
        lambda params, dtype=jnp.float32: UNetModel(build_unet_cfg(params),
                                                    dtype=dtype))

    def build_latent_diffusion(params, dtype=jnp.float32):
        image_size = params.get("image_size", [16, 128])
        diff_cfg = DiffusionConfig(
            timesteps=params.get("timesteps", 1000),
            beta_schedule=params.get("beta_schedule", "linear"),
            linear_start=params.get("linear_start", 1e-4),
            linear_end=params.get("linear_end", 2e-2),
            parameterization=params.get("parameterization", "eps"),
            loss_type=params.get("loss_type", "l2"),
            conditioning_key=params.get("conditioning_key"),
            scale_factor=params.get("scale_factor", 1.0),
            scale_by_std=params.get("scale_by_std", False),
            cond_stage_trainable=params.get("cond_stage_trainable", False),
            learn_logvar=params.get("learn_logvar", False),
            latent_shape=(image_size[0], image_size[1],
                          params.get("channels", 8)))
        unet_cfg = build_unet_cfg(params["unet_config"]["params"])

        fs_cfg = None
        n_embed, embed_dim, use_mask = 16384, 8, True
        fsc = params.get("first_stage_config")
        if fsc and fsc != "__is_unconditional__":
            fsp = fsc["params"]
            fs_cfg = _ae_cfg(fsp["ddconfig"])
            n_embed = fsp.get("n_embed", 16384)
            embed_dim = fsp.get("embed_dim", 8)
            use_mask = fsp.get("use_mask", False)

        cond = None
        csc = params.get("cond_stage_config")
        if isinstance(csc, dict):
            cond = instantiate_from_config(csc)
        return LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=fs_cfg,
                               n_embed=n_embed, embed_dim=embed_dim,
                               use_mask=use_mask, cond_stage=cond, dtype=dtype)

    register("latent_diffusion", "lidm.models.diffusion.ddpm.LatentDiffusion")(
        build_latent_diffusion)

    register("class_embedder", "lidm.modules.encoders.modules.ClassEmbedder")(
        lambda params, **kw: ClassEmbedder(**params))
    register("spatial_rescaler", "lidm.modules.encoders.modules.SpatialRescaler")(
        lambda params, **kw: SpatialRescaler(
            n_stages=params.get("n_stages", 1),
            method=params.get("method", "bilinear"),
            out_channels=params.get("out_channels"),
            wh_factors=tuple(params.get("wh_factors", (0.5, 0.5)))))
    register("clip_text", "lidm.modules.encoders.modules.FrozenCLIPTextEmbedder")(
        lambda params, **kw: FrozenCLIPTextEmbedder())
    register("clip_multi_text",
             "lidm.modules.encoders.modules.FrozenClipMultiTextEmbedder")(
        lambda params, **kw: FrozenClipMultiTextEmbedder(
            n_views=params.get("n_views", 4)))
    register("clip_multi_image",
             "lidm.modules.encoders.modules.FrozenClipMultiImageEmbedder")(
        lambda params, **kw: FrozenClipMultiImageEmbedder(
            out_dim=params.get("out_dim", 512)))

    def build_vq_loss(params, **kw):
        return VQLossConfig(
            codebook_weight=params.get("codebook_weight", 1.0),
            pixel_loss=params.get("pixel_loss", "l1"),
            mask_factor=params.get("mask_factor", 0.0),
            geo_factor=params.get("geo_factor", 1.0),
            perceptual_factor=params.get("perceptual_factor", 0.0),
            smooth_factor=params.get("smooth_factor", 0.1),
            norm_factor=params.get("norm_factor", 0.1),
            disc_start=params.get("disc_start", 1),
            disc_weight=params.get("disc_weight", 1.0),
            disc_loss=params.get("disc_loss", "hinge"),
            curve_length=params.get("curve_length", 4))

    register("vq_loss",
             "lidm.modules.losses.vqperceptual.VQGeoLPIPSWithDiscriminator")(
        build_vq_loss)


def instantiate_from_config(cfg: Dict[str, Any], **kwargs) -> Any:
    """Reference semantics (misc_utils.py:118-133): cfg = {target, params}."""
    _builders()
    if cfg in ("__is_unconditional__", "__is_first_stage__"):
        return None
    target = cfg["target"]
    if target not in REGISTRY:
        raise KeyError(f"unknown target '{target}' — known: "
                       f"{sorted(set(REGISTRY))[:20]}...")
    return REGISTRY[target](cfg.get("params", {}), **kwargs)


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
