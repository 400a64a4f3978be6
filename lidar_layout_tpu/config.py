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
    from .encoders.modules import (BERTEmbedder, ClassEmbedder,
                                   FrozenCLIPTextEmbedder,
                                   FrozenClipMultiImageEmbedder,
                                   FrozenClipMultiTextEmbedder,
                                   SpatialRescaler, TransformerEmbedder)
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
        unet_target = params["unet_config"].get("target", "")
        unet = None
        unet_cfg = None
        if "object_cross_unet" in unet_target or unet_target == "layout_unet":
            unet = instantiate_from_config(params["unet_config"], dtype=dtype)
        else:
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
                               use_mask=use_mask, cond_stage=cond, unet=unet,
                               dtype=dtype)

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
    def build_bert_embedder(params, **kw):
        """backend: 'compact' (default, checkpoint-template stand-in) or
        'x_transformer' — the full vendored-library port, matching the
        reference's BERTEmbedder -> x_transformer.TransformerWrapper wiring
        (lidm/modules/encoders/modules.py:81-106)."""
        common = dict(
            n_embed=params.get("n_embed", 640),
            n_layer=params.get("n_layer", 32),
            vocab_size=params.get("vocab_size", 30522),
            max_seq_len=params.get("max_seq_len", 77),
            embedding_dropout=params.get("embedding_dropout", 0.0))
        if params.get("backend", "compact") in ("x_transformer", "xt"):
            from .encoders.modules import XTransformerBERTEmbedder
            return XTransformerBERTEmbedder(
                heads=params.get("heads", 8),
                attn_flags=params.get("attn_flags"), **common)
        return BERTEmbedder(**common)

    register("bert_embedder", "lidm.modules.encoders.modules.BERTEmbedder")(
        build_bert_embedder)
    register("transformer_embedder",
             "lidm.modules.encoders.modules.TransformerEmbedder")(
        lambda params, **kw: TransformerEmbedder(
            n_embed=params.get("n_embed", 640),
            n_layer=params.get("n_layer", 32),
            vocab_size=params.get("vocab_size", 30522),
            max_seq_len=params.get("max_seq_len", 77)))
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

    # ------------------------------------------------------------------
    # remaining model families (VERDICT r1 #3: full config surface)
    # ------------------------------------------------------------------
    from .models.autoencoder_gaus import VQModelGaus
    from .models.sparse_vae import SparseVAE, SparseVAEConfig
    from .models.object_ae import ObjectAEConfig, VQModelObject
    from .models.cube_diffusion import (CubeDiffusion, CubeDiffusionConfig,
                                        SparseUNetConfig)
    from .models.r2dm import R2DMConfig, R2DMDiffusion
    from .models.object_cross_unet import (LayoutDiffusionUNetModel,
                                           LayoutUNetConfig)
    from .models.gs_decoder import DenseDecoder, GSDecoderConfig
    from .models.ptv3 import PTv3, PTv3Config
    from .encoders.layout_encoder import (LayoutEncoderConfig,
                                          LayoutTransformerEncoder)
    from .encoders.scene_graph import SceneGraphEncoder

    register("autoencoder_kl", "lidm.models.autoencoder.AutoencoderKL",
             "lidm.models.ae.autoencoder.AutoencoderKL")(
        lambda params, dtype=jnp.float32: AutoencoderKL(
            _ae_cfg(params["ddconfig"]),
            embed_dim=params.get("embed_dim", 8), dtype=dtype))

    register("vq_model_gaus", "lidm.models.ae.autoencoder_gaus.VQModel_Gaus")(
        lambda params, dtype=jnp.float32: VQModelGaus(
            _ae_cfg(params["ddconfig"]),
            n_embed=params.get("n_embed", 16384),
            embed_dim=params.get("embed_dim", 8),
            use_mask=params.get("use_mask", False), dtype=dtype))

    def _cube_cfg(params) -> SparseVAEConfig:
        """geoconfig/unetconfig/lossconfig -> fixed-capacity SparseVAEConfig
        (autoencoder_cube.yaml / voxel_1024*.yaml)."""
        geo = params.get("geoconfig", {})
        un = params.get("unetconfig", {}).get("params", {})
        lo = (params.get("lossconfig", {}) or {}).get("params", {})
        base = (lo or {}).get("baseconfig", {})
        depth = geo.get("tree_depth", 3)
        f = un.get("f_maps", 32)
        cut = un.get("cut_ratio", 16)
        channels = tuple(f * (2 ** i) for i in range(depth))
        return SparseVAEConfig(
            num_levels=depth,
            base_capacity=params.get("base_capacity", 4096),
            channels=channels,
            latent_dim=max(channels[-1] // cut, 4),
            voxel_size=geo.get("voxel_size", 0.1),
            kl_weight=base.get("kl_weight", 1e-3))

    register("cube_ae", "lidm.models.ae.autoencoder_cube.CubeAEModel",
             "lidm.models.ae.autoencoder_cube.CubeModelInterface")(
        lambda params, **kw: SparseVAE(_cube_cfg(params)))

    register("vq_model_object",
             "lidm.models.ae.autoencoder_object.VQModel_Object")(
        lambda params, **kw: VQModelObject(ObjectAEConfig(
            num_points=params.get("num_points", 512),
            num_grids=params.get("modelconfig", {}).get("params", {})
                            .get("num_grids", 1024),
            embed_dim=params.get("embed_dim", 1024),
            n_embed=params.get("n_embed", 4096))))

    def build_unet1d_cfg(params) -> UNet1DConfig:
        return UNet1DConfig(
            in_channels=params.get("in_channels", 8),
            model_channels=params.get("model_channels", 512),
            out_channels=params.get("out_channels", 8),
            num_res_blocks=params.get("num_res_blocks", 2),
            attention_resolutions=tuple(
                params.get("attention_resolutions", (4, 2))),
            channel_mult=tuple(params.get("channel_mult", (1, 1, 1, 1))),
            num_heads=params.get("num_heads", 8),
            transformer_depth=params.get("transformer_depth", 1),
            conditioning_key=params.get("conditioning_key", "crossattn"),
            concat_dim=params.get("concat_dim", 1280),
            crossattn_dim=params.get("crossattn_dim", 1280),
            enable_t_emb=params.get("enable_t_emb", True),
            dropout=params.get("dropout", 0.0))

    register("unet1d", "lidm.modules.unets.unet_1d.UNet1DModel")(
        lambda params, **kw: build_unet1d_cfg(params))

    def build_layout_diffusion(params, dtype=jnp.float32):
        csc = params.get("cond_stage_config", {}) or {}
        csp = csc.get("params", {}) if isinstance(csc, dict) else {}
        vocab = params.get("vocab", {})  # injected (train_layout.py:600)
        return LayoutDiffusion(
            LayoutDiffusionConfig(
                timesteps=params.get("timesteps", 1000),
                linear_start=params.get("linear_start", 1e-4),
                linear_end=params.get("linear_end", 2e-2),
                loss_type=params.get("loss_type", "l2"),
                parameterization=params.get("parameterization", "eps")),
            build_unet1d_cfg(params["unet_config"]["params"]),
            num_objs=vocab.get("num_objs", 32),
            num_preds=vocab.get("num_preds", 16),
            sg_embedding_dim=csp.get("embedding_dim", 64),
            use_clip=csp.get("use_clip", True))

    register("layout_diffusion", "lidm.models.diffusion.ddpm.LayoutDiffusion")(
        build_layout_diffusion)

    def build_layout_unet_cfg(params) -> LayoutUNetConfig:
        return LayoutUNetConfig(
            in_channels=params.get("in_channels", 8),
            model_channels=params.get("model_channels", 256),
            out_channels=params.get("out_channels", 8),
            num_res_blocks=params.get("num_res_blocks", 2),
            channel_mult=tuple(params.get("channel_mult", (1, 2, 4))),
            attention_ds=tuple(params.get("attention_ds", (1, 2, 4))),
            encoder_channels=params.get("encoder_channels", 256),
            num_head_channels=params.get("num_head_channels", 64),
            dropout=params.get("dropout", 0.1),
            use_scale_shift_norm=params.get("use_scale_shift_norm", True),
            image_size=tuple(params.get("image_size", (8, 128))),
            cconv=params.get("lib_name", "lidm") in ("lidm", "lidm_v0"))

    register("layout_unet",
             "lidm.modules.unets.object_cross_unet.LayoutDiffusionUNetModel")(
        lambda params, dtype=jnp.float32: LayoutDiffusionUNetModel(
            build_layout_unet_cfg(params), dtype=dtype))

    register("layout_encoder",
             "lidm.modules.encoders.layout_encoder.LayoutTransformerEncoder")(
        lambda params, **kw: LayoutTransformerEncoder(LayoutEncoderConfig(
            layout_length=params.get("layout_length", 13),
            hidden_dim=params.get("hidden_dim", 256),
            output_dim=params.get("output_dim", 1024),
            num_layers=params.get("num_layers", 6),
            num_heads=params.get("num_heads", 8),
            num_classes=params.get("num_classes_for_layout_object", 9),
            use_final_ln=params.get("use_final_ln", True),
            use_positional_embedding=params.get("use_positional_embedding",
                                                False),
            feature_map_size=tuple(params.get("feature_map_size", (8, 128))),
            resolution_to_attention=tuple(
                params.get("resolution_to_attention", (8, 4, 2))))))

    register("scene_graph", "lidm.modules.encoders.scene_graph.SceneGraph")(
        lambda params, **kw: SceneGraphEncoder(
            num_objs=params.get("vocab", {}).get("num_objs", 32),
            num_preds=params.get("vocab", {}).get("num_preds", 16),
            embedding_dim=params.get("embedding_dim", 64),
            gconv_num_layers=params.get("gconv_num_layers", 5),
            use_clip=params.get("use_clip", True),
            residual=params.get("residual", True),
            replace_latent=params.get("replace_latent", True)))

    def build_cube_diffusion(params, dtype=jnp.float32):
        up = params["unet_config"]["params"]
        fsc = params.get("first_stage_config", {}) or {}
        fs_cfg = _cube_cfg(fsc.get("params", {}))
        return CubeDiffusion(
            CubeDiffusionConfig(
                timesteps=params.get("timesteps", 1000),
                linear_start=params.get("linear_start", 1e-4),
                linear_end=params.get("linear_end", 2e-2),
                latent_dim=fs_cfg.latent_dim),
            SparseUNetConfig(
                in_channels=fs_cfg.latent_dim,
                model_channels=up.get("model_channels", 64),
                num_blocks=up.get("num_res_blocks", 2),
                num_heads=up.get("num_heads", 8)))

    register("cube_latent_diffusion",
             "lidm.models.diffusion.ddpm_cube.CubeLatentDiffusion")(
        build_cube_diffusion)

    def build_r2dm(params, dtype=jnp.float32):
        up = params["unet_config"]["params"]
        return R2DMDiffusion(R2DMConfig(
            image_size=tuple(params.get("image_size", (32, 1024))),
            channels=params.get("channels", 2),
            base_channels=up.get("base_channels", 64),
            channel_mult=tuple(up.get("channel_multiplier", (1, 2, 4, 8))),
            num_res_blocks=(up.get("num_residual_blocks", [2])[0]
                            if isinstance(up.get("num_residual_blocks"), list)
                            else up.get("num_residual_blocks", 2)),
            timesteps=params.get("timesteps", 1024)))

    register("r2dm_diffusion", "lidm.models.diffusion.ddpm_r2dm.R2DMDiffusion")(
        build_r2dm)

    def build_ptv3_cfg(dd) -> PTv3Config:
        """pointcept PT-v3m1 dict -> PTv3Config (gaus_10cm.py model.backbone)."""
        return PTv3Config(
            in_channels=dd.get("in_channels", 4),
            orders=tuple(dd.get("order",
                                ("z", "z-trans", "hilbert", "hilbert-trans"))),
            patch_size=(dd.get("enc_patch_size", [1024])[0]
                        if isinstance(dd.get("enc_patch_size"), (list, tuple))
                        else dd.get("enc_patch_size", 1024)),
            enc_depths=tuple(dd.get("enc_depths", (2, 2, 2, 6, 2))),
            enc_channels=tuple(dd.get("enc_channels", (32, 64, 128, 256, 512))),
            enc_heads=tuple(dd.get("enc_num_head", (2, 4, 8, 16, 32))),
            dec_depths=tuple(dd.get("dec_depths", (2, 2, 2, 2))),
            dec_channels=tuple(dd.get("dec_channels", (64, 64, 128, 256))),
            dec_heads=tuple(dd.get("dec_num_head", (4, 4, 8, 16))),
            mlp_ratio=dd.get("mlp_ratio", 4.0),
            drop_path=dd.get("drop_path", 0.0),
            shuffle_orders=dd.get("shuffle_orders", True),
            enable_rpe=dd.get("enable_rpe", False))

    register("ptv3", "PT-v3m1")(
        lambda params, **kw: PTv3(build_ptv3_cfg(params)))

    def build_ptv2(params, **kw):
        """pointcept PT-v2m2 kwargs -> PointTransformerV2 (zoo entry,
        point_transformer_v2m2_base.py:446-470)."""
        import dataclasses

        from .models.ptv2 import PointTransformerV2, PTv2Config
        keys = {f.name for f in dataclasses.fields(PTv2Config)}
        return PointTransformerV2(PTv2Config(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in (params or {}).items() if k in keys}))

    register("ptv2", "PT-v2m2")(build_ptv2)

    def build_ptv1(blocks):
        def build(params, **kw):
            """pointcept PointTransformer-Seg* kwargs -> PointTransformerSeg
            (point_transformer_seg.py:308-327 variants)."""
            import dataclasses

            from .models.ptv1 import PointTransformerSeg, PTv1Config
            keys = {f.name for f in dataclasses.fields(PTv1Config)} - {"blocks"}
            return PointTransformerSeg(PTv1Config(blocks=blocks, **{
                k: (tuple(v) if isinstance(v, list) else v)
                for k, v in (params or {}).items() if k in keys}))
        return build

    register("ptv1_seg26", "PointTransformer-Seg26")(build_ptv1((1, 1, 1, 1, 1)))
    register("ptv1_seg38", "PointTransformer-Seg38")(build_ptv1((1, 2, 2, 2, 2)))
    register("ptv1_seg50", "PointTransformer-Seg50")(build_ptv1((1, 2, 3, 5, 2)))

    def build_spunet(params, **kw):
        """pointcept SpUNet-v1m1 kwargs -> SpUNet
        (spconv_unet_v1m1_base.py:88-100)."""
        import dataclasses

        from .models.spunet import SpUNet, SpUNetConfig
        keys = {f.name for f in dataclasses.fields(SpUNetConfig)}
        return SpUNet(SpUNetConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in (params or {}).items() if k in keys}))

    register("spunet", "SpUNet-v1m1")(build_spunet)

    def build_stratified(params, **kw):
        """pointcept ST-v1m1 kwargs -> StratifiedTransformer
        (stratified_transformer_v1m1_origin.py:650-674)."""
        import dataclasses

        from .models.stratified import (StratifiedConfig,
                                        StratifiedTransformer)
        keys = {f.name for f in dataclasses.fields(StratifiedConfig)}
        return StratifiedTransformer(StratifiedConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in (params or {}).items() if k in keys}))

    register("stratified", "ST-v1m1")(build_stratified)

    def build_octformer(params, **kw):
        """pointcept OctFormer-v1m1 kwargs -> OctFormer
        (octformer_v1m1_base.py:508-525)."""
        import dataclasses

        from .models.octformer import OctFormer, OctFormerConfig
        keys = {f.name for f in dataclasses.fields(OctFormerConfig)}
        return OctFormer(OctFormerConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in (params or {}).items() if k in keys}))

    register("octformer", "OctFormer-v1m1")(build_octformer)

    def build_swin3d(params, **kw):
        """pointcept Swin3D-v1m1 kwargs -> Swin3DUNet
        (swin3d_v1m1_base.py:14-33)."""
        import dataclasses

        from .models.swin3d import Swin3DConfig, Swin3DUNet
        keys = {f.name for f in dataclasses.fields(Swin3DConfig)}
        return Swin3DUNet(Swin3DConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in (params or {}).items() if k in keys}))

    register("swin3d", "Swin3D-v1m1")(build_swin3d)

    def _unwrap(d):
        """Accept both {target, params:{...}} wrappers and bare dicts."""
        d = d or {}
        return d.get("params", d) if isinstance(d, dict) else {}

    register("dense_decoder", "DenseDecoderV0")(
        lambda params, **kw: DenseDecoder(
            backbone_cfg=build_ptv3_cfg(_unwrap(params.get("backbone"))),
            gs_cfg=GSDecoderConfig(
                feat_dim=_unwrap(params.get("head")).get(
                    "feat_dim", params.get("backbone_out_channels", 64)))))

    register("gs_decoder_head", "GSDecoder")(
        lambda params, **kw: GSDecoderConfig(
            feat_dim=params.get("feat_dim", 64)))

    from .models.ptv3 import PTv3Segmentor

    register("ptv3_segmentor", "DefaultSegmentorV2")(
        lambda params, **kw: PTv3Segmentor(
            backbone_cfg=build_ptv3_cfg(_unwrap(params.get("backbone"))),
            num_classes=params.get("num_classes", 16),
            backbone_out_channels=params.get("backbone_out_channels", 64)))

    register("unet_sparse", "lidm.modules.unets.unet_sparse.UNetModel_Sparse")(
        lambda params, **kw: SparseUNetConfig(
            in_channels=params.get("in_channels", 16),
            model_channels=params.get("model_channels", 64),
            num_blocks=params.get("num_res_blocks", 2),
            num_heads=params.get("num_heads", 8)))

    register("efficient_unet", "lidm.modules.unets.efficient_unet.EfficientUNet")(
        lambda params, **kw: params)  # consumed inline by r2dm_diffusion

    register("vq_loss_1d",
             "lidm.modules.losses.vqperceptual.VQGeoLPIPSWithDiscriminator1D")(
        lambda params, **kw: params)  # consumed by the object-AE trainer

    register("identity", "torch.nn.Identity")(lambda params, **kw: None)

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


def apply_dotlist(cfg: Dict[str, Any], overrides) -> Dict[str, Any]:
    """CLI dotlist overrides merged last (main.py:537-539 OmegaConf
    ``from_dotlist``): each item is ``a.b.c=value`` with the value parsed as
    YAML (so ``lr=1e-4``, ``flag=true``, ``mult=[1,2]`` all type correctly).
    Intermediate dicts are created as needed; mutates and returns ``cfg``."""
    import yaml

    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"dotlist override '{item}' must be key=value")
        key, _, raw = item.partition("=")
        val = yaml.safe_load(raw)
        if isinstance(val, str):
            # YAML 1.1 won't float bare scientific notation like "2e-3"
            try:
                val = float(val)
            except ValueError:
                pass
        node = cfg
        parts = key.strip().split(".")
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = val
    return cfg
