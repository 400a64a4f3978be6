"""1D U-Net denoiser for object-box diffusion, with graph message passing.

Parity: ``lidm/modules/unets/unet_1d.py:361-715`` UNet1DModel — each box is a
length-1 "sequence" of 8 channels (size3+loc3+sincos2); a 5-layer
GraphTripleConv over (box, predicate) produces a per-box relation token that
conditions the U-Net via 1D cross-attention. Note the reference's Upsample is a
no-op resize (scale_factor=1, unet_1d.py:81) and Downsample stride-2 on
length-1 keeps length 1, so the network is effectively a conditioned per-box
MLP stack — we keep the same module structure so configs and weights map 1:1.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import BasicTransformerBlock
from ..nn.embeddings import timestep_embedding
from ..nn.graph import GraphTripleConvNet
from .unet import nonlinearity

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNet1DConfig:
    """unet_config of configs/layout_diffusion/nuscenes/layout_nusc.yaml."""

    in_channels: int = 8
    model_channels: int = 512
    out_channels: int = 8
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2)
    channel_mult: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: int = 8
    transformer_depth: int = 1
    conditioning_key: str = "crossattn"   # 'concat' | 'crossattn' | 'hybrid'
    concat_dim: int = 1280
    crossattn_dim: int = 1280
    enable_t_emb: bool = True
    dropout: float = 0.0
    # GCN head (unet_1d.py:627-650)
    gconv_dim: int = 64
    num_preds: int = 16
    using_clip: bool = True


class Norm32(nn.Module):
    """GroupNorm with >=16-channel groups. On a length-1 signal, 32 groups over
    few channels would normalize 2-element groups into pure sign bits; capping
    groups at C//16 keeps the reference's 32 groups at its 512-channel width
    while staying non-degenerate at test widths."""

    @nn.compact
    def __call__(self, x):
        g = max(1, min(32, x.shape[-1] // 16))
        return nn.GroupNorm(num_groups=g, epsilon=1e-5,
                            dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)


class ResBlock1D(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, emb: Array, deterministic: bool = True) -> Array:
        # x: (N, L=1, C)
        h = Norm32(name="in_norm")(x)
        h = nonlinearity(h)
        h = nn.Conv(self.out_channels, (3,), padding=1, name="in_conv")(h)
        h = h + nn.Dense(self.out_channels, name="emb_proj")(
            nonlinearity(emb))[:, None, :]
        h = Norm32(name="out_norm")(h)
        h = nonlinearity(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3,), padding=1,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Dense(self.out_channels, name="skip")(x)
        return x + h


class Transformer1D(nn.Module):
    heads: int
    dim_head: int
    depth: int = 1

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        n, l, c = x.shape
        inner = self.heads * self.dim_head
        res = x
        x = Norm32(name="norm")(x)
        x = nn.Dense(inner, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.heads, self.dim_head,
                                      name=f"block_{i}")(
                x, context=context, deterministic=deterministic)
        x = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj_out")(x)
        return x + res


class UNet1DModel(nn.Module):
    cfg: UNet1DConfig

    @nn.compact
    def __call__(self, box_t: Array, obj_embed: Array, triples: Array,
                 timesteps: Array, context: Optional[Array] = None,
                 pred_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """box_t (N, 8) noisy boxes; obj_embed (N, D_obj) from the scene-graph
        encoder; triples (T, 3); timesteps (N,). Returns (N, 8) eps."""
        cfg = self.cfg
        time_dim = cfg.model_channels * 4
        t_emb = timestep_embedding(timesteps, cfg.model_channels,
                                   flip_sin_to_cos=True)
        emb = nn.Dense(time_dim, name="time_embed_0")(t_emb)
        emb = nn.Dense(time_dim, name="time_embed_2")(nonlinearity(emb))

        # ---- box message passing (unet_1d.py:668-683) -----------------------
        s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
        edges = jnp.stack([s, o], axis=1)
        box_embed = nn.Dense(cfg.gconv_dim, name="box_embeddings")(box_t)
        pred_embed = nn.Embed(cfg.num_preds, cfg.gconv_dim * 2,
                              name="pred_embeddings")(p)
        obj_box = jnp.concatenate([obj_embed, box_embed], axis=-1)
        if cfg.enable_t_emb:
            obj_box = jnp.concatenate(
                [obj_box, nn.Dense(cfg.gconv_dim, name="box_time_emb")(emb)], -1)
        gcn = GraphTripleConvNet(
            input_dim_obj=obj_box.shape[-1], input_dim_pred=cfg.gconv_dim * 2,
            hidden_dim=cfg.gconv_dim * 4, num_layers=5, residual=True,
            output_dim=cfg.concat_dim, name="box_graph_cov")
        latent_box_rel, _ = gcn(obj_box, pred_embed, edges, pred_mask)

        # ---- assemble U-Net input (unet_1d.py:697-706) ----------------------
        h = box_t[:, None, :]                       # (N, 1, 8)
        rel = latent_box_rel[:, None, :]            # (N, 1, concat_dim)
        ctx = context
        if cfg.conditioning_key in ("concat", "hybrid"):
            h = jnp.concatenate([h, rel], axis=-1)
        if cfg.conditioning_key in ("crossattn", "hybrid"):
            ctx = rel
        if ctx is not None and ctx.ndim == 2:
            ctx = ctx[:, None, :]

        dim_head = cfg.model_channels // cfg.num_heads

        def attn(h, name):
            return Transformer1D(cfg.num_heads, dim_head, cfg.transformer_depth,
                                 name=name)(h, context=ctx,
                                            deterministic=deterministic)

        h = nn.Conv(cfg.model_channels, (3,), padding=1, name="conv_in")(h)
        hs = [h]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock1D(ch, cfg.dropout, name=f"in_{level}_{i}")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h, f"in_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = nn.Conv(ch, (3,), strides=(2,), padding=1,
                            name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock1D(ch, cfg.dropout, name="mid_res1")(h, emb, deterministic)
        h = attn(h, "mid_attn")
        h = ResBlock1D(ch, cfg.dropout, name="mid_res2")(h, emb, deterministic)

        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.model_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock1D(ch, cfg.dropout, name=f"out_{level}_{i}")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h, f"out_{level}_{i}_attn")
            if level != 0:
                # reference Upsample is a no-op resize + conv (unet_1d.py:74-84)
                h = nn.Conv(ch, (3,), padding=1, name=f"up_{level}")(h)
                ds //= 2

        h = Norm32(name="norm_out")(h)
        h = nonlinearity(h)
        h = nn.Conv(cfg.out_channels, (3,), padding=1,
                    kernel_init=nn.initializers.zeros, name="conv_out")(h)
        return h[:, 0, :]
