"""Latent-diffusion U-Net (guided-diffusion architecture) with curve-wise convs.

Parity: ``lidm/modules/diffusion/openaimodel.py`` UNetModel (:415) — residual
blocks with timestep FiLM, multi-head self-attention at configured downsample
rates, optional SpatialTransformer cross-attention, ``lib_name='lidm'`` =>
circular convolutions everywhere (the 360-degree azimuth wrap).

TPU-first: NHWC; attention through ``jax.nn.dot_product_attention`` (fused on
TPU); bf16-friendly (norms in fp32); zero-init output convs so blocks start as
identity, which keeps early training stable in bf16.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import SpatialTransformer
from ..nn.blocks import Normalize, nonlinearity
from ..nn.conv import CircularConv, Conv1x1
from ..nn.embeddings import timestep_embedding

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """unet_config params of the reference configs (e.g. uncond_c2_p4.yaml)."""

    in_channels: int = 8
    model_channels: int = 256
    out_channels: int = 8
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    dropout: float = 0.0
    num_heads: int = -1
    num_head_channels: int = 32
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    conv_resample: bool = True
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    num_classes: Optional[int] = None
    cconv: bool = True  # lib_name == 'lidm'
    remat: bool = False  # rematerialize blocks (use_checkpoint equivalent):
                         # trades recompute for activation memory in training

    def heads_for(self, ch: int) -> Tuple[int, int]:
        """(num_heads, dim_head) resolution (openaimodel.py:545-556, legacy)."""
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels


def _conv3(features: int, cconv: bool, dtype, name: str,
           zero_init: bool = False) -> nn.Module:
    if cconv:
        if zero_init:
            return CircularConvZero(features, dtype=dtype, name=name)
        return CircularConv(features, (3, 3), (1, 1), 1, dtype=dtype, name=name)
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=init,
                   dtype=dtype, name=name)


class CircularConvZero(nn.Module):
    """Zero-initialized circular 3x3 conv (guided-diffusion zero_module parity)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..nn.conv import circular_pad
        x = circular_pad(x, (1, 1, 1, 1))
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="conv")(x)


def _avg_pool2(x: Array) -> Array:
    """stride-2 average pool (guided-diffusion Downsample(use_conv=False))."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _nearest_up2(x: Array) -> Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class ResBlock(nn.Module):
    """guided-diffusion ResBlock (openaimodel.py:163-266) with FiLM timestep.

    ``up``/``down`` implement the resblock_updown variant: the resample happens
    between the first norm/SiLU and the first conv, applied to both the h path
    and the skip path (openaimodel.py:209-221, h_upd/x_upd with use_conv=False).
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    cconv: bool = True
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array, deterministic: bool = True) -> Array:
        h = Normalize(act=True, name="in_norm")(x)  # fused GroupNorm+SiLU
        if self.up:
            h, x = _nearest_up2(h), _nearest_up2(x)
        elif self.down:
            h, x = _avg_pool2(h), _avg_pool2(x)
        h = _conv3(self.out_channels, self.cconv, self.dtype, "in_conv")(h)

        emb_out_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_out_dim, dtype=self.dtype, name="emb_proj")(
            nonlinearity(emb))[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = Normalize(name="out_norm")(h) * (1 + scale) + shift
            h = nonlinearity(h)
        else:
            h = h + emb_out
            h = Normalize(act=True, name="out_norm")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv3(self.out_channels, self.cconv, self.dtype, "out_conv",
                   zero_init=True)(h)

        if x.shape[-1] != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="skip")(x)
        return x + h


class SelfAttentionBlock(nn.Module):
    """Multi-head self-attention over spatial positions (openaimodel.py:269-331)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        dim_head = c // self.num_heads
        y = Normalize(name="norm")(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, self.num_heads, dim_head)
        k = k.reshape(b, h * w, self.num_heads, dim_head)
        v = v.reshape(b, h * w, self.num_heads, dim_head)
        from ..ops.pallas_attention import attend
        out = attend(q, k, v).reshape(b, h * w, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class UNetDown(nn.Module):
    """Downsample (openaimodel.py:332-366): conv stride 2 when use_conv else
    average pooling."""

    cconv: bool
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if not self.use_conv:
            return _avg_pool2(x)
        if self.cconv:
            return CircularConv(x.shape[-1], (3, 3), (2, 2), 1, dtype=self.dtype,
                                name="op")(x)
        return nn.Conv(x.shape[-1], (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="op")(x)


class UNetUp(nn.Module):
    """Upsample (openaimodel.py:288-331): nearest x2, conv only when use_conv."""

    cconv: bool
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = _nearest_up2(x)
        if not self.use_conv:
            return x
        return _conv3(x.shape[-1], self.cconv, self.dtype, "conv")(x)


class UNetModel(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array,
                 context: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 y: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        time_embed_dim = cfg.model_channels * 4

        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(
            nonlinearity(emb))

        if cfg.num_classes is not None:
            assert y is not None
            emb = emb + nn.Embed(cfg.num_classes, time_embed_dim, dtype=self.dtype,
                                 name="label_emb")(y)

        ResBlockM = nn.remat(ResBlock) if cfg.remat else ResBlock
        AttnM = nn.remat(SelfAttentionBlock) if cfg.remat else SelfAttentionBlock
        SpatialM = (nn.remat(SpatialTransformer, static_argnums=(4,))
                    if cfg.remat else SpatialTransformer)

        def attn(h: Array, ch: int, name: str) -> Array:
            heads, dim_head = cfg.heads_for(ch)
            if cfg.use_spatial_transformer:
                return SpatialM(heads, dim_head, cfg.transformer_depth,
                                cfg.dropout, dtype=self.dtype, name=name)(
                    h, context, context_mask, deterministic)
            return AttnM(heads, dtype=self.dtype, name=name)(h)

        h = _conv3(cfg.model_channels, cfg.cconv, self.dtype, "conv_in")(x)
        hs = [h]
        ds = 1
        # --- encoder -------------------------------------------------------
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                              dtype=self.dtype, name=f"in_{level}_{i}_res")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h, ch, f"in_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm,
                                  cfg.cconv, down=True, dtype=self.dtype,
                                  name=f"down_{level}")(h, emb, deterministic)
                else:
                    h = UNetDown(cfg.cconv, cfg.conv_resample, dtype=self.dtype,
                                 name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        # --- middle --------------------------------------------------------
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                      dtype=self.dtype, name="mid_res1")(h, emb, deterministic)
        h = attn(h, ch, "mid_attn")
        h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                      dtype=self.dtype, name="mid_res2")(h, emb, deterministic)

        # --- decoder -------------------------------------------------------
        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.model_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                              dtype=self.dtype, name=f"out_{level}_{i}_res")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h, ch, f"out_{level}_{i}_attn")
            if level != 0:
                if cfg.resblock_updown:
                    h = ResBlockM(ch, cfg.dropout, cfg.use_scale_shift_norm,
                                  cfg.cconv, up=True, dtype=self.dtype,
                                  name=f"up_{level}")(h, emb, deterministic)
                else:
                    h = UNetUp(cfg.cconv, cfg.conv_resample, dtype=self.dtype,
                               name=f"up_{level}")(h)
                ds //= 2

        h = Normalize(act=True, name="norm_out")(h)
        if cfg.cconv:
            out = CircularConvZero(cfg.out_channels, dtype=self.dtype,
                                   name="conv_out")(h)
        else:
            out = nn.Conv(cfg.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.zeros, dtype=self.dtype,
                          name="conv_out")(h)
        return out.astype(jnp.float32)
