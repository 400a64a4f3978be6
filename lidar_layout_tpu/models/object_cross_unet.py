"""Object-aware cross-attention U-Net for layout-conditioned range diffusion.

Parity: ``lidm/modules/unets/object_cross_unet.py`` — LayoutDiffusionUNetModel
(:632): a guided-diffusion U-Net whose attention blocks are
ObjectAwareCrossAttention (:380): image patches attend to the mixed set
[image patches + layout tokens], with bbox-derived positional embeddings
concatenated onto the q/k channels per resolution, and a key-padding mask
hiding invalid layout slots. Timestep embedding is fused with the layout's
global projection xf_proj (as the reference's forward does).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import Normalize, nonlinearity
from ..nn.conv import CircularConv, Conv1x1
from ..nn.embeddings import timestep_embedding
from .unet import CircularConvZero, ResBlock, UNetDown, UNetUp, _conv3

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LayoutUNetConfig:
    in_channels: int = 8
    model_channels: int = 256
    out_channels: int = 8
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    attention_ds: Tuple[int, ...] = (1, 2, 4)   # ds levels with attention
    encoder_channels: int = 256                  # layout encoder hidden dim
    num_head_channels: int = 64
    dropout: float = 0.1
    use_scale_shift_norm: bool = True
    pos_scale: float = 1.0                       # channels_scale_for_pos_emb
    image_size: Tuple[int, int] = (8, 128)
    cconv: bool = True


class ObjectAwareCrossAttention(nn.Module):
    """Image patches attend to [patches + layout tokens] with bbox positional
    embeddings appended to q/k (object_cross_unet.py:449-570)."""

    heads: int
    res_key: int          # H of this feature level, keys the patch embeddings
    pos_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Dict[str, Array]) -> Array:
        b, h, w, c = x.shape
        l1 = h * w
        heads = self.heads
        dh = c // heads
        pos_c = int(c * self.pos_scale)
        pos_dh = pos_c // heads

        y = Normalize(name="norm_qkv")(x).reshape(b, l1, c)
        qkv = Conv1x1(3 * c, dtype=self.dtype, name="qkv")(
            y.reshape(b, 1, l1, c))[:, 0]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        pos_proj = nn.Dense(pos_c, name="layout_position_proj")
        # image-patch positional embedding (shared bbox embedding space)
        img_pos = pos_proj(cond[f"image_patch_bbox_embedding_res{self.res_key}"])
        img_pos = _groupnorm(img_pos, "norm_img_pos")
        # layout positional embedding
        lay_pos = pos_proj(cond["obj_bbox_embedding"])
        lay_pos = _groupnorm(lay_pos, "norm_lay_pos")

        # layout content: (xf_out + norm(class_emb)) / 2 -> k,v
        cls_n = _groupnorm(cond["obj_class_embedding"], "norm_obj_class")
        content = (cond["xf_out"] + cls_n) / 2.0
        kv = nn.Dense(2 * c, name="layout_content_proj")(content)
        k_lay, v_lay = jnp.split(kv, 2, axis=-1)

        l2 = k_lay.shape[1]

        def split_heads(t, d):
            return t.reshape(b, -1, heads, d)

        q_full = jnp.concatenate([q, img_pos], axis=-1)       # (B, L1, c+pos)
        k_img = jnp.concatenate([k, img_pos], axis=-1)
        k_layf = jnp.concatenate([k_lay, lay_pos], axis=-1)
        k_mix = jnp.concatenate([k_img, k_layf], axis=1)      # (B, L1+L2, .)
        v_mix = jnp.concatenate([v, v_lay], axis=1)           # (B, L1+L2, c)

        qh = split_heads(q_full, dh + pos_dh)
        kh = split_heads(k_mix, dh + pos_dh)
        vh = split_heads(v_mix, dh)

        # manual attention: q/k carry the extra positional channels while v
        # stays at dh, so fused kernels (which require equal head dims) do not
        # apply. scale matches the reference's sqrt-sqrt trick (:524).
        scale = 1.0 / math.sqrt(math.sqrt(dh + pos_dh))
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh * scale)
        if "key_padding_mask" in cond:
            valid_layout = cond["key_padding_mask"]           # (B, L2) True=ok
            full = jnp.concatenate(
                [jnp.ones((b, l1), bool), valid_layout], axis=1)
            logits = jnp.where(full[:, None, None, :], logits, -1e9)
        wgt = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", wgt, vh)
        out = out.reshape(b, l1, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


def _groupnorm(t: Array, name: str) -> Array:
    return nn.GroupNorm(num_groups=min(32, t.shape[-1]), epsilon=1e-5,
                        dtype=jnp.float32, name=name)(t)


class LayoutDiffusionUNetModel(nn.Module):
    cfg: LayoutUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, cond: Dict[str, Array],
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_0")(emb)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_2")(nonlinearity(emb))
        # fuse the layout global projection into the timestep embedding
        emb = emb + cond["xf_proj"]

        h0 = cfg.image_size[0]

        def attn(h_feat, ds, name):
            heads = h_feat.shape[-1] // cfg.num_head_channels
            return ObjectAwareCrossAttention(
                heads, res_key=h0 // ds, pos_scale=cfg.pos_scale,
                dtype=self.dtype, name=name)(h_feat, cond)

        h = _conv3(cfg.model_channels, cfg.cconv, self.dtype, "conv_in")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.dropout, cfg.use_scale_shift_norm,
                             cfg.cconv, dtype=self.dtype,
                             name=f"in_{level}_{i}")(h, emb, deterministic)
                if ds in cfg.attention_ds:
                    h = attn(h, ds, f"in_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = UNetDown(cfg.cconv, dtype=self.dtype, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                     dtype=self.dtype, name="mid_res1")(h, emb, deterministic)
        h = attn(h, ds, "mid_attn")
        h = ResBlock(ch, cfg.dropout, cfg.use_scale_shift_norm, cfg.cconv,
                     dtype=self.dtype, name="mid_res2")(h, emb, deterministic)

        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.model_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, cfg.dropout, cfg.use_scale_shift_norm,
                             cfg.cconv, dtype=self.dtype,
                             name=f"out_{level}_{i}")(h, emb, deterministic)
                if ds in cfg.attention_ds:
                    h = attn(h, ds, f"out_{level}_{i}_attn")
            if level != 0:
                h = UNetUp(cfg.cconv, dtype=self.dtype, name=f"up_{level}")(h)
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
