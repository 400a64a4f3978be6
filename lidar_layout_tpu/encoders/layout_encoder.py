"""Layout (object box) conditioning encoder for the layout-conditioned LiDM.

Parity: ``lidm/modules/encoders/layout_encoder.py:140`` LayoutTransformerEncoder
— splits 13-dim layout rows into bbox8 / bbox2d4 / class1 (:224), class + bbox
embeddings fused by a transformer, per-resolution image-patch bbox embeddings
(:200-206) for the object-aware cross-attention, outputs {xf_proj, xf_out,
key_padding_mask, obj_class/bbox embeddings}.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LayoutEncoderConfig:
    layout_length: int = 13
    hidden_dim: int = 256
    output_dim: int = 1024
    num_layers: int = 6
    num_heads: int = 8
    num_classes: int = 9
    use_final_ln: bool = True
    use_positional_embedding: bool = False
    feature_map_size: Tuple[int, int] = (8, 128)
    resolution_to_attention: Tuple[int, ...] = (8, 4, 2)  # H of each level


def patch_bboxes(h: int, w: int) -> np.ndarray:
    """(h*w, 4) normalized [x0, y0, x1, y1] of each feature-map cell
    (layout_encoder.py:200-206)."""
    iy, ix = 1.0 / h, 1.0 / w
    out = [(ix * j, iy * i, ix * (j + 1), iy * (i + 1))
           for i in range(h) for j in range(w)]
    return np.asarray(out, np.float32)


class LayoutTransformerEncoder(nn.Module):
    cfg: LayoutEncoderConfig

    @nn.compact
    def __call__(self, layout: Array) -> Dict[str, Array]:
        """layout (B, L, 13) = [bbox8 | bbox2d4 | class1]."""
        cfg = self.cfg
        b, l, _ = layout.shape
        obj_bbox, obj_bbox_2d, obj_class = jnp.split(layout, [8, 12], axis=-1)
        obj_class = obj_class[..., 0].astype(jnp.int32)
        is_valid = obj_class > 0

        cls_emb = nn.Embed(cfg.num_classes, cfg.hidden_dim,
                           name="obj_class_embedding")(obj_class)
        bbox_emb_layer = nn.Dense(cfg.hidden_dim, name="obj_bbox_embedding")
        bbox_emb = bbox_emb_layer(obj_bbox_2d)
        bbox_enc = nn.Dense(cfg.hidden_dim, name="obj_bbox_encoding")(obj_bbox)

        xf = cls_emb + bbox_emb + bbox_enc
        if cfg.use_positional_embedding:
            pos = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (cfg.layout_length, cfg.hidden_dim))
            xf = xf + pos[None]

        for i in range(cfg.num_layers):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(xf)
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, name=f"attn_{i}")(h, h)
            xf = xf + h
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(xf)
            h = nn.Dense(cfg.hidden_dim * 4, name=f"mlp_in_{i}")(h)
            h = jax.nn.gelu(h)
            h = nn.Dense(cfg.hidden_dim, name=f"mlp_out_{i}")(h)
            xf = xf + h

        if cfg.use_final_ln:
            xf = nn.LayerNorm(dtype=jnp.float32, name="final_ln")(xf)

        out = {
            "xf_out": xf,                                       # (B, L, C)
            "xf_proj": nn.Dense(cfg.output_dim,
                                name="transformer_proj")(xf[:, 0]),
            "obj_class_embedding": cls_emb,
            "obj_bbox_embedding": bbox_emb,
            "key_padding_mask": is_valid,                       # True = attend
        }
        # image-patch bbox embeddings through the SAME bbox embedding layer
        hh, ww = cfg.feature_map_size
        for res in cfg.resolution_to_attention:
            ph = res
            pw = int(ww / (hh / res))
            pb = jnp.asarray(patch_bboxes(ph, pw))
            emb = bbox_emb_layer(pb)                            # (L1, C)
            out[f"image_patch_bbox_embedding_res{res}"] = \
                jnp.broadcast_to(emb[None], (b, *emb.shape))
        return out
