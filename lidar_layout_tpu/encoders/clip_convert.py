"""OpenAI CLIP checkpoint -> flax params for the text/image towers.

Parity: the reference loads ``clip.load('ViT-L/14')``
(``lidm/modules/encoders/modules.py:141,196``). This converter maps the
released state_dict (OpenAI naming) onto ``TextTransformerEncoder`` /
``ImageTransformerEncoder`` leaf for leaf; see tests/test_clip_parity.py for
the numerical equivalence check against a torch-built resblock stack.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _ln(sd, pfx):
    return {"scale": np.asarray(sd[f"{pfx}.weight"]),
            "bias": np.asarray(sd[f"{pfx}.bias"])}


def _attn(sd, pfx, heads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention in_proj/out_proj -> flax MHDPA q/k/v/out."""
    w = np.asarray(sd[f"{pfx}.in_proj_weight"])   # (3W, W)
    b = np.asarray(sd[f"{pfx}.in_proj_bias"])     # (3W,)
    width = w.shape[1]
    hd = width // heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def inproj(wi, bi):
        # torch: y = x @ wi.T; flax kernel (in, heads, head_dim)
        return {"kernel": wi.T.reshape(width, heads, hd),
                "bias": bi.reshape(heads, hd)}

    ow = np.asarray(sd[f"{pfx}.out_proj.weight"])  # (W, W)
    ob = np.asarray(sd[f"{pfx}.out_proj.bias"])
    return {
        "query": inproj(qw, qb),
        "key": inproj(kw, kb),
        "value": inproj(vw, vb),
        "out": {"kernel": ow.T.reshape(heads, hd, width), "bias": ob},
    }


def _resblocks(sd, pfx: str, layers: int, heads: int) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(layers):
        blk = f"{pfx}.resblocks.{i}"
        p[f"ln1_{i}"] = _ln(sd, f"{blk}.ln_1")
        p[f"attn_{i}"] = _attn(sd, f"{blk}.attn", heads)
        p[f"ln2_{i}"] = _ln(sd, f"{blk}.ln_2")
        p[f"mlp_in_{i}"] = {
            "kernel": np.asarray(sd[f"{blk}.mlp.c_fc.weight"]).T,
            "bias": np.asarray(sd[f"{blk}.mlp.c_fc.bias"])}
        p[f"mlp_out_{i}"] = {
            "kernel": np.asarray(sd[f"{blk}.mlp.c_proj.weight"]).T,
            "bias": np.asarray(sd[f"{blk}.mlp.c_proj.bias"])}
    return p


def convert_clip_text(sd: Dict[str, Any], layers: int = 12,
                      heads: int = 12) -> Dict[str, Any]:
    """OpenAI CLIP state_dict -> TextTransformerEncoder params."""
    p = _resblocks(sd, "transformer", layers, heads)
    p["token_embedding"] = {
        "embedding": np.asarray(sd["token_embedding.weight"])}
    p["positional_embedding"] = np.asarray(sd["positional_embedding"])
    p["ln_final"] = _ln(sd, "ln_final")
    p["text_projection"] = {"kernel": np.asarray(sd["text_projection"])}
    return {"params": p}


def convert_clip_image(sd: Dict[str, Any], layers: int = 24,
                       heads: int = 16) -> Dict[str, Any]:
    """OpenAI CLIP state_dict (visual.*) -> ImageTransformerEncoder params."""
    p = _resblocks(sd, "visual.transformer", layers, heads)
    conv = np.asarray(sd["visual.conv1.weight"])   # (W, 3, P, P)
    p["patch_embed"] = {"kernel": conv.transpose(2, 3, 1, 0)}  # HWIO
    p["cls"] = np.asarray(sd["visual.class_embedding"]).reshape(1, 1, -1)
    p["pos"] = np.asarray(sd["visual.positional_embedding"])[None]
    p["ln_pre"] = _ln(sd, "visual.ln_pre")
    p["ln_post"] = _ln(sd, "visual.ln_post")
    p["proj"] = {"kernel": np.asarray(sd["visual.proj"])}
    return {"params": p}
