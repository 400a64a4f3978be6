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


def convert_unet(sd: Dict[str, np.ndarray], num_res_blocks: int,
                 channel_mult, num_head_channels: int = 32,
                 prefix: str = "model.diffusion_model.") -> Dict[str, Any]:
    """Reference guided-diffusion UNetModel state_dict -> flax params for
    models.unet.UNetModel (openaimodel.py layout, legacy QKV attention).

    ``prefix`` matches LatentDiffusion checkpoints ('model.diffusion_model.');
    pass '' for a bare UNet state_dict.
    """
    params: Dict[str, Any] = {}
    levels = len(channel_mult)

    def g(name):
        return sd.get(prefix + name)

    def conv(dst, src, nested=True, zero_scope=False):
        w = g(f"{src}.weight")
        if w is None:
            return False
        base = f"{dst}/conv" if nested else dst
        _set(params, f"{base}/kernel", _cv(w))
        b = g(f"{src}.bias")
        if b is not None:
            _set(params, f"{base}/bias", b)
        return True

    def dense(dst, src):
        w = g(f"{src}.weight")
        if w is None:
            return False
        _set(params, f"{dst}/kernel", w.T)
        b = g(f"{src}.bias")
        if b is not None:
            _set(params, f"{dst}/bias", b)
        return True

    def norm(dst, src):
        w = g(f"{src}.weight")
        if w is None:
            return False
        _set(params, f"{dst}/scale", w)
        _set(params, f"{dst}/bias", g(f"{src}.bias"))
        return True

    def qkv_dense(dst, src, heads):
        """torch conv1d qkv (3C, C, 1) heads-major [h0:(q,k,v), h1:...] ->
        flax Dense 3C with layout [q(all heads), k, v]."""
        w = g(f"{src}.weight")
        if w is None:
            return False
        b = g(f"{src}.bias")
        c = w.shape[1]
        dh = c // heads
        w = w[:, :, 0].reshape(heads, 3, dh, c)       # (H, 3, dh, C)
        w = np.transpose(w, (1, 0, 2, 3)).reshape(3 * c, c)  # (3*C, C) q-major
        _set(params, f"{dst}/kernel", w.T)
        if b is not None:
            b = b.reshape(heads, 3, dh)
            b = np.transpose(b, (1, 0, 2)).reshape(3 * c)
            _set(params, f"{dst}/bias", b)
        return True

    def proj_dense(dst, src):
        """torch conv1d (C, C, 1) -> flax Dense."""
        w = g(f"{src}.weight")
        if w is None:
            return False
        _set(params, f"{dst}/kernel", w[:, :, 0].T)
        b = g(f"{src}.bias")
        if b is not None:
            _set(params, f"{dst}/bias", b)
        return True

    def resblock(dst, src):
        norm(f"{dst}/in_norm/GroupNorm_0", f"{src}.in_layers.0")
        conv(f"{dst}/in_conv", f"{src}.in_layers.2")
        dense(f"{dst}/emb_proj", f"{src}.emb_layers.1")
        norm(f"{dst}/out_norm/GroupNorm_0", f"{src}.out_layers.0")
        conv(f"{dst}/out_conv", f"{src}.out_layers.3")
        conv(f"{dst}/skip", f"{src}.skip_connection")

    def attn(dst, src, ch, num_head_channels):
        heads = ch // num_head_channels
        norm(f"{dst}/norm/GroupNorm_0", f"{src}.norm")
        qkv_dense(f"{dst}/qkv", f"{src}.qkv", heads)
        proj_dense(f"{dst}/proj_out", f"{src}.proj_out")
        return heads

    dense("time_embed_0", "time_embed.0")
    dense("time_embed_2", "time_embed.2")
    conv("conv_in", "input_blocks.0.0")

    # walk the construction order to map sequential indices to (level, i)
    k = 1
    for level in range(levels):
        for i in range(num_res_blocks):
            resblock(f"in_{level}_{i}_res", f"input_blocks.{k}.0")
            if g(f"input_blocks.{k}.1.qkv.weight") is not None:
                ch = sd[prefix + f"input_blocks.{k}.1.norm.weight"].shape[0]
                attn(f"in_{level}_{i}_attn", f"input_blocks.{k}.1", ch, num_head_channels)
            k += 1
        if level != levels - 1:
            conv(f"down_{level}/op", f"input_blocks.{k}.0.op")
            k += 1

    resblock("mid_res1", "middle_block.0")
    ch = sd[prefix + "middle_block.1.norm.weight"].shape[0]
    attn("mid_attn", "middle_block.1", ch, num_head_channels)
    resblock("mid_res2", "middle_block.2")

    k = 0
    for level in reversed(range(levels)):
        for i in range(num_res_blocks + 1):
            resblock(f"out_{level}_{i}_res", f"output_blocks.{k}.0")
            if g(f"output_blocks.{k}.1.qkv.weight") is not None:
                ch = sd[prefix + f"output_blocks.{k}.1.norm.weight"].shape[0]
                attn(f"out_{level}_{i}_attn", f"output_blocks.{k}.1", ch, num_head_channels)
            # upsample lives at the tail of the last block of the level
            for slot in (1, 2):
                if g(f"output_blocks.{k}.{slot}.conv.weight") is not None:
                    conv(f"up_{level}/conv", f"output_blocks.{k}.{slot}.conv")
            k += 1

    norm("norm_out/GroupNorm_0", "out.0")
    conv("conv_out", "out.2")
    return {"params": params}
