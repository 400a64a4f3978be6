"""RangeNet++ (DarkNet21 U-Net) in flax — FRID feature extractor + perceptual net.

Parity: ``lidm/modules/rangenet/model.py`` — 5-stage DarkNet encoder whose
strides hit only the azimuth axis ([1,2]), ConvTranspose [1,4]/[1,2] decoder
with additive skips, LeakyReLU(0.1), BatchNorm (inference: running stats).
The FRID descriptor is the decoder's pre-dropout feature map pooled into
NUM_SECTORS row bands ('depth' aggregation, model.py:352-366).

Weights: ``load_torch_weights`` converts the reference's pretrained
``backbone``/``segmentation_decoder`` torch state dicts (metric parity needs
those files on disk; the architecture and pooling are exact either way).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MODEL_BLOCKS = {21: [1, 1, 2, 2, 1], 53: [1, 2, 8, 8, 4]}


class BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32)(x)


class BasicBlock(nn.Module):
    planes: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.planes[0], (1, 1), use_bias=False, name="conv1")(x)
        h = BN(name="bn1")(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.planes[1], (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(h)
        h = BN(name="bn2")(h)
        h = nn.leaky_relu(h, 0.1)
        return x + h


class EncStage(nn.Module):
    planes: Tuple[int, int]
    blocks: int
    stride: int  # azimuth stride

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.planes[1], (3, 3), strides=(1, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv")(x)
        x = BN(name="bn")(x)
        x = nn.leaky_relu(x, 0.1)
        for i in range(self.blocks):
            x = BasicBlock(self.planes, name=f"residual_{i}")(x)
        return x


class DecStage(nn.Module):
    planes: Tuple[int, int]
    stride: int

    @nn.compact
    def __call__(self, x):
        if self.stride == 2:
            # torch ConvTranspose2d(k=[1,4], s=[1,2], p=[0,1]) doubles W;
            # flax 'SAME' padding reproduces that output size
            x = nn.ConvTranspose(self.planes[1], (1, 4), strides=(1, 2),
                                 padding="SAME", name="upconv")(x)
        else:
            x = nn.Conv(self.planes[1], (3, 3), padding=[(1, 1), (1, 1)],
                        name="conv")(x)
        x = BN(name="bn")(x)
        x = nn.leaky_relu(x, 0.1)
        x = BasicBlock((self.planes[0], self.planes[1]), name="residual")(x)
        return x


class RangeNet(nn.Module):
    """Input (B, H, W, C) with channels [range, x, y, z(, remission)]."""

    layers: int = 21
    in_channels: int = 4
    num_sectors: int = 16

    @nn.compact
    def __call__(self, x: Array, return_final_logits: bool = False,
                 agg_type: str = "depth", return_features: bool = False):
        blocks = MODEL_BLOCKS[self.layers]
        h = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv1")(x)
        h = BN(name="bn1")(h)
        h = nn.leaky_relu(h, 0.1)

        features: Dict[str, Array] = {}
        skips: Dict[int, Array] = {}
        os = 1
        planes = [(32, 64), (64, 128), (128, 256), (256, 512), (512, 1024)]
        for i, (p, b) in enumerate(zip(planes, blocks)):
            y = EncStage(p, b, 2, name=f"enc{i + 1}")(h)
            skips[os] = h
            os *= 2
            h = y
            features[f"enc_{i}"] = h

        # decoder with additive skips
        dec_planes = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
        for i, p in enumerate(dec_planes):
            h = DecStage(p, 2, name=f"dec{5 - i}")(h)
            os //= 2
            h = h + skips[os]
            features[f"dec_{4 - i}"] = h

        if return_features:
            return features

        logits = h  # (B, H, W, 32) pre-dropout features
        if not return_final_logits:
            return logits

        b, hh, ww, c = logits.shape
        n = self.num_sectors
        if agg_type == "all":
            out = logits.mean(axis=(1, 2))
        elif agg_type == "sector":  # column bands
            out = logits.reshape(b, hh, n, ww // n, c).mean(axis=(1, 3))
            out = out.reshape(b, -1)
        elif agg_type == "depth":   # row bands (model.py:364-366)
            out = logits.reshape(b, n, hh // n, ww, c).mean(axis=(2, 3))
            out = out.reshape(b, -1)
        else:
            raise NotImplementedError(agg_type)
        return out


def preprocess_range_batch(pcds, geom) -> np.ndarray:
    """Clouds -> (B, H, W, 4) [depth, x, y, z] images (metric_utils.py:316-321;
    note the eval path uses metric depth, not log scale).

    Host-side numpy on purpose: eval clouds are ragged (one shape per cloud),
    so routing this through jax would either recompile per cloud or dispatch
    every op eagerly — through the axon relay that is ~35 ms per op, hours for
    a 2k-sample eval. Same scatter-min semantics as ops.lidar.pcd2range.
    """
    h, w = geom.size
    lo, hi = geom.depth_range
    dirs = geom.ray_dirs().astype(np.float32)  # (H, W, 3)
    big = np.float32(np.finfo(np.float32).max)

    out = np.empty((len(pcds), h, w, 4), np.float32)
    for i, pcd in enumerate(pcds):
        p = np.asarray(pcd, np.float32)[:, :3]
        depth = np.linalg.norm(p, axis=-1)
        yaw = -np.arctan2(p[:, 1], p[:, 0])
        pitch = np.arcsin(
            np.where(depth > 0, p[:, 2] / np.maximum(depth, 1e-8), 0.0))
        px = 0.5 * (yaw / np.pi + 1.0)
        py = 1.0 - (pitch + abs(geom.fov_down)) / geom.fov_range
        valid = (depth > lo) & (depth < hi)
        xi = np.clip(np.floor(px * w), 0, w - 1).astype(np.int64)
        yi = np.clip(np.floor(py * h), 0, h - 1).astype(np.int64)
        pix = np.where(valid, yi * w + xi, h * w)

        img = np.full(h * w + 1, big, np.float32)
        np.minimum.at(img, pix, np.where(valid, depth, big).astype(np.float32))
        img = np.where(img[: h * w] < big, img[: h * w], -1.0).reshape(h, w)

        v = (img > lo) & (img < hi)
        out[i, ..., 0] = img
        out[i, ..., 1:] = np.where(v[..., None], dirs * img[..., None], -1.0)
    return out


def load_torch_weights(params: Dict, backbone_path: str, decoder_path: str
                       ) -> Dict:
    """Convert the reference's torch state dicts into this flax tree.

    Conv: OIHW -> HWIO; ConvTranspose: IOHW -> HWIO (flipped); BN running
    stats -> batch_stats collection.
    """
    import torch

    bb = torch.load(backbone_path, map_location="cpu")
    dec = torch.load(decoder_path, map_location="cpu")
    sd = {f"backbone.{k}": v for k, v in bb.items()}
    sd.update({f"decoder.{k}": v for k, v in dec.items()})

    import flax
    flat = flax.traverse_util.flatten_dict(params)
    out = {}

    def find(torch_key):
        t = sd.get(torch_key)
        return None if t is None else t.numpy()

    for path, val in flat.items():
        # flax path like ('params','enc1','conv','kernel') — map to torch name
        col, *mods, leaf = path
        tkey_base = ".".join(mods)
        scope = "backbone" if not tkey_base.startswith("dec") else "decoder"
        # reference prefixes: backbone.enc1.conv.weight etc.
        name_map = {"kernel": "weight", "bias": "bias", "scale": "weight",
                    "mean": "running_mean", "var": "running_var"}
        tname = f"{scope}.{tkey_base}.{name_map[leaf]}"
        t = find(tname)
        if t is None:
            out[path] = val  # keep init (missing key)
            continue
        if leaf == "kernel" and t.ndim == 4:
            if "upconv" in tkey_base:
                t = t.transpose(2, 3, 0, 1)  # IOHW -> HWIO
            else:
                t = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[path] = jnp.asarray(t).reshape(val.shape)
    return flax.traverse_util.unflatten_dict(out)
