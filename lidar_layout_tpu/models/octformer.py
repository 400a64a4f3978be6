"""OctFormer (OctFormer-v1m1): octree patch attention over z-order sequences.

Parity: ``pointcept/models/octformer/octformer_v1m1_base.py``
  OctreeT patch partition / dilation masks (:34-113), MLP (:114), OctreeDWConvBn
  conditional position encoding (:143-161), quantized-xyz RPE (:163-194),
  OctreeAttention with dilation (:196-274), OctFormerBlock (:275-317),
  OctFormerStage (:318-378), FPN OctFormerDecoder (:380-428), PatchEmbed
  (:430-480), Downsample (:482-506), OctFormer (:508-628).

TPU-first re-design (not a translation — the reference needs the ocnn + dwconv
CUDA libraries):
  * The octree's nonempty-octant sequence at depth d IS a z-order-sorted voxel
    table: ``ops.voxel.build_grid`` over ``coords >> level`` reproduces
    octree coarsening, and the sorted order equals ocnn's shuffled-key order
    (``ops.serialization.z_order_code``). No pointers, no octree structure.
  * Patch partition = reshape of the fixed-capacity sorted table into
    ``(n_patches, K)`` rows + validity mask; dilated attention is the same
    ``(-1, K, D) -> transpose`` view trick as the reference (:232-236) — pure
    reshapes of a static-shape array.
  * OctreeDWConvBn (the dwconv CUDA kernel) = 27-stencil ``gather_neighbors``
    with per-channel (depthwise) weights — one masked contraction.
  * ocnn's OctreeInterp("nearest") decoder upsampling = parent-code lookup
    from fine to coarse tables.
  * BatchNorm -> masked LayerNorm (batch-stat-free), as across this repo.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxel import (VoxelGrid, build_grid, gather_neighbors, lookup,
                         voxelize_points)

Array = jax.Array


@dataclass(frozen=True)
class OctFormerConfig:
    """Defaults mirror OctFormer.__init__ (:509-525) at test-friendly scale."""

    in_channels: int = 4
    num_classes: int = 13
    fpn_channels: int = 168
    channels: Tuple[int, ...] = (96, 192, 384, 384)
    num_blocks: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 24)
    patch_size: int = 26
    dilation: int = 4
    drop_path: float = 0.5
    stem_down: int = 2
    voxel_size: float = 0.05
    capacity: int = 8192          # finest-level (post-stem) voxel table
    bits: int = 10
    rpe_quant: int = 8            # RPE table half-extent in voxels

    @property
    def num_stages(self) -> int:
        return len(self.channels)


def _norm(name: str):
    return nn.LayerNorm(dtype=jnp.float32, name=name)


class OctreeDWConv(nn.Module):
    """Depthwise 3^3 stencil conv + norm — the CPE of OctFormerBlock
    (:143-161); replaces the dwconv CUDA kernel."""

    features: int
    bits: int = 10

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array) -> Array:
        nb = gather_neighbors(grid, x, bits=self.bits)      # (cap, 27, C)
        w = self.param("w", nn.initializers.normal(0.02),
                       (27, self.features))
        h = (nb * w[None]).sum(axis=1)
        return _norm("bn")(h) * grid.mask[:, None]


class OctreeAttention(nn.Module):
    """Patch attention with optional dilation + quantized-xyz RPE (:196-274)."""

    dim: int
    num_heads: int
    patch_size: int
    dilation: int = 1
    use_rpe: bool = True
    rpe_quant: int = 8
    bits: int = 10

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array) -> Array:
        cap, c = x.shape
        K, D, H = self.patch_size, self.dilation, self.num_heads
        hd = c // H
        block = K * D
        pad = (-cap) % block
        n = cap + pad

        def part(t, fill):
            t = jnp.pad(t, [(0, pad)] + [(0, 0)] * (t.ndim - 1),
                        constant_values=fill)
            if D > 1:
                # (-1, K, D, C) -> transpose(1, 2): every D-th row per patch
                t = t.reshape(-1, K, D, *t.shape[1:]).swapaxes(1, 2)
                return t.reshape(-1, K, *t.shape[3:])
            return t.reshape(-1, K, *t.shape[1:])

        xm = part(x, 0.0)                                   # (P, K, C)
        vm = part(grid.mask, False)                         # (P, K)
        cm = part(grid.coords, 0)                           # (P, K, 3)

        qkv = nn.Dense(3 * c, name="qkv")(xm).reshape(-1, K, 3, H, hd)
        q, k, v = (qkv[:, :, i].swapaxes(1, 2) for i in range(3))  # (P,H,K,hd)
        attn = jnp.einsum("phkd,phmd->phkm", q * (hd ** -0.5), k)

        if self.use_rpe:                                    # RPE (:163-194)
            L = self.rpe_quant
            table = self.param("rpe_table", nn.initializers.normal(0.02),
                               (2 * L + 1, H, 3))
            rel = cm[:, :, None, :] - cm[:, None, :, :]     # (P, K, K, 3)
            rel = jnp.clip(rel + L, 0, 2 * L)
            bias = sum(table[rel[..., d], :, d] for d in range(3))
            attn = attn + bias.transpose(0, 3, 1, 2)

        neg = jnp.finfo(attn.dtype).min
        attn = jnp.where(vm[:, None, None, :], attn, neg)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.where(vm[:, None, :, None], attn, 0.0)
        out = jnp.einsum("phkm,phmd->phkd", attn, v)
        out = out.swapaxes(1, 2).reshape(-1, c)             # back to sequence
        if D > 1:
            out = out.reshape(-1, D, K, c).swapaxes(1, 2).reshape(-1, c)
        out = out[:cap]
        return nn.Dense(c, name="proj")(out) * grid.mask[:, None]


class OctFormerBlock(nn.Module):
    """CPE + attention + MLP with residuals (:275-317)."""

    cfg: OctFormerConfig
    dim: int
    num_heads: int
    dilation: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array,
                 deterministic: bool = True) -> Array:
        def dp(t):
            if self.drop_path <= 0.0:
                return t
            return nn.Dropout(self.drop_path, broadcast_dims=(1,),
                              deterministic=deterministic)(t)

        x = x + OctreeDWConv(self.dim, self.cfg.bits, name="cpe")(grid, x)
        h = OctreeAttention(self.dim, self.num_heads, self.cfg.patch_size,
                            self.dilation, rpe_quant=self.cfg.rpe_quant,
                            bits=self.cfg.bits,
                            name="attn")(grid, _norm("norm1")(x))
        x = x + dp(h)
        m = nn.Dense(self.dim * 4, name="mlp_fc1")(_norm("norm2")(x))
        m = nn.Dense(self.dim, name="mlp_fc2")(jax.nn.gelu(m))
        return (x + dp(m)) * grid.mask[:, None]


class Downsample(nn.Module):
    """Octree coarsening conv: 8 children -> parent (:482-506)."""

    features: int
    capacity: int
    bits: int = 10

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array
                 ) -> Tuple[VoxelGrid, Array]:
        pgrid, _ = build_grid(grid.coords >> 1, grid.mask, self.capacity,
                              self.bits)
        offs = jnp.asarray([[i, j, k] for i in (0, 1) for j in (0, 1)
                            for k in (0, 1)], jnp.int32)
        parts = []
        for o in range(8):
            q = (pgrid.coords << 1) + offs[o][None]
            idx, hit = lookup(grid, q, self.bits)
            parts.append(jnp.where(hit[:, None], x[idx], 0.0))
        h = jnp.concatenate(parts, axis=-1)
        h = nn.Dense(self.features, use_bias=False, name="w")(h)
        return pgrid, _norm("norm")(h) * pgrid.mask[:, None]


class OctFormer(nn.Module):
    """Full backbone + FPN decoder + seg head over one padded cloud
    (:508-628): ``(coord (N,3), feat (N,C), mask) -> (N, num_classes)``."""

    cfg: OctFormerConfig

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        grid, p2v, _ = voxelize_points(coord, mask, cfg.voxel_size,
                                       cfg.capacity, bits=cfg.bits)
        w = mask.astype(feat.dtype)
        num = jnp.zeros((cfg.capacity, feat.shape[-1])).at[p2v].add(
            feat * w[:, None])
        den = jnp.zeros((cfg.capacity,)).at[p2v].add(w)
        x = num / jnp.maximum(den, 1.0)[:, None]

        # PatchEmbed: stem convs + stem_down coarsenings (:430-480)
        x = OctreeDWConv(feat.shape[-1], cfg.bits, name="stem_conv")(grid, x)
        x = nn.Dense(cfg.channels[0], name="stem_proj")(x)
        x = nn.relu(_norm("stem_norm")(x)) * grid.mask[:, None]
        g = grid
        for s in range(cfg.stem_down):
            g, x = Downsample(cfg.channels[0],
                              max(cfg.capacity >> (s + 1), 64), cfg.bits,
                              name=f"stem_down{s}")(g, x)

        dpr = [cfg.drop_path * i / max(sum(cfg.num_blocks) - 1, 1)
               for i in range(sum(cfg.num_blocks))]
        feats, grids = [], []
        cap = max(cfg.capacity >> cfg.stem_down, 64)
        for i in range(cfg.num_stages):
            for b in range(cfg.num_blocks[i]):
                dil = 1 if b % 2 == 0 else cfg.dilation  # alternate (:318)
                x = OctFormerBlock(cfg, cfg.channels[i], cfg.num_heads[i],
                                   dil, dpr[sum(cfg.num_blocks[:i]) + b],
                                   name=f"stage{i}_block{b}")(
                    g, x, deterministic)
            feats.append(x)
            grids.append(g)
            if i < cfg.num_stages - 1:
                cap = max(cap >> 1, 64)
                g, x = Downsample(cfg.channels[i + 1], cap, cfg.bits,
                                  name=f"down{i}")(g, x)

        # FPN decoder (:380-428): 1x1 to fpn_channels, top-down nearest
        # (parent-lookup) upsampling + sum, collect at the finest stage grid
        out = None
        for i in reversed(range(cfg.num_stages)):
            lat = nn.Dense(cfg.fpn_channels, name=f"fpn_lat{i}")(feats[i])
            lat = lat * grids[i].mask[:, None]
            if out is None:
                out = lat
            else:
                pidx, phit = lookup(grids[i + 1],
                                    grids[i].coords >> 1, cfg.bits)
                up = jnp.where(phit[:, None], out[pidx], 0.0)
                out = lat + up
        g0 = grids[0]
        out = nn.relu(_norm("fpn_norm")(out)) * g0.mask[:, None]

        # lift to the original points: nearest voxel at the stage-0 grid
        lvl = cfg.stem_down
        pcoords = jnp.clip(
            jnp.floor((coord - jnp.min(jnp.where(mask[:, None], coord,
                                                 jnp.inf), axis=0))
                      / cfg.voxel_size).astype(jnp.int32),
            0, (1 << cfg.bits) - 1) >> lvl
        idx, hit = lookup(g0, pcoords, cfg.bits)
        pf = jnp.where((hit & mask)[:, None], out[idx], 0.0)

        h = nn.relu(_norm("head_norm")(nn.Dense(cfg.fpn_channels,
                                                name="head_fc1")(pf)))
        return nn.Dense(cfg.num_classes, name="head_fc2")(h) * mask[:, None]
