"""Sparse voxel feature extractors for FSVD/FPVD.

Parity: ``lidm/modules/minkowskinet/model.py`` (MinkowskiNet sparse-conv
segmentation net) and ``lidm/modules/spvcnn/model.py`` (SPVCNN point-voxel
net), both used only as frozen feature extractors whose pooled logits feed the
Frechet metrics (``eval/eval_utils.py compute_fsvd/fpvd``).

torchsparse is replaced by ops.voxel fixed-capacity grids; the descriptor
pooling ('depth' aggregation into 16 radial sectors, metric_utils.py:325-371)
matches the reference. Metric parity against published numbers additionally
requires the reference's pretrained weights converted onto these modules.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.sparse_vae import SparseConvBlock
from ..ops.voxel import VoxelGrid, lookup, pool_to_parent, voxelize_points

Array = jax.Array

NUM_SECTORS = 16


@dataclasses.dataclass(frozen=True)
class VoxelNetConfig:
    in_channels: int = 4        # xyz + intensity placeholder
    channels: Tuple[int, ...] = (32, 64, 128)
    out_channels: int = 48      # logit dim -> 48 * 16 sectors = 768-dim FSVD
    voxel_size: float = 0.05
    capacity: int = 16384
    bits: int = 10
    point_branch: bool = False  # True => SPVCNN-style point-voxel fusion


class SparseVoxelNet(nn.Module):
    """Minkowski/SPVCNN-style encoder over a fixed-capacity voxel grid."""

    cfg: VoxelNetConfig

    @nn.compact
    def __call__(self, points: Array, feats: Array, mask: Array
                 ) -> Tuple[Array, Array]:
        """Returns (per-point logits (N, out), validity mask)."""
        cfg = self.cfg
        grid, p2v, _ = voxelize_points(points, mask, cfg.voxel_size,
                                       cfg.capacity, bits=cfg.bits)
        w = mask.astype(feats.dtype)
        num = jnp.zeros((cfg.capacity, feats.shape[-1])).at[p2v].add(
            feats * w[:, None])
        den = jnp.zeros((cfg.capacity,)).at[p2v].add(w)
        x = num / jnp.maximum(den, 1.0)[:, None]
        x = nn.Dense(cfg.channels[0], name="stem")(x) * grid.mask[:, None]

        g = grid
        feats_levels = []
        grids = [g]
        for i, ch in enumerate(cfg.channels):
            x = SparseConvBlock(ch, cfg.bits, name=f"conv{i}a")(g, x)
            x = SparseConvBlock(ch, cfg.bits, name=f"conv{i}b")(g, x)
            feats_levels.append((g, x))
            if i < len(cfg.channels) - 1:
                g, x, _ = pool_to_parent(g, x, max(cfg.capacity >> (i + 1), 8),
                                         cfg.bits)
                x = nn.Dense(cfg.channels[i + 1], name=f"down{i}")(x)
                x = x * g.mask[:, None]
                grids.append(g)

        # upsample back to the finest level with skip adds
        for i in reversed(range(len(cfg.channels) - 1)):
            fine_g, fine_x = feats_levels[i]
            pc = fine_g.coords >> (1 * 1)
            # parent index of each fine voxel at the level above
            pidx, phit = lookup(grids[i + 1], fine_g.coords >> 1, cfg.bits)
            up = jnp.where(phit[:, None], x[pidx], 0.0)
            x = fine_x + nn.Dense(fine_x.shape[-1], name=f"up{i}")(up)
            x = x * fine_g.mask[:, None]
            g = fine_g

        logits_vox = nn.Dense(self.cfg.out_channels, name="head")(x)

        # voxel -> point logits
        out = logits_vox[p2v] * mask[:, None]
        if cfg.point_branch:  # SPVCNN: fuse a per-point MLP branch
            pb = nn.Dense(cfg.channels[0], name="pt_mlp1")(feats)
            pb = nn.relu(pb)
            out = out + nn.Dense(cfg.out_channels, name="pt_head")(pb) \
                * mask[:, None]
        return out, mask


def depth_sector_descriptor(points: Array, logits: Array, mask: Array,
                            depth_range: Tuple[float, float] = (1.0, 56.0),
                            num_sectors: int = NUM_SECTORS) -> Array:
    """Pool per-point logits into radial depth bands -> (out*num_sectors,)
    descriptor (metric_utils.py:351-371 'depth' aggregation)."""
    w = mask.astype(logits.dtype)
    centered = points[:, :2] - (points[:, :2] * w[:, None]).sum(0) \
        / jnp.maximum(w.sum(), 1.0)
    bev_depth = jnp.linalg.norm(centered, axis=-1)

    lo, hi = depth_range[0] + 3.0, depth_range[1]
    edges = jnp.linspace(lo, hi, num_sectors + 1).at[0].set(0.0)

    descs = []
    for i in range(num_sectors):
        sel = (bev_depth >= edges[i]) & (bev_depth < edges[i + 1]) & mask
        sw = sel.astype(logits.dtype)
        mean = (logits * sw[:, None]).sum(0) / jnp.maximum(sw.sum(), 1.0)
        descs.append(jnp.nan_to_num(mean))
    return jnp.concatenate(descs)
