"""Hierarchical sparse-voxel VAE — the XCube-style refinement stage.

Parity: ``lidm/models/ae/autoencoder_cube.py:16`` CubeAEModel (3-level hash
tree at 0.1 m base, point->voxel features, structure prediction per level) +
``lidm/modules/xcube/sunet.py:230`` StructPredictionNet (per-level encoders,
KL bottleneck, per-level struct logits) + ``lidm/modules/losses/xcube_loss.py``
(per-depth CE on child occupancy + KL anneal).

fvdb is replaced by ops.voxel fixed-capacity sorted-code grids; sparse convs
are 27-neighbor gathers + one MXU matmul (SparseConvBlock).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.voxel import (VoxelGrid, build_grid, gather_neighbors,
                         occupancy_targets, pool_to_parent, subdivide,
                         voxelize_points)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SparseVAEConfig:
    num_levels: int = 3
    base_capacity: int = 4096       # finest-level voxel capacity
    channels: Tuple[int, ...] = (32, 64, 128)
    latent_dim: int = 16
    voxel_size: float = 0.1
    bits: int = 10
    kl_weight: float = 1e-3

    def capacity(self, level: int) -> int:
        return max(self.base_capacity >> level, 8)


class SparseConvBlock(nn.Module):
    """3^3 'sparse conv': neighbor gather + single matmul + norm + silu."""

    features: int
    bits: int = 10

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array) -> Array:
        cap, c = x.shape
        nb = gather_neighbors(grid, x, self.bits)        # (cap, 27, C)
        h = nb.reshape(cap, 27 * c)
        h = nn.Dense(self.features, name="w")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h)
        h = jax.nn.silu(h)
        if c == self.features:
            h = h + x
        return h * grid.mask[:, None]


class SparseVAE(nn.Module):
    """Encode a point cloud into a coarse sparse latent; decode structure.

    __call__ returns a dict with the latent (mean/logvar at the coarsest
    level), per-level structure logits and their occupancy targets — the
    training losses are assembled by ``struct_loss``.
    """

    cfg: SparseVAEConfig

    @nn.compact
    def __call__(self, points: Array, feats: Array, mask: Array, rng: Array
                 ) -> Dict:
        cfg = self.cfg

        # ---- build the hash-tree hierarchy (autoencoder_cube.py:143-187) ----
        grid0, p2v, _ = voxelize_points(points, mask, cfg.voxel_size,
                                        cfg.capacity(0), bits=cfg.bits)
        # scatter point features into voxels (mean)
        w = mask.astype(feats.dtype)
        num = jnp.zeros((cfg.capacity(0), feats.shape[-1]), feats.dtype
                        ).at[p2v].add(feats * w[:, None])
        den = jnp.zeros((cfg.capacity(0),), feats.dtype).at[p2v].add(w)
        x = num / jnp.maximum(den, 1.0)[:, None]
        x = nn.Dense(cfg.channels[0], name="stem")(x) * grid0.mask[:, None]

        grids: List[VoxelGrid] = [grid0]
        feats_pyramid: List[Array] = []

        # ---- encoder: conv + pool per level ----
        for lvl in range(cfg.num_levels):
            ch = cfg.channels[lvl]
            x = SparseConvBlock(ch, cfg.bits, name=f"enc{lvl}_conv1")(grids[lvl], x)
            x = SparseConvBlock(ch, cfg.bits, name=f"enc{lvl}_conv2")(grids[lvl], x)
            feats_pyramid.append(x)
            if lvl < cfg.num_levels - 1:
                pgrid, x, _ = pool_to_parent(grids[lvl], x,
                                             cfg.capacity(lvl + 1), cfg.bits)
                x = nn.Dense(cfg.channels[lvl + 1],
                             name=f"enc{lvl}_down")(x) * pgrid.mask[:, None]
                grids.append(pgrid)

        # ---- KL bottleneck at the coarsest level (sunet pre/post KL) ----
        top = grids[-1]
        moments = nn.Dense(2 * cfg.latent_dim, name="to_moments")(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        z = z * top.mask[:, None]

        # ---- decoder: per-level struct logits + upsampled features ----
        h = nn.Dense(cfg.channels[-1], name="from_latent")(z) * top.mask[:, None]
        struct_logits: List[Array] = []
        targets: List[Array] = []
        dec_grids = [top]
        for lvl in reversed(range(cfg.num_levels - 1)):
            g = dec_grids[-1]
            h = SparseConvBlock(h.shape[-1], cfg.bits,
                                name=f"dec{lvl}_conv")(g, h)
            logits = nn.Dense(8, name=f"dec{lvl}_struct")(h)   # children occ
            struct_logits.append(logits)
            targets.append(occupancy_targets(g, grids[lvl], cfg.bits))

            # descend to the true child grid (teacher forcing, as the
            # reference trains with GT structure)
            child = grids[lvl]
            # features for children: gather parent feature
            pc = child.coords >> 1
            from ..ops.voxel import lookup
            pidx, phit = lookup(g, pc, cfg.bits)
            h = jnp.where(phit[:, None], h[pidx], 0.0)
            h = nn.Dense(cfg.channels[lvl], name=f"dec{lvl}_up")(h)
            h = h * child.mask[:, None]
            dec_grids.append(child)

        return {
            "latent_mean": mean, "latent_logvar": logvar, "latent": z,
            "latent_grid": top,
            "struct_logits": struct_logits, "struct_targets": targets,
            "grids": grids, "decoded_feats": h,
        }


def struct_loss(out: Dict, kl_weight: float = 1e-3
                ) -> Tuple[Array, Dict[str, Array]]:
    """xcube_loss parity: per-level BCE on child occupancy + KL."""
    total = 0.0
    logs = {}
    for i, (logits, target) in enumerate(zip(out["struct_logits"],
                                             out["struct_targets"])):
        bce = optax_sigmoid_bce(logits, target)
        parent_mask = out["struct_targets"][i].sum(-1) >= 0  # all rows
        l = bce.mean()
        total = total + l
        logs[f"struct_ce_{i}"] = l

    mean, logvar = out["latent_mean"], out["latent_logvar"]
    m = out["latent_grid"].mask[:, None]
    kl = 0.5 * jnp.sum((mean**2 + jnp.exp(logvar) - 1.0 - logvar) * m) \
        / jnp.maximum(m.sum(), 1.0)
    total = total + kl_weight * kl
    logs["kl"] = kl
    logs["loss"] = total
    return total, logs


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p
