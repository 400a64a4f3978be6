"""Point Transformer V1: vector attention with FPS/kNN transition pyramid.

Parity: ``pointcept/models/point_transformer/point_transformer_seg.py`` —
PointTransformerLayer (:19-80), TransitionDown (:83-119, FPS + kNN group +
maxpool), TransitionUp (:122-168, head mean-context / interp fusion),
Bottleneck (:171-194), PointTransformerSeg (:197-305) with the Seg26/38/50
block counts (:308-327).

TPU-first re-design (same conventions as models/ptv2.py):
  - one padded cloud ``(N, 3)`` + mask per call; fixed per-stage capacities
    ``N // stride`` instead of dynamic offset bookkeeping;
  - FPS from ``ops.pointops.farthest_point_sample`` (masked): the first
    ``min(capacity, n_valid)`` selections are distinct valid points, which
    defines the coarse mask;
  - kNN grouping is a dense distance matmul (MXU) + gather;
  - BatchNorm1d -> masked LayerNorm (f32), batch-stat-free for SPMD.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointops import farthest_point_sample, knn_query, three_nn_interpolate

Array = jax.Array


@dataclass(frozen=True)
class PTv1Config:
    """Defaults mirror PointTransformerSeg.__init__ (:199-204)."""

    in_channels: int = 6
    num_classes: int = 13
    blocks: Tuple[int, ...] = (1, 2, 3, 5, 2)       # Seg50 (:322-327)
    planes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[int, ...] = (1, 4, 4, 4, 4)
    nsamples: Tuple[int, ...] = (8, 16, 16, 16, 16)
    share_planes: int = 8


def _norm(name: str):
    return nn.LayerNorm(dtype=jnp.float32, name=name)


class PointTransformerLayer(nn.Module):
    """Vector attention over kNN with positional encoding (:19-80)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array) -> Array:
        c, s = self.planes, self.share_planes
        k = min(self.nsample, coord.shape[0])
        idx, _ = knn_query(coord, coord, k, points_mask=mask)
        valid = mask[idx] & mask[:, None]

        q = nn.Dense(c, name="linear_q")(feat)
        key = nn.Dense(c, name="linear_k")(feat)
        v = nn.Dense(c, name="linear_v")(feat)

        pos = coord[idx] - coord[:, None, :]
        # linear_p: 3 -> 3 -> LN/relu -> planes (:28-33)
        pr = nn.Dense(3, name="p_fc1")(pos)
        pr = jax.nn.relu(_norm("p_norm")(pr))
        pr = nn.Dense(c, name="p_fc2")(pr)

        r_qk = key[idx] - q[:, None, :] + pr
        # linear_w: LN/relu -> c/s -> LN/relu -> c/s (:34-41)
        w = jax.nn.relu(_norm("w_norm1")(r_qk))
        w = nn.Dense(c // s, name="w_fc1")(w)
        w = jax.nn.relu(_norm("w_norm2")(w))
        w = nn.Dense(c // s, name="w_fc2")(w)          # (N, K, c/s)
        w = jnp.where(valid[..., None], w, -jnp.inf)
        w = jax.nn.softmax(w, axis=1)
        w = jnp.where(valid[..., None], w, 0.0)

        val = (v[idx] + pr).reshape(*idx.shape, s, c // s)
        out = jnp.einsum("nksi,nki->nsi", val, w)      # (:73-78)
        return out.reshape(-1, c)


class TransitionDown(nn.Module):
    """stride>1: FPS + kNN neighborhood max-pool; stride==1: linear (:83-119).

    Returns (coord', feat', mask') with capacity = N // stride.
    """

    planes: int
    stride: int = 1
    nsample: int = 16

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array
                 ) -> Tuple[Array, Array, Array]:
        if self.stride == 1:
            h = nn.Dense(self.planes, use_bias=False, name="linear")(feat)
            return coord, jax.nn.relu(_norm("norm")(h)) * mask[:, None], mask

        m = max(coord.shape[0] // self.stride, 1)
        idx = farthest_point_sample(coord, m, mask=mask)
        new_coord = coord[idx]
        # the first min(m, n_valid) FPS picks are distinct valid points
        n_valid = jnp.minimum(jnp.sum(mask), m)
        new_mask = jnp.arange(m) < n_valid

        k = min(self.nsample, coord.shape[0])
        nbr, _ = knn_query(new_coord, coord, k, points_mask=mask)
        rel = coord[nbr] - new_coord[:, None, :]
        grouped = jnp.concatenate([rel, feat[nbr]], axis=-1)   # with_xyz (:104-113)
        h = nn.Dense(self.planes, use_bias=False, name="linear")(grouped)
        h = jax.nn.relu(_norm("norm")(h))
        nbr_valid = mask[nbr] & new_mask[:, None]
        h = jnp.where(nbr_valid[..., None], h, -jnp.inf)
        h = jnp.max(h, axis=1)                                  # MaxPool1d (:116)
        h = jnp.where(jnp.isfinite(h), h, 0.0)
        return new_coord, h * new_mask[:, None], new_mask


class TransitionUp(nn.Module):
    """Head: concat global-mean context; else: fine + interp(coarse) (:122-168)."""

    planes: int
    is_head: bool = False

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array,
                 coarse_coord=None, coarse_feat=None, coarse_mask=None) -> Array:
        if self.is_head:
            w = mask.astype(feat.dtype)
            mean = jnp.sum(feat * w[:, None], axis=0) / jnp.maximum(w.sum(), 1.0)
            ctx = jax.nn.relu(nn.Dense(self.planes, name="linear2")(mean))
            h = jnp.concatenate(
                [feat, jnp.broadcast_to(ctx, (feat.shape[0], self.planes))], -1)
            h = nn.Dense(self.planes, name="linear1")(h)
            return jax.nn.relu(_norm("norm1")(h)) * mask[:, None]
        h1 = nn.Dense(self.planes, name="linear1")(feat)
        h1 = jax.nn.relu(_norm("norm1")(h1))
        h2 = nn.Dense(self.planes, name="linear2")(coarse_feat)
        h2 = jax.nn.relu(_norm("norm2")(h2))
        up = three_nn_interpolate(coord, coarse_coord, h2,
                                  points_mask=coarse_mask)
        return (h1 + up) * mask[:, None]


class Bottleneck(nn.Module):
    """linear -> vector attention -> linear residual block (:171-194)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array) -> Array:
        identity = feat
        h = jax.nn.relu(_norm("norm1")(nn.Dense(
            self.planes, use_bias=False, name="linear1")(feat)))
        h = PointTransformerLayer(self.planes, self.share_planes, self.nsample,
                                  name="transformer")(coord, h, mask)
        h = jax.nn.relu(_norm("norm2")(h))
        h = _norm("norm3")(nn.Dense(self.planes, use_bias=False, name="linear3")(h))
        return jax.nn.relu(identity + h) * mask[:, None]


class PointTransformerSeg(nn.Module):
    """5-stage U-shaped PT-v1 over one padded cloud (:197-305).

    __call__(coord (N,3), feat (N,Cin), mask (N,)) -> (N, num_classes).
    """

    cfg: PTv1Config

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array) -> Array:
        cfg = self.cfg
        stages = len(cfg.planes)

        # encoder
        levels = []
        c, f, m = coord, feat, mask
        for i in range(stages):
            c, f, m = TransitionDown(cfg.planes[i], cfg.strides[i],
                                     cfg.nsamples[i], name=f"enc{i}_down")(c, f, m)
            for b in range(cfg.blocks[i]):
                f = Bottleneck(cfg.planes[i], cfg.share_planes, cfg.nsamples[i],
                               name=f"enc{i}_block{b}")(c, f, m)
            levels.append((c, f, m))

        # decoder: dec5 head transforms the coarsest level, then fuse upward
        # (:286-291); one bottleneck per decoder stage (dec blocks=1)
        c, f, m = levels[-1]
        f = TransitionUp(cfg.planes[-1], is_head=True, name=f"dec{stages-1}_up")(
            c, f, m)
        f = Bottleneck(cfg.planes[-1], cfg.share_planes, cfg.nsamples[-1],
                       name=f"dec{stages-1}_block")(c, f, m)
        coarse = (c, f, m)
        for i in reversed(range(stages - 1)):
            c, f, m = levels[i]
            f = TransitionUp(cfg.planes[i], name=f"dec{i}_up")(
                c, f, m, coarse_coord=coarse[0], coarse_feat=coarse[1],
                coarse_mask=coarse[2])
            f = Bottleneck(cfg.planes[i], cfg.share_planes, cfg.nsamples[i],
                           name=f"dec{i}_block")(c, f, m)
            coarse = (c, f, m)

        # cls head (:259-264)
        h = jax.nn.relu(_norm("cls_norm")(nn.Dense(
            cfg.planes[0], name="cls_fc1")(f)))
        return nn.Dense(cfg.num_classes, name="cls_fc2")(h) * mask[:, None]


def seg26(**kw) -> PointTransformerSeg:
    return PointTransformerSeg(PTv1Config(blocks=(1, 1, 1, 1, 1), **kw))


def seg38(**kw) -> PointTransformerSeg:
    return PointTransformerSeg(PTv1Config(blocks=(1, 2, 2, 2, 2), **kw))


def seg50(**kw) -> PointTransformerSeg:
    return PointTransformerSeg(PTv1Config(blocks=(1, 2, 3, 5, 2), **kw))
