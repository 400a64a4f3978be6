"""Point Transformer V3 — serialized attention over space-filling-curve order.

Parity: ``pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py``
— points sorted along z/z-trans/hilbert/hilbert-trans curves, attention within
fixed patches (default 1024) with the order rotating across blocks, grid
pooling between stages, U-Net decoder with skip connections (:51-223 attention,
:341 pooling, :518 model).

TPU-first re-expression:
  * Fixed capacity everywhere: (N, C) padded arrays + masks; ragged batches are
    flattened with per-point batch ids mixed into the serialization code (the
    reference does the same via offset2batch).
  * Patch attention = reshape to (num_patches, patch, C) + fused MHA — maps
    directly onto the MXU; padding handled by attention masks.
  * Grid pooling = sorted-code head-flag segments + fixed-capacity scatter
    (replaces torch unique/spconv).
  * The sparse-conv xCPE becomes a window-3 conv along the serialized sequence:
    the curve is exactly the locality structure the sparse conv exploits.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.serialization import ORDERS, argsort_with_mask, serialize_code

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PTv3Config:
    in_channels: int = 4
    orders: Tuple[str, ...] = ("z", "z-trans", "hilbert", "hilbert-trans")
    patch_size: int = 1024
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_heads: Tuple[int, ...] = (2, 4, 8, 16, 32)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_channels: Tuple[int, ...] = (64, 64, 128, 256)
    dec_heads: Tuple[int, ...] = (4, 4, 8, 16)
    mlp_ratio: float = 4.0
    grid_size: float = 0.05
    bits: int = 10  # per-axis bits for serialization codes
    drop_path: float = 0.0       # stochastic depth, linspace over blocks
    shuffle_orders: bool = True  # permute serialization orders per level
    enable_rpe: bool = False     # relative position bias in patch attention


def _pad_len(n: int, patch: int) -> int:
    return (-n) % patch


class RPEBias(nn.Module):
    """Relative-position bias table (reference RPE, :29-49): per-axis learned
    table indexed by clamped relative grid coords, summed over xyz."""

    heads: int
    patch_size: int

    @nn.compact
    def __call__(self, rel: Array) -> Array:
        # rel: (npatch, K, K, 3) int relative grid coords
        pos_bnd = int((4 * self.patch_size) ** (1 / 3) * 2)
        rpe_num = 2 * pos_bnd + 1
        table = self.param(
            "rpe_table", nn.initializers.truncated_normal(0.02),
            (3 * rpe_num, self.heads))
        idx = (jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd
               + jnp.arange(3) * rpe_num)                 # (np, K, K, 3)
        out = table[idx].sum(axis=3)                      # (np, K, K, H)
        return out.transpose(0, 3, 1, 2)                  # (np, H, K, K)


class PatchAttention(nn.Module):
    """MHA within fixed patches of the serialized sequence.

    With ``enable_rpe`` the attention runs unfused (logits materialized) so the
    relative-position bias can be added, matching the reference's
    enable_flash=False + RPE path (:182-205).
    """

    heads: int
    patch_size: int
    enable_rpe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array,
                 grid: Optional[Array] = None) -> Array:
        n, c = x.shape
        p = self.patch_size
        pad = _pad_len(n, p)
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        mp = jnp.pad(mask, ((0, pad),))
        npatch = xp.shape[0] // p

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xp)
        qkv = qkv.reshape(npatch, p, 3, self.heads, c // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.enable_rpe:
            assert grid is not None, "enable_rpe needs serialized grid coords"
            gp = jnp.pad(grid, ((0, pad), (0, 0))).reshape(npatch, p, 3)
            rel = gp[:, :, None, :] - gp[:, None, :, :]
            bias = RPEBias(self.heads, p, name="rpe")(rel)  # (np, H, K, K)
            scale = (c // self.heads) ** -0.5
            # (np, K, H, d) -> (np, H, K, d)
            qh = q.transpose(0, 2, 1, 3).astype(jnp.float32) * scale
            kh = k.transpose(0, 2, 1, 3).astype(jnp.float32)
            logits = jnp.einsum("nhkd,nhqd->nhkq", qh, kh) + bias
            logits = jnp.where(mp.reshape(npatch, 1, 1, p), logits, -1e9)
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("nhkq,nqhd->nkhd", w, v)
        else:
            # key-padding mask rides the fused Pallas path as an additive
            # key bias when patch_size qualifies (1024 does); odd/test sizes
            # fall back to XLA inside attend()
            from ..ops.pallas_attention import attend
            attn_mask = mp.reshape(npatch, 1, 1, p)
            out = attend(q, k, v, mask=attn_mask)
        out = out.reshape(npatch * p, c)[:n]
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SerialConvCPE(nn.Module):
    """Conditional positional encoding as a conv along the serialized order
    (stands in for the reference's submanifold sparse-conv xCPE)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        c = x.shape[-1]
        h = (x * mask[:, None])[None, :, :]       # (1, N, C)
        h = nn.Conv(c, (3,), padding=1, feature_group_count=c,
                    dtype=self.dtype, name="dwconv")(h)[0]
        h = nn.Dense(c, dtype=self.dtype, name="proj")(h)
        return x + h * mask[:, None]


class PTv3Block(nn.Module):
    heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    enable_rpe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, order: Array, inverse: Array, mask: Array,
                 grid: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        # Per-point stochastic depth (timm DropPath on an (N, C) feat drops
        # whole rows; reference Block :328-339 wraps attn and mlp branches).
        def dpath(h: Array) -> Array:
            if self.drop_path <= 0.0:
                return h
            return nn.Dropout(self.drop_path, broadcast_dims=(1,),
                              deterministic=deterministic)(h)

        # everything happens in serialized order (incl. the CPE conv, whose
        # window-3 neighborhood is defined along the curve)
        xs = x[order]
        ms = mask[order]
        gs = grid[order] if grid is not None else None
        xs = SerialConvCPE(dtype=self.dtype, name="cpe")(xs, ms)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(xs)
        h = PatchAttention(self.heads, self.patch_size, self.enable_rpe,
                           dtype=self.dtype, name="attn")(h, ms, gs)
        xs = xs + dpath(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(xs)
        h = nn.Dense(int(xs.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_in")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(xs.shape[-1], dtype=self.dtype, name="mlp_out")(h)
        xs = xs + dpath(h)
        return xs[inverse] * mask[:, None]


def grid_pool_segments(codes: Array, mask: Array, capacity: int
                       ) -> Tuple[Array, Array, Array]:
    """Group points by (coarse) code into <=capacity segments.

    Returns (segment_id per point (N,), segment validity (capacity,),
             order (N,) that sorts points by code with padding last).
    Segment ids of padded points point at the dump slot (capacity-1 is safe
    because its contributions are masked out downstream).
    """
    order = argsort_with_mask(codes, mask)
    sc = codes[order]
    sm = mask[order]
    head = jnp.concatenate([jnp.asarray([True]), sc[1:] != sc[:-1]]) & sm
    seg_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg_sorted = jnp.clip(seg_sorted, 0, capacity - 1)
    # scatter back to original point order
    seg = jnp.zeros_like(seg_sorted).at[order].set(seg_sorted)
    n_seg = seg_sorted[-1] + 1  # only valid when sm has any True
    seg_valid = jnp.arange(capacity) < jnp.where(sm.any(), n_seg, 0)
    return seg, seg_valid, order


def segment_mean(x: Array, seg: Array, mask: Array, capacity: int) -> Array:
    w = mask.astype(x.dtype)
    num = jnp.zeros((capacity, x.shape[-1]), x.dtype).at[seg].add(x * w[:, None])
    den = jnp.zeros((capacity,), x.dtype).at[seg].add(w)
    return num / jnp.maximum(den, 1.0)[:, None]


class PTv3(nn.Module):
    """Encoder-decoder PT-v3 over one padded cloud (flatten batches upstream).

    __call__(points (N,3), feats (N,Cin), mask (N,)) -> (N, dec_channels[0]).
    Set ``encoder_only=True`` for the latent pyramid (CubeAE encoder use).
    """

    cfg: PTv3Config
    encoder_only: bool = False
    dtype: jnp.dtype = jnp.float32

    def _order_perm(self, deterministic: bool) -> Array:
        """Per-level permutation of the serialization orders (reference
        SerializedPooling shuffle_orders, :407-411). Identity when
        deterministic so eval stays reproducible."""
        L = len(self.cfg.orders)
        if self.cfg.shuffle_orders and not deterministic and L > 1:
            return jax.random.permutation(self.make_rng("dropout"), L)
        return jnp.arange(L)

    @nn.compact
    def __call__(self, points: Array, feats: Array, mask: Array,
                 deterministic: bool = True):
        cfg = self.cfg
        n = points.shape[0]
        # stochastic-depth schedule: linspace(0, drop_path) over the blocks
        # (reference :604-606, :652-657)
        def dpr(depths: Sequence[int]) -> List[float]:
            tot = sum(depths)
            return [cfg.drop_path * i / max(tot - 1, 1) for i in range(tot)]
        enc_dpr, dec_dpr = dpr(cfg.enc_depths), dpr(cfg.dec_depths)

        origin = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
        grid0 = jnp.floor((points - origin) / cfg.grid_size).astype(jnp.int32)
        grid0 = jnp.clip(grid0, 0, (1 << cfg.bits) - 1)

        x = nn.Dense(cfg.enc_channels[0], dtype=self.dtype, name="embed")(feats)
        x = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(x)
        x = x * mask[:, None]

        grids = [grid0]
        masks = [mask]
        caps = [n]
        skips: List[Tuple[Array, Array, Array]] = []  # (x, seg, order) per level
        seg_infos = []

        # ---------------- encoder ----------------
        for level, (depth, ch, heads) in enumerate(
                zip(cfg.enc_depths, cfg.enc_channels, cfg.enc_heads)):
            g = grids[-1]
            m = masks[-1]
            cap = caps[-1]
            if x.shape[-1] != ch:
                x = nn.Dense(ch, dtype=self.dtype, name=f"enc{level}_proj")(x)

            # per-order serialization at this level
            orders_stack, invs_stack = [], []
            for o in cfg.orders:
                code = serialize_code(g, o, cfg.bits)
                ordr = argsort_with_mask(code, m)
                inv = jnp.zeros_like(ordr).at[ordr].set(jnp.arange(cap))
                orders_stack.append(ordr)
                invs_stack.append(inv)
            orders_stack = jnp.stack(orders_stack)
            invs_stack = jnp.stack(invs_stack)
            perm = self._order_perm(deterministic)

            patch = min(cfg.patch_size, cap)
            base = sum(cfg.enc_depths[:level])
            for b in range(depth):
                sel = perm[b % len(cfg.orders)]
                ordr = jnp.take(orders_stack, sel, axis=0)
                inv = jnp.take(invs_stack, sel, axis=0)
                x = PTv3Block(heads, patch, cfg.mlp_ratio,
                              drop_path=enc_dpr[base + b],
                              enable_rpe=cfg.enable_rpe, dtype=self.dtype,
                              name=f"enc{level}_block{b}")(
                    x, ordr, inv, m, grid=g, deterministic=deterministic)

            if level < len(cfg.enc_depths) - 1:
                # grid pooling: coarsen by 2 (code >> 3 == parent z-cell)
                code = serialize_code(g >> 1, "z", cfg.bits)
                new_cap = max(cap // 2, 1)
                seg, seg_valid, _ = grid_pool_segments(code, m, new_cap)
                skips.append((x, seg, m))
                x = segment_mean(x, seg, m, new_cap)
                new_grid = segment_mean((g >> 1).astype(x.dtype), seg, m,
                                        new_cap).astype(jnp.int32)
                grids.append(new_grid)
                masks.append(seg_valid)
                caps.append(new_cap)
                x = x * seg_valid[:, None]

        if self.encoder_only:
            return x, masks[-1]

        # ---------------- decoder ----------------
        for level in reversed(range(len(cfg.dec_depths))):
            skip_x, seg, fine_mask = skips[level]
            g = grids[level]
            cap = caps[level]
            ch = cfg.dec_channels[level]
            heads = cfg.dec_heads[level]

            # unpool: broadcast coarse features to fine points + skip
            x = x[seg]
            x = nn.Dense(ch, dtype=self.dtype, name=f"dec{level}_up")(x)
            x = x + nn.Dense(ch, dtype=self.dtype, name=f"dec{level}_skip")(skip_x)
            x = x * fine_mask[:, None]

            orders_stack, invs_stack = [], []
            for o in cfg.orders:
                code = serialize_code(g, o, cfg.bits)
                ordr = argsort_with_mask(code, fine_mask)
                inv = jnp.zeros_like(ordr).at[ordr].set(jnp.arange(cap))
                orders_stack.append(ordr)
                invs_stack.append(inv)
            orders_stack = jnp.stack(orders_stack)
            invs_stack = jnp.stack(invs_stack)
            perm = self._order_perm(deterministic)
            patch = min(cfg.patch_size, cap)
            # per-stage reversed slice of the decoder linspace (reference
            # :655-657: dec_drop_path_.reverse())
            base = sum(cfg.dec_depths[:level])
            stage_rates = dec_dpr[base: base + cfg.dec_depths[level]][::-1]
            for b in range(cfg.dec_depths[level]):
                sel = perm[b % len(cfg.orders)]
                ordr = jnp.take(orders_stack, sel, axis=0)
                inv = jnp.take(invs_stack, sel, axis=0)
                x = PTv3Block(heads, patch, cfg.mlp_ratio,
                              drop_path=stage_rates[b],
                              enable_rpe=cfg.enable_rpe, dtype=self.dtype,
                              name=f"dec{level}_block{b}")(
                    x, ordr, inv, fine_mask, grid=g,
                    deterministic=deterministic)
        return x, masks[0]


class PTv3Segmentor(nn.Module):
    """PT-v3 backbone + per-point linear seg head.

    Parity: ``pointcept/models/default.py`` DefaultSegmentorV2 (backbone ->
    seg_head Linear, CE loss handled by the trainer). Drives the ptv3.py
    dense-decoder config family.
    """

    backbone_cfg: PTv3Config
    num_classes: int = 16
    backbone_out_channels: int = 64

    @nn.compact
    def __call__(self, points: Array, feats: Array, mask: Array,
                 deterministic: bool = True) -> Array:
        h, _ = PTv3(self.backbone_cfg, name="backbone")(
            points, feats, mask, deterministic=deterministic)
        h = nn.Dense(self.backbone_out_channels, name="neck")(h)
        h = jax.nn.gelu(h)
        logits = nn.Dense(self.num_classes, name="seg_head")(h)
        return logits * mask[:, None]
