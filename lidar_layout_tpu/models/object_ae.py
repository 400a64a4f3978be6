"""Per-object point-cloud autoencoder (G2SD grid-to-shape, VQModel_Object).

Parity: ``lidm/models/ae/autoencoder_object.py:9`` VQModel_Object wrapping the
full G2SD (``lidm/modules/encoders/object_encoder.py:199-248``):
  CdwExtractor backbone (:167-184): NbrAgg knn local aggregation ->
  ResSMLP(32,64) -> ResSMLP(128,128 w/ global-max concat) -> fuse SMLP(352,512)
  -> [global max ++ attention pool] -> FC 1024-512-1024 codeword,
  and the two-stage folding decoder (:199-218): a sqrt(G)x sqrt(G) 2D lattice
  folded to 3D twice, conditioned on the 1024-d codeword.

Note the reference's forward path never quantizes (autoencoder_object.py:93-96
encode->decode directly — "VQ" in name only); an optional VectorQuantizer is
kept behind ``quantize_latent`` for the config surface.

TPU-first: knn via ``ops.pointops.knn_query`` (one matmul + top_k instead of
the chamferdist CUDA kernel); all SMLPs are batched matmuls on fixed-size
clouds. BatchNorm1d/2d is replaced by LayerNorm (documented deviation — no
cross-step running stats to thread through the explicit-pytree trainers).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.quantize import VectorQuantizer
from ..ops.chamfer import chamfer_loss
from ..ops.pointops import knn_query

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ObjectAEConfig:
    num_points: int = 512      # input cloud size
    num_grids: int = 1024      # folded output size (grid_size**2)
    num_neighbors: int = 16    # NbrAgg knn
    cdw_dim: int = 1024        # codeword width (object_encoder.py:175 fc)
    # optional VQ over the codeword (off in the reference forward path)
    quantize_latent: bool = False
    n_embed: int = 512
    embed_dim: int = 64
    # legacy fields accepted by the round-1 config surface
    latent_tokens: int = 16
    width: int = 128


class SMLP(nn.Module):
    """Shared point MLP: 1x1 conv + norm + relu (object_encoder.py:89-123)."""

    oc: int
    norm: bool = True
    act: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Dense(self.oc, use_bias=False)(x)
        if self.norm:
            y = nn.LayerNorm()(y)
        if self.act == "relu":
            y = jax.nn.relu(y)
        return y


class ResSMLP(nn.Module):
    """Residual SMLP block (object_encoder.py:125-143)."""

    oc: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = SMLP(x.shape[-1], act="none", name="smlp_1")(x)
        h = SMLP(self.oc, act="none", name="smlp_2")(jax.nn.relu(h))
        if x.shape[-1] != self.oc:
            x = SMLP(self.oc, act="none", name="shortcut")(x)
        return jax.nn.relu(x + h)


class NbrAgg(nn.Module):
    """knn local geometry aggregation (object_encoder.py:145-165)."""

    num_neighbors: int = 16
    oc: int = 32

    @nn.compact
    def __call__(self, pts: Array) -> Array:
        n = pts.shape[0]
        k = self.num_neighbors
        idx, _ = knn_query(pts, pts, k + 1)          # (N, K+1), self first
        knn_pts = pts[idx]                           # (N, K+1, 3)
        abs_pts = knn_pts[:, :1]
        rel = knn_pts[:, 1:] - abs_pts               # (N, K, 3)
        dist = jnp.sqrt((rel ** 2).sum(-1, keepdims=True) + 1e-8)
        concat = jnp.concatenate(
            [jnp.broadcast_to(abs_pts, (n, k, 3)), rel, dist], -1)  # (N,K,7)
        h = SMLP(16, name="smlp_1a")(concat)
        h = SMLP(self.oc, name="smlp_1b")(h)
        pooled = h.max(axis=1)                       # (N, oc)
        lifted = SMLP(self.oc, name="smlp_2")(pts)
        return SMLP(self.oc, name="smlp_3")(
            jnp.concatenate([lifted, pooled], -1))


class AttPool(nn.Module):
    """Softmax attention pooling over points (object_encoder.py:186-197)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scores = jax.nn.softmax(
            nn.Dense(x.shape[-1], use_bias=False)(x), axis=0)
        return (x * scores).sum(axis=0)


class CdwExtractor(nn.Module):
    """Cloud -> 1024-d codeword (object_encoder.py:167-184)."""

    cfg: ObjectAEConfig

    @nn.compact
    def __call__(self, pts: Array) -> Array:
        n = pts.shape[0]
        f1 = NbrAgg(self.cfg.num_neighbors, 32, name="loc_agg")(pts)
        f2 = ResSMLP(64, name="res_smlp_1")(f1)
        f3 = ResSMLP(128, name="res_smlp_2")(jnp.concatenate(
            [f2, jnp.broadcast_to(f2.max(0, keepdims=True), (n, 64))], -1))
        f4 = SMLP(512, name="fuse")(jnp.concatenate(
            [f1, f2, f3,
             jnp.broadcast_to(f3.max(0, keepdims=True), (n, 128))], -1))
        pooled = jnp.concatenate([f4.max(0), AttPool(name="att_pool")(f4)])
        h = SMLP(512, norm=True, name="fc1")(pooled)
        h = SMLP(1024, norm=True, name="fc2")(h)
        return nn.Dense(self.cfg.cdw_dim, use_bias=False, name="fc3")(h)


def build_lattice(grid_size: int) -> np.ndarray:
    """(G, 2) grid points in (0, 1) (object_encoder.py:8-19)."""
    margin = 1e-4
    p = np.linspace(margin, 1 - margin, grid_size, dtype=np.float32)
    return np.stack(np.meshgrid(p, p, indexing="ij"), -1).reshape(-1, 2)


class FoldingDecoder(nn.Module):
    """Two-stage folding of a 2D lattice to 3D (object_encoder.py:199-218)."""

    cfg: ObjectAEConfig

    @nn.compact
    def __call__(self, cdw: Array) -> Array:
        g = self.cfg.num_grids
        grid_size = int(np.sqrt(g))
        assert grid_size * grid_size == g, "num_grids must be a square"
        grids = jnp.asarray(build_lattice(grid_size))           # (G, 2)
        cdw_dup = jnp.broadcast_to(cdw[None], (g, cdw.shape[-1]))

        h = jnp.concatenate([cdw_dup, grids], -1)               # (G, 1026)
        for i, c in enumerate((256, 128, 64)):
            h = SMLP(c, name=f"fold1_{i}")(h)
        rec1 = nn.Dense(3, use_bias=False, name="fold1_out")(h)

        h = jnp.concatenate([cdw_dup, rec1], -1)                # (G, 1027)
        for i, c in enumerate((256, 128, 64)):
            h = SMLP(c, name=f"fold2_{i}")(h)
        return nn.Dense(3, use_bias=False, name="fold2_out")(h)


class VQModelObject(nn.Module):
    cfg: ObjectAEConfig

    def setup(self):
        self.encoder = CdwExtractor(self.cfg)
        self.decoder = FoldingDecoder(self.cfg)
        if self.cfg.quantize_latent:
            self.quantize = VectorQuantizer(self.cfg.n_embed,
                                            self.cfg.embed_dim)

    def encode(self, points: Array) -> Array:
        return self.encoder(points)

    def decode(self, cdw: Array) -> Array:
        return self.decoder(cdw)

    def __call__(self, points: Array) -> Tuple[Array, Array, Array]:
        cdw = self.encoder(points)
        if self.cfg.quantize_latent:
            tokens = cdw.reshape(-1, self.cfg.embed_dim)
            quant, qloss, ind = self.quantize(tokens)
            cdw = quant.reshape(cdw.shape)
        else:
            qloss = jnp.zeros((), cdw.dtype)
            ind = jnp.zeros((1,), jnp.int32)
        rec = self.decoder(cdw)
        return rec, qloss, ind


def object_ae_loss(rec: Array, target: Array, qloss: Array,
                   codebook_weight: float = 1.0) -> Tuple[Array, Dict]:
    l_cd = chamfer_loss(rec, target)
    loss = l_cd + codebook_weight * qloss
    return loss, {"rec_loss": l_cd, "quant_loss": qloss, "loss": loss}
