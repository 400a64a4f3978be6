"""KL-autoencoder objective (LPIPSWithDiscriminator).

Parity: ``lidm/modules/losses/contperceptual.py:9-110`` — reconstruction
(pixel + optional perceptual) + KL regularization weighted by logvar, plus the
same hinge-GAN/adaptive-weight machinery as the VQ loss (reused from vq_loss).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.autoencoder import DiagonalGaussian
from .vq_loss import VQLossConfig, reconstruction_nll
from .geometric import GeoConverter

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KLLossConfig:
    kl_weight: float = 1e-6
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 0.0
    logvar_init: float = 0.0


def kl_autoencoder_loss(cfg: KLLossConfig, geo: GeoConverter, inputs: Array,
                        reconstructions: Array, posterior: DiagonalGaussian,
                        logvar: Array,
                        perceptual_fn: Optional[Callable] = None
                        ) -> Tuple[Array, Dict[str, Array]]:
    """NLL side of the KL-AE generator loss (contperceptual.py:42-78):
    rec = |x - x_rec| (+ perceptual); nll = rec / exp(logvar) + logvar;
    loss = nll + kl_weight * KL(posterior || N(0, I))."""
    rec = jnp.abs(inputs - reconstructions)
    if cfg.perceptual_weight > 0 and perceptual_fn is not None:
        rec = rec + cfg.perceptual_weight * perceptual_fn(inputs,
                                                          reconstructions)
    nll = rec / jnp.exp(logvar) + logvar
    nll = jnp.sum(nll) / nll.shape[0]
    kl = jnp.sum(posterior.kl()) / posterior.mean.shape[0]
    loss = nll + cfg.kl_weight * kl
    return loss, {"loss": loss, "nll_loss": nll, "kl_loss": kl,
                  "rec_loss": rec.mean()}
