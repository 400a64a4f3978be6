"""PatchGAN discriminators for the VQ-GAN objective.

Parity: ``lidm/modules/losses/discriminator.py`` — NLayerDiscriminator (v0,
pix2pix PatchGAN) and LiDARNLayerDiscriminator (v1, circular convs with (1,2)
strides so the receptive field respects the panoramic wrap), plus a PointNet
discriminator for the 1D object AE.

TPU note: BatchNorm is replaced by GroupNorm — batch statistics are a poor fit
for SPMD (would require cross-replica sync for exact parity) and GroupNorm is the
standard drop-in; the discriminator only shapes gradients, not metrics.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.conv import CircularConv

Array = jax.Array


def _norm(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name)


class NLayerDiscriminator(nn.Module):
    """pix2pix PatchGAN (discriminator.py:11-61): stride-2 4x4 convs."""

    ndf: int = 64
    n_layers: int = 3
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.ndf, (4, 4), (2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), (2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"conv_{n}")(h)
            h = _norm(f"norm_{n}")(h.astype(jnp.float32)).astype(h.dtype)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), (1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv_last")(h)
        h = _norm("norm_last")(h.astype(jnp.float32)).astype(h.dtype)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_channels, (4, 4), (1, 1), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv_out")(h)


class LiDARNLayerDiscriminator(nn.Module):
    """LiDAR PatchGAN (discriminator.py:63-113): circular 4x4 convs, stride (1,2)
    so only the azimuth axis is downsampled (pad (1,2,1,2))."""

    ndf: int = 64
    n_layers: int = 3
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kw, pad = (4, 4), (1, 2, 1, 2)
        h = CircularConv(self.ndf, kw, (1, 2), pad, dtype=self.dtype, name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = CircularConv(self.ndf * nf, kw, (1, 2), pad, use_bias=False,
                             dtype=self.dtype, name=f"conv_{n}")(h)
            h = _norm(f"norm_{n}")(h.astype(jnp.float32)).astype(h.dtype)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = CircularConv(self.ndf * nf, kw, (1, 1), pad, use_bias=False,
                         dtype=self.dtype, name="conv_last")(h)
        h = _norm("norm_last")(h.astype(jnp.float32)).astype(h.dtype)
        h = nn.leaky_relu(h, 0.2)
        return CircularConv(self.out_channels, kw, (1, 1), pad, dtype=self.dtype,
                            name="conv_out")(h)


class PointNetDiscriminator(nn.Module):
    """PointNet classifier/critic for per-object point AEs (discriminator.py:242)."""

    cls_num: int = 10
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: Array) -> Tuple[Array, Array]:
        # points: (B, N, 3)
        h = points
        for i, f in enumerate([self.width, self.width * 2, self.width * 4]):
            h = nn.Dense(f, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = nn.relu(h)
        g = jnp.max(h, axis=1)  # global max-pool
        logits_cls = nn.Dense(self.cls_num, dtype=self.dtype, name="cls_head")(g)
        logits_critic = nn.Dense(1, dtype=self.dtype, name="critic_head")(g)
        return logits_cls, logits_critic


DISCRIMINATORS = {"v0": NLayerDiscriminator, "v1": LiDARNLayerDiscriminator,
                  "v2": LiDARNLayerDiscriminator}


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real)) +
                  jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))
