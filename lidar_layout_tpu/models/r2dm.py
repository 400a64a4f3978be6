"""R2DM baseline: pixel-space range diffusion with an efficient ring-conv U-Net.

Parity: ``lidm/models/diffusion/ddpm_r2dm.py:11`` R2DMDiffusion (depth+intensity
2-channel 32x1024 images, pixel-space DDPM) and
``lidm/modules/unets/efficient_unet.py:188`` EfficientUNet (ring=True circular
convs, Fourier coordinate encoding appended to the input,
``unets/encoding.py:133``).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import Normalize, nonlinearity
from ..nn.conv import CircularConv
from ..nn.embeddings import timestep_embedding
from .schedules import DiffusionSchedule, q_sample

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class R2DMConfig:
    image_size: Tuple[int, int] = (32, 1024)
    channels: int = 2                  # depth + intensity
    base_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    coord_bands: int = 6               # fourier coordinate encoding
    timesteps: int = 1024
    beta_schedule: str = "cosine"
    loss_type: str = "l2"


def coord_encoding(h: int, w: int, bands: int) -> jnp.ndarray:
    """(H, W, 4*bands) Fourier features of normalized pixel coords; the azimuth
    axis uses the full angle so the encoding respects the 360-degree wrap."""
    import numpy as np

    yy = (np.arange(h) + 0.5) / h                 # [0, 1]
    xx = (np.arange(w) + 0.5) / w * 2 * np.pi     # wraps
    feats = []
    for b in range(bands):
        k = 2.0 ** b
        feats.append(np.broadcast_to(np.sin(k * xx)[None, :], (h, w)))
        feats.append(np.broadcast_to(np.cos(k * xx)[None, :], (h, w)))
        feats.append(np.broadcast_to(np.sin(k * np.pi * yy)[:, None], (h, w)))
        feats.append(np.broadcast_to(np.cos(k * np.pi * yy)[:, None], (h, w)))
    return jnp.asarray(np.stack(feats, -1), jnp.float32)


class EffResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        h = Normalize(name="n1")(x)
        h = nonlinearity(h)
        h = CircularConv(self.out_channels, (3, 3), (1, 1), 1, name="c1")(h)
        h = h + nn.Dense(self.out_channels, name="emb")(nonlinearity(emb)
                                                        )[:, None, None, :]
        h = Normalize(name="n2")(h)
        h = nonlinearity(h)
        h = CircularConv(self.out_channels, (3, 3), (1, 1), 1, name="c2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class EfficientUNet(nn.Module):
    cfg: R2DMConfig

    @nn.compact
    def __call__(self, x: Array, timesteps: Array) -> Array:
        cfg = self.cfg
        b, h, w, _ = x.shape
        coords = jnp.broadcast_to(coord_encoding(h, w, cfg.coord_bands)[None],
                                  (b, h, w, 4 * cfg.coord_bands))
        x_in = jnp.concatenate([x, coords], axis=-1)

        time_dim = cfg.base_channels * 4
        emb = timestep_embedding(timesteps, cfg.base_channels)
        emb = nn.Dense(time_dim, name="t0")(emb)
        emb = nn.Dense(time_dim, name="t2")(nonlinearity(emb))

        hh = CircularConv(cfg.base_channels, (3, 3), (1, 1), 1, name="conv_in")(x_in)
        skips = [hh]
        for lvl, mult in enumerate(cfg.channel_mult):
            ch = cfg.base_channels * mult
            for i in range(cfg.num_res_blocks):
                hh = EffResBlock(ch, name=f"down_{lvl}_{i}")(hh, emb)
                skips.append(hh)
            if lvl != len(cfg.channel_mult) - 1:
                hh = CircularConv(ch, (3, 3), (2, 2), (0, 1, 0, 1),
                                  name=f"down_{lvl}_pool")(hh)
                skips.append(hh)

        hh = EffResBlock(hh.shape[-1], name="mid")(hh, emb)

        for lvl in reversed(range(len(cfg.channel_mult))):
            ch = cfg.base_channels * cfg.channel_mult[lvl]
            for i in range(cfg.num_res_blocks + 1):
                hh = jnp.concatenate([hh, skips.pop()], axis=-1)
                hh = EffResBlock(ch, name=f"up_{lvl}_{i}")(hh, emb)
            if lvl != 0:
                bb, hh_, ww_, cc = hh.shape
                hh = jax.image.resize(hh, (bb, hh_ * 2, ww_ * 2, cc), "nearest")
                hh = CircularConv(ch, (3, 3), (1, 1), 1, name=f"up_{lvl}_conv")(hh)

        hh = Normalize(name="norm_out")(hh)
        hh = nonlinearity(hh)
        return nn.Conv(cfg.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros, name="conv_out")(hh)


class R2DMDiffusion:
    """Pixel-space DDPM over (depth, intensity) range images."""

    def __init__(self, cfg: R2DMConfig):
        self.cfg = cfg
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps, beta_schedule=cfg.beta_schedule)
        self.unet = EfficientUNet(cfg)

    def init(self, rng: Array) -> Dict:
        h, w = self.cfg.image_size
        x = jnp.zeros((1, h, w, self.cfg.channels))
        t = jnp.zeros((1,), jnp.int32)
        return {"unet": self.unet.init(rng, x, t)}

    def p_losses(self, params, rng: Array, x0: Array) -> Tuple[Array, Dict]:
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (x0.shape[0],), 0, self.cfg.timesteps)
        noise = jax.random.normal(r_n, x0.shape)
        x_noisy = q_sample(self.schedule, x0, t, noise)
        out = self.unet.apply(params["unet"], x_noisy, t)
        if self.cfg.loss_type == "l2":
            loss = jnp.mean((out - noise) ** 2)
        else:
            loss = jnp.mean(jnp.abs(out - noise))
        return loss, {"loss": loss}

    def apply_model(self, params, x: Array, t: Array, cond=None) -> Array:
        return self.unet.apply(params["unet"], x, t)
