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
    num_res_blocks: int = 2            # int or per-level tuple (ref: (3,3,3,3))
    coord_bands: int = 6               # fourier coordinate encoding bands
    # "fourier_features" | "spherical_harmonics" | "polar_coordinates" | None
    # (efficient_unet.py:287-300 coords_encoding; ref default is SH levels=5)
    coords_encoding: str = "fourier_features"
    sh_levels: int = 5
    attn_levels: Tuple[int, ...] = (3,)   # deepest level, ref d/u_block4
    attn_num_heads: int = 8
    timesteps: int = 1024
    beta_schedule: str = "cosine"
    loss_type: str = "l2"
    parameterization: str = "eps"   # generic-sampler contract

    def blocks_at(self, lvl: int) -> int:
        n = self.num_res_blocks
        return n[lvl] if isinstance(n, (tuple, list)) else n


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


def polar_dirs(h: int, w: int):
    """Unit view directions of the range grid (encoding.generate_polar_coords):
    elevation spans rows top-down, azimuth wraps across columns."""
    import numpy as np

    el = (0.5 - (np.arange(h) + 0.5) / h) * np.pi  # (+pi/2 .. -pi/2)
    az = ((np.arange(w) + 0.5) / w * 2 - 1) * np.pi
    el, az = np.meshgrid(el, az, indexing="ij")
    return np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], -1)


def sh_coord_encoding(h: int, w: int, levels: int) -> jnp.ndarray:
    """(H, W, levels**2) real-SH basis of the per-pixel view direction
    (encoding.SphericalHarmonics(levels=5), efficient_unet.py:292). Computed
    host-side once — the grid is static."""
    import numpy as np

    try:  # scipy >= 1.15
        from scipy.special import sph_harm_y
        def _sh(m, l, az, pol):
            return sph_harm_y(l, m, pol, az)
    except ImportError:
        from scipy.special import sph_harm
        def _sh(m, l, az, pol):
            return sph_harm(m, l, az, pol)

    d = polar_dirs(h, w)
    theta = np.arccos(np.clip(d[..., 2], -1, 1))        # polar angle
    phi = np.arctan2(d[..., 1], d[..., 0])              # azimuth
    feats = []
    for l in range(levels):
        for m in range(-l, l + 1):
            y = _sh(abs(m), l, phi, theta)
            if m < 0:
                feats.append(np.sqrt(2) * y.imag)
            elif m == 0:
                feats.append(y.real)
            else:
                feats.append(np.sqrt(2) * y.real)
    return jnp.asarray(np.stack(feats, -1), jnp.float32)


def polar_coord_encoding(h: int, w: int) -> jnp.ndarray:
    """Raw (H, W, 3) unit-direction channels (coords_encoding='polar_coordinates')."""
    import numpy as np

    return jnp.asarray(polar_dirs(h, w), jnp.float32)


class EffSelfAttention(nn.Module):
    """GN -> flattened MHA -> residual (efficient_unet.py:23-53), used at the
    deepest resolution where the sequence is short enough for full attention."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = Normalize(name="norm")(x).reshape(b, h * w, c)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                            name="attn")(y, y)
        return x + y.reshape(b, h, w, c)


class EffResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        h = Normalize(act=True, name="n1")(x)
        h = CircularConv(self.out_channels, (3, 3), (1, 1), 1, name="c1")(h)
        h = h + nn.Dense(self.out_channels, name="emb")(nonlinearity(emb)
                                                        )[:, None, None, :]
        h = Normalize(act=True, name="n2")(h)
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
        if cfg.coords_encoding == "spherical_harmonics":
            coords = sh_coord_encoding(h, w, cfg.sh_levels)
        elif cfg.coords_encoding == "polar_coordinates":
            coords = polar_coord_encoding(h, w)
        elif cfg.coords_encoding == "fourier_features":
            coords = coord_encoding(h, w, cfg.coord_bands)
        else:
            coords = None
        if coords is not None:
            coords = jnp.broadcast_to(coords[None], (b, h, w, coords.shape[-1]))
            x_in = jnp.concatenate([x, coords], axis=-1)
        else:
            x_in = x

        time_dim = cfg.base_channels * 4
        emb = timestep_embedding(timesteps, cfg.base_channels)
        emb = nn.Dense(time_dim, name="t0")(emb)
        emb = nn.Dense(time_dim, name="t2")(nonlinearity(emb))

        hh = CircularConv(cfg.base_channels, (3, 3), (1, 1), 1, name="conv_in")(x_in)
        skips = [hh]
        for lvl, mult in enumerate(cfg.channel_mult):
            ch = cfg.base_channels * mult
            for i in range(cfg.blocks_at(lvl)):
                hh = EffResBlock(ch, name=f"down_{lvl}_{i}")(hh, emb)
                skips.append(hh)
            if lvl in cfg.attn_levels:  # ref: d_block4 attn=True
                hh = EffSelfAttention(cfg.attn_num_heads,
                                      name=f"down_{lvl}_attn")(hh)
                skips[-1] = hh
            if lvl != len(cfg.channel_mult) - 1:
                hh = CircularConv(ch, (3, 3), (2, 2), (0, 1, 0, 1),
                                  name=f"down_{lvl}_pool")(hh)
                skips.append(hh)

        hh = EffResBlock(hh.shape[-1], name="mid")(hh, emb)

        for lvl in reversed(range(len(cfg.channel_mult))):
            ch = cfg.base_channels * cfg.channel_mult[lvl]
            for i in range(cfg.blocks_at(lvl) + 1):
                hh = jnp.concatenate([hh, skips.pop()], axis=-1)
                hh = EffResBlock(ch, name=f"up_{lvl}_{i}")(hh, emb)
            if lvl in cfg.attn_levels:  # ref: u_block4 attn=True
                hh = EffSelfAttention(cfg.attn_num_heads,
                                      name=f"up_{lvl}_attn")(hh)
            if lvl != 0:
                bb, hh_, ww_, cc = hh.shape
                hh = jax.image.resize(hh, (bb, hh_ * 2, ww_ * 2, cc), "nearest")
                hh = CircularConv(ch, (3, 3), (1, 1), 1, name=f"up_{lvl}_conv")(hh)

        hh = Normalize(act=True, name="norm_out")(hh)
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

    def eps_from_model_out(self, x_t: Array, t: Array, out: Array) -> Array:
        """eps parameterization: the model predicts noise directly. Makes the
        generic DDIM/PLMS/DDPM samplers (models/samplers.py) work on R2DM,
        matching the reference's ContinuousTimeGaussianDiffusion sampling
        (r2dm uses the shared sampler stack in scripts/sample.py)."""
        return out
