"""Latent diffusion over sparse-voxel latents (the "cube" stage).

Parity: ``lidm/models/diffusion/ddpm_cube.py:12`` CubeLatentDiffusion — latent
diffusion over the SparseVAE's coarse grid, per-grid timesteps scattered to
voxels (:127-131), positional embedding of ijk (:64-68); denoiser parity:
``lidm/modules/unets/unet_sparse.py:161`` UNetModel_Sparse (sparse convs +
sparse attention); sampler parity: DDIMCubeSampler (``ddim.py:403-604``).

The fvdb VDBTensor becomes (VoxelGrid, feats, mask); the grid topology is
fixed during sampling (the reference also samples on given grids).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.embeddings import timestep_embedding
from ..ops.voxel import VoxelGrid
from .schedules import DDIMSchedule, DiffusionSchedule, q_sample
from .sparse_vae import SparseConvBlock

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SparseUNetConfig:
    in_channels: int = 16
    model_channels: int = 64
    num_blocks: int = 4
    num_heads: int = 4
    bits: int = 10


class VoxelAttention(nn.Module):
    """Global self-attention over the (masked) voxel set."""

    heads: int

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        n, c = x.shape
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        qkv = nn.Dense(3 * c, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(n, 3, self.heads, c // self.heads),
                            3, axis=1)
        q, k, v = q[:, 0][None], k[:, 0][None], v[:, 0][None]  # (1,N,H,D)
        attn_mask = mask[None, None, None, :]
        out = jax.nn.dot_product_attention(q, k, v, mask=attn_mask)[0]
        out = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       name="proj")(out.reshape(n, c))
        return (x + out) * mask[:, None]


class SparseUNet(nn.Module):
    """Sparse denoiser: ijk positional embedding + timestep FiLM + interleaved
    sparse convs and voxel attention (UNetModel_Sparse equivalent)."""

    cfg: SparseUNetConfig

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array, t: Array,
                 cond: Optional[Array] = None) -> Array:
        cfg = self.cfg
        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(time_dim, name="time_0")(emb)
        emb = nn.Dense(time_dim, name="time_2")(jax.nn.silu(emb))  # (N, D)

        # positional embedding of ijk (ddpm_cube.py:64-68)
        pos = grid.coords.astype(jnp.float32)
        pos = pos / jnp.maximum(pos.max(), 1.0)
        h = nn.Dense(cfg.model_channels, name="in_proj")(x)
        h = h + nn.Dense(cfg.model_channels, name="pos_proj")(pos)
        if cond is not None:
            h = h + nn.Dense(cfg.model_channels, name="cond_proj")(cond)
        h = h * grid.mask[:, None]

        for i in range(cfg.num_blocks):
            film = nn.Dense(2 * cfg.model_channels, name=f"film_{i}")(
                jax.nn.silu(emb))
            scale, shift = jnp.split(film, 2, axis=-1)
            h = h * (1 + scale) + shift
            h = SparseConvBlock(cfg.model_channels, cfg.bits,
                                name=f"conv_{i}")(grid, h)
            if i % 2 == 1:
                h = VoxelAttention(cfg.num_heads, name=f"attn_{i}")(h, grid.mask)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(h)
        out = nn.Dense(cfg.in_channels, kernel_init=nn.initializers.zeros,
                       name="out")(h)
        return out * grid.mask[:, None]


@dataclasses.dataclass(frozen=True)
class CubeDiffusionConfig:
    timesteps: int = 1000
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    latent_dim: int = 16


class CubeDiffusion:
    """Diffusion over (grid, latent) pairs; one shared t per grid, scattered to
    its voxels (ddpm_cube.py:125-131)."""

    def __init__(self, cfg: CubeDiffusionConfig, unet_cfg: SparseUNetConfig):
        self.cfg = cfg
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps, linear_start=cfg.linear_start,
            linear_end=cfg.linear_end)
        self.unet = SparseUNet(unet_cfg)

    def init(self, rng: Array, grid: VoxelGrid) -> Dict:
        cap = grid.coords.shape[0]
        z = jnp.zeros((cap, self.cfg.latent_dim))
        t = jnp.zeros((cap,), jnp.int32)
        return {"unet": self.unet.init(rng, grid, z, t)}

    def p_losses(self, params, rng: Array, grid: VoxelGrid, z0: Array,
                 cond: Optional[Array] = None) -> Tuple[Array, Dict]:
        r_t, r_n = jax.random.split(rng)
        cap = z0.shape[0]
        t_grid = jax.random.randint(r_t, (), 0, self.cfg.timesteps)
        t = jnp.full((cap,), t_grid, jnp.int32)  # shared per grid

        noise = jax.random.normal(r_n, z0.shape)
        z_noisy = q_sample(self.schedule, z0, t, noise)
        z_noisy = z_noisy * grid.mask[:, None]
        out = self.unet.apply(params["unet"], grid, z_noisy, t, cond)

        m = grid.mask.astype(z0.dtype)[:, None]
        loss = jnp.sum(((out - noise) ** 2) * m) / (jnp.maximum(m.sum(), 1.0)
                                                   * z0.shape[-1])
        return loss, {"loss": loss}

    def ddim_sample(self, params, rng: Array, grid: VoxelGrid,
                    steps: int = 50, eta: float = 0.0,
                    cond: Optional[Array] = None) -> Array:
        cap = grid.coords.shape[0]
        d = DDIMSchedule.create(self.schedule, steps, eta)
        ts = jnp.asarray(d.timesteps[::-1].copy(), jnp.int32)
        a_t = jnp.asarray(d.alphas[::-1].copy(), jnp.float32)
        a_prev = jnp.asarray(d.alphas_prev[::-1].copy(), jnp.float32)
        s1ma = jnp.asarray(d.sqrt_one_minus_alphas[::-1].copy(), jnp.float32)
        sig = jnp.asarray(d.sigmas[::-1].copy(), jnp.float32)

        rng, r0 = jax.random.split(rng)
        z = jax.random.normal(r0, (cap, self.cfg.latent_dim)) * grid.mask[:, None]
        keys = jax.random.split(rng, len(d.timesteps))

        def body(z, inp):
            r, tt, at, ap, s, sg = inp
            t = jnp.full((cap,), tt, jnp.int32)
            e = self.unet.apply(params["unet"], grid, z, t, cond)
            x0 = (z - s * e) / jnp.sqrt(at)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap - sg**2, 0.0)) * e
            z = jnp.sqrt(ap) * x0 + dir_xt + sg * jax.random.normal(r, z.shape)
            return z * grid.mask[:, None], 0.0

        z, _ = jax.lax.scan(body, z, (keys, ts, a_t, a_prev, s1ma, sig))
        return z
