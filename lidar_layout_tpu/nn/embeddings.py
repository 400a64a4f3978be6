"""Timestep / positional embeddings (parity: lidm/modules/basic.py:278-296 and
lidm/modules/diffusion/model_lidm.py:14-32)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(timesteps: Array, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True) -> Array:
    """Sinusoidal embeddings of (N,) timesteps -> (N, dim).

    ``flip_sin_to_cos=True`` matches the guided-diffusion U-Net convention
    (basic.py:291 concat [cos, sin]); ``False`` matches the DDPM/fairseq
    convention used by the AE backbone (model_lidm.py:29 concat [sin, cos]).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def fourier_features(x: Array, num_bands: int, max_freq: float = 10.0) -> Array:
    """Fourier positional features for coordinate inputs (efficient_unet encoding)."""
    freqs = 2.0 ** jnp.linspace(0.0, max_freq, num_bands)
    xf = x[..., None] * freqs
    return jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1).reshape(*x.shape[:-1], -1)
