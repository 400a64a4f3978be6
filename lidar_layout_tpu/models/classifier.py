"""Noisy-latent classifier for classifier guidance.

Parity: ``lidm/models/diffusion/classifier.py:28-267`` NoisyLatentImageClassifier
— an EncoderUNetModel (the downsampling half of the diffusion U-Net + attention
pool) trained on q_sample'd latents; its input gradient steers sampling.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import Normalize, nonlinearity
from ..nn.embeddings import timestep_embedding
from .schedules import DiffusionSchedule, q_sample
from .unet import ResBlock, UNetDown, _conv3

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    in_channels: int = 8
    model_channels: int = 64
    num_classes: int = 10
    num_res_blocks: int = 1
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    timesteps: int = 1024
    cconv: bool = True


class EncoderUNetModel(nn.Module):
    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, x: Array, timesteps: Array) -> Array:
        cfg = self.cfg
        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_dim, name="t0")(emb)
        emb = nn.Dense(time_dim, name="t2")(nonlinearity(emb))

        h = _conv3(cfg.model_channels, cfg.cconv, jnp.float32, "conv_in")(x)
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, cconv=cfg.cconv,
                             name=f"enc_{level}_{i}")(h, emb)
            if level != len(cfg.channel_mult) - 1:
                h = UNetDown(cfg.cconv, name=f"down_{level}")(h)

        h = Normalize(act=True, name="norm_out")(h)
        pooled = h.mean(axis=(1, 2))  # spatial pool
        return nn.Dense(cfg.num_classes, name="head")(pooled)


class NoisyLatentClassifier:
    def __init__(self, cfg: ClassifierConfig, diffusion_schedule=None):
        self.cfg = cfg
        self.schedule = diffusion_schedule or DiffusionSchedule.create(
            timesteps=cfg.timesteps, linear_start=0.0015, linear_end=0.0195)
        self.net = EncoderUNetModel(cfg)

    def init(self, rng: Array, latent_shape: Tuple[int, int, int]) -> Dict:
        x = jnp.zeros((1, *latent_shape))
        t = jnp.zeros((1,), jnp.int32)
        return self.net.init(rng, x, t)

    def loss(self, params, rng: Array, z0: Array, labels: Array
             ) -> Tuple[Array, Dict]:
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (z0.shape[0],), 0, self.cfg.timesteps)
        z_noisy = q_sample(self.schedule, z0, t,
                           jax.random.normal(r_n, z0.shape))
        logits = self.net.apply(params, z_noisy, t)
        loss = -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(len(labels)), labels])
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    def guidance_grad(self, params, z: Array, t: Array, target: Array) -> Array:
        """d log p(y|z_t) / d z_t — added to the score during guided sampling."""
        def logp(zz):
            logits = self.net.apply(params, zz, t)
            return jnp.sum(jax.nn.log_softmax(logits)[
                jnp.arange(len(target)), target])
        return jax.grad(logp)(z)
