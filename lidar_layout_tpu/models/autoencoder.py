"""Range-image autoencoders: curve-wise-conv VQ-GAN and KL variants.

Parity targets:
  - Encoder/Decoder backbone: ``lidm/modules/diffusion/model_lidm.py:222,315``
    (asymmetric strides e.g. [[1,2],[2,2],[2,2]] = curve factor c2 x patch factor p4;
    decoder uses (1,4) horizontal kernels).
  - VQModel / VQModelInterface: ``lidm/models/ae/autoencoder.py:15-303`` — taming VQ,
    quant/post-quant 1x1 convs, ``use_mask`` two-channel decode with ray-drop
    (channel 1 < 0 => pixel := -1).
  - AutoencoderKL: ``lidm/models/ae/autoencoder.py:305-446``.

TPU-first: NHWC layout, modules are pure functions of params (flax.linen);
mixed precision via the ``dtype`` field (bfloat16 activations, fp32 params/norms).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import (AttnBlock, Downsample, Normalize, ResnetBlock, Upsample,
                         make_attn)
from ..nn.conv import CircularConv, Conv1x1
from ..nn.quantize import VectorQuantizer

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AEConfig:
    """ddconfig of the reference (configs/autoencoder/kitti/autoencoder_c2_p4.yaml)."""

    ch: int = 64
    out_ch: int = 1
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    strides: Tuple[Tuple[int, int], ...] = ((1, 2), (2, 2), (2, 2))
    num_res_blocks: int = 2
    attn_levels: Tuple[int, ...] = ()
    dropout: float = 0.0
    in_channels: int = 1
    z_channels: int = 8
    double_z: bool = False
    resamp_with_conv: bool = True
    attn_type: str = "vanilla"
    tanh_out: bool = False
    give_pre_end: bool = False
    circular: bool = True  # False = the model_ldm plain-conv variant (lib_name: ldm)


class Encoder(nn.Module):
    """Downsampling tower with asymmetric strides (model_lidm.py:222-312)."""

    cfg: AEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        num_levels = len(cfg.ch_mult)

        h = CircularConv(cfg.ch, (3, 3), (1, 1), 1, wrap=cfg.circular,
                         dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_levels):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(out_channels=block_out, dropout=cfg.dropout,
                                wrap=cfg.circular, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if i_level in cfg.attn_levels:
                    h = make_attn(cfg.attn_type, dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample(tuple(cfg.strides[i_level]), cfg.resamp_with_conv,
                               wrap=cfg.circular, dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)

        h = ResnetBlock(dropout=cfg.dropout, wrap=cfg.circular,
                        dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic)
        h = make_attn(cfg.attn_type, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, wrap=cfg.circular,
                        dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic)

        h = Normalize(act=True, name="norm_out")(h)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return CircularConv(z_ch, (3, 3), (1, 1), 1, wrap=cfg.circular,
                            dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """Upsampling tower; per-level (1,4) or (3,3) kernels chosen by the stride
    feeding that level (model_lidm.py:315-417)."""

    cfg: AEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, deterministic: bool = True,
                 return_prefinal: bool = False):
        cfg = self.cfg
        num_levels = len(cfg.ch_mult)
        stride2kernel = {(2, 2): (3, 3), (1, 2): (1, 4)}

        block_in = cfg.ch * cfg.ch_mult[num_levels - 1]
        h = CircularConv(block_in, (3, 3), (1, 1), 1, wrap=cfg.circular,
                         dtype=self.dtype, name="conv_in")(z)

        h = ResnetBlock(dropout=cfg.dropout, wrap=cfg.circular,
                        dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic)
        h = make_attn(cfg.attn_type, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, wrap=cfg.circular,
                        dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic)

        for i_level in reversed(range(num_levels)):
            stride = tuple(cfg.strides[i_level - 1]) if i_level > 0 else None
            kernel = stride2kernel.get(stride, (1, 4)) if stride is not None else (1, 4)
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_channels=block_out, kernel_size=kernel,
                                dropout=cfg.dropout, wrap=cfg.circular,
                                dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(
                    h, deterministic=deterministic)
                if i_level in cfg.attn_levels:
                    h = make_attn(cfg.attn_type, dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if stride is not None:
                h = Upsample(stride, cfg.resamp_with_conv, wrap=cfg.circular,
                             dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)

        if cfg.give_pre_end:
            return h

        h = Normalize(act=True, name="norm_out")(h)
        prefinal = h  # input to the last layer; the adaptive GAN weight
        # (vqperceptual.py:74-85) differentiates the losses w.r.t. conv_out only
        h = CircularConv(cfg.out_ch, (1, 4), (1, 1), (1, 2, 0, 0),
                         wrap=cfg.circular, dtype=self.dtype,
                         name="conv_out")(h)
        if cfg.tanh_out:
            h = jnp.tanh(h)
        if return_prefinal:
            return h, prefinal
        return h


def apply_raydrop(dec: Array) -> Array:
    """2-channel decode -> 1-channel range with ray-drop applied
    (autoencoder.py:298-301): channel 1 < 0 => no return => -1."""
    mask = dec[..., 1:2] < 0.0
    return jnp.where(mask, -1.0, dec[..., 0:1])


class VQModel(nn.Module):
    """VQ-GAN-style autoencoder over range images.

    forward() returns (reconstruction, codebook_loss, indices). The adversarial /
    geometric losses live in ``losses/vq_loss.py`` and the two-optimizer step in
    ``train/ae_trainer.py`` — model and objective are decoupled, JAX-style.
    """

    cfg: AEConfig
    n_embed: int = 16384
    embed_dim: int = 8
    use_mask: bool = False
    vq_init: str = "taming"       # see nn/quantize.py: "normal" for scratch
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.use_mask:
            assert self.cfg.out_ch == self.cfg.in_channels + 1, \
                "use_mask requires out_ch == in_channels + 1"
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim,
                                        codebook_init=self.vq_init)
        self.quant_conv = Conv1x1(self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = Conv1x1(self.cfg.z_channels, dtype=self.dtype)

    def encode(self, x: Array, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        return self.quantize(h)  # (quant, loss, indices)

    def encode_to_prequant(self, x: Array, deterministic: bool = True) -> Array:
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode(self, quant: Array, deterministic: bool = True) -> Array:
        return self.decoder(self.post_quant_conv(quant), deterministic=deterministic)

    def decode_with_raydrop(self, quant: Array, deterministic: bool = True) -> Array:
        dec = self.decode(quant, deterministic=deterministic)
        return apply_raydrop(dec) if self.use_mask else dec

    def __call__(self, x: Array, deterministic: bool = True):
        quant, diff, ind = self.encode(x, deterministic=deterministic)
        dec = self.decode(quant, deterministic=deterministic)
        return dec, diff, ind

    def forward_with_prefinal(self, x: Array, deterministic: bool = True):
        """Forward that also returns the last-layer input (for adaptive GAN weight)."""
        quant, diff, ind = self.encode(x, deterministic=deterministic)
        dec, prefinal = self.decoder(self.post_quant_conv(quant),
                                     deterministic=deterministic,
                                     return_prefinal=True)
        return dec, diff, ind, prefinal


class VQModelInterface(VQModel):
    """First-stage interface used by latent diffusion (autoencoder.py:280-302):
    encode returns pre-quant continuous latents; decode quantizes first."""

    def encode_latent(self, x: Array, deterministic: bool = True) -> Array:
        return self.encode_to_prequant(x, deterministic=deterministic)

    def decode_latent(self, h: Array, force_not_quantize: bool = False,
                      deterministic: bool = True) -> Array:
        if not force_not_quantize:
            quant, _, _ = self.quantize(h)
        else:
            quant = h
        dec = self.decode(quant, deterministic=deterministic)
        return apply_raydrop(dec) if self.use_mask else dec


class DiagonalGaussian:
    """Reparameterized diagonal Gaussian (distributions.py:24-63)."""

    def __init__(self, moments: Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng) -> Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape,
                                                        dtype=self.mean.dtype)

    def kl(self) -> Array:
        return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))

    def mode(self) -> Array:
        return self.mean


class AutoencoderKL(nn.Module):
    """KL-regularized AE (autoencoder.py:305-446). encode -> DiagonalGaussian."""

    cfg: AEConfig
    embed_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.cfg.double_z
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = Conv1x1(2 * self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = Conv1x1(self.cfg.z_channels, dtype=self.dtype)

    def encode(self, x: Array, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        return DiagonalGaussian(self.quant_conv(h))

    def decode(self, z: Array, deterministic: bool = True) -> Array:
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def __call__(self, x: Array, rng=None, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior


class IdentityFirstStage(nn.Module):
    """Passthrough first stage (autoencoder.py:448-466)."""

    @nn.compact
    def __call__(self, x: Array, *a, **k) -> Array:
        return x

    def encode_latent(self, x, *a, **k):
        return x

    def decode_latent(self, x, *a, **k):
        return x
