"""VQ-GAN autoencoder training: two optimizers + adaptive GAN weight, one jit.

Parity: ``lidm/models/ae/autoencoder.py:155-245`` (alternating optimizer_idx 0/1
per batch under Lightning — both run every step) + ``vqperceptual.py:74-215``
(hinge GAN with last-layer-gradient adaptive weight).

The adaptive weight needs d||nll||/d(conv_out) and d||g||/d(conv_out). Instead of
retain_graph double-backward (the torch trick), we save the decoder's pre-final
activation and take two *small* ``jax.grad``s over just the last conv's params —
re-running only the last conv + loss math, not the whole network. Everything
(generator update, discriminator update, EMA) compiles into one XLA program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import chex
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..losses.discriminator import hinge_d_loss, vanilla_d_loss
from ..losses.geometric import GeoConverter
from ..losses.vq_loss import (VQLossConfig, adaptive_weight_from_grads,
                              assemble_disc_input, disc_factor_at,
                              reconstruction_nll)
from ..models.autoencoder import VQModel
from ..nn.conv import CircularConv
from ..nn.ema import EmaState, init_ema, update_ema

Array = jax.Array


@chex.dataclass
class AETrainState:
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: Array


def make_ae_optimizers(lr_g, lr_d, accumulate: int = 1):
    """Adam(0.5, 0.9) pair (autoencoder.py:219-226).

    ``lr_*`` may be floats or optax schedules; ``accumulate > 1`` wraps both
    in MultiSteps (reference accumulate_grad_batches, main.py:712-717)."""
    tx_g = optax.adam(lr_g, b1=0.5, b2=0.9)
    tx_d = optax.adam(lr_d, b1=0.5, b2=0.9)
    if accumulate > 1:
        tx_g = optax.MultiSteps(tx_g, every_k_schedule=accumulate)
        tx_d = optax.MultiSteps(tx_d, every_k_schedule=accumulate)
    return tx_g, tx_d


def create_ae_state(model: VQModel, disc: nn.Module, rng: Array,
                    image_shape: Tuple[int, int, int],
                    tx_g, tx_d, loss_cfg: VQLossConfig,
                    geo: GeoConverter) -> AETrainState:
    rg, rd = jax.random.split(rng)
    x = jnp.zeros((1, *image_shape))
    params_g = model.init(rg, x)
    dec = model.apply(params_g, x)[0]  # gaus forward returns a 4-tuple
    disc_in = assemble_disc_input(loss_cfg, geo, dec, None, is_recon=True)
    params_d = disc.init(rd, disc_in)
    return AETrainState(params_g=params_g, params_d=params_d,
                        opt_g=tx_g.init(params_g), opt_d=tx_d.init(params_d),
                        step=jnp.zeros((), jnp.int32))


def _make_raw_ae_step(model: VQModel, disc: nn.Module, loss_cfg: VQLossConfig,
                      geo: GeoConverter, tx_g, tx_d,
                      perceptual_fn: Optional[Callable] = None,
                      s2_render: bool = False, s2_geom=None,
                      s2_factor: float = 1.0) -> Callable:
    """Unjitted step(state, batch, rng) -> (state, logs).

    When the AE config has dropout > 0 the generator pass runs with
    deterministic=False and the step rng feeds the dropout collection
    (the round-1 step silently disabled dropout for all configs).

    ``s2_render`` (VQModelGaus): the generator also decodes per-pixel gaussian
    params, re-renders the panorama and adds the forward_s2 loss
    (autoencoder_gaus.py:85-107 + vqperceptual.py:217-273)."""
    d_loss_fn = hinge_d_loss if loss_cfg.disc_loss == "hinge" else vanilla_d_loss
    out_ch = model.cfg.out_ch
    last_conv = CircularConv(out_ch, (1, 4), (1, 1), (1, 2, 0, 0))
    use_dropout = model.cfg.dropout > 0.0

    if s2_render:
        from ..models.autoencoder_gaus import (VQModelGaus,
                                               render_range_from_gaussians,
                                               s2_loss)
        from ..ops.lidar import depth_to_model
        assert s2_geom is not None, "s2_render needs the LidarGeometry"

    def nll_from_dec(dec, x, masks):
        return reconstruction_nll(loss_cfg, geo, x, dec, masks,
                                  perceptual_fn=perceptual_fn)

    def _forward(params_g, x, rng):
        kw = (dict(deterministic=False, rngs={"dropout": rng})
              if use_dropout else {})
        if s2_render:
            dec, qloss, ind, prefinal, gaus = model.apply(
                params_g, x, method=VQModelGaus.forward_with_prefinal_gaus,
                **kw)
            return dec, qloss, ind, prefinal, gaus
        dec, qloss, ind, prefinal = model.apply(
            params_g, x, method=VQModel.forward_with_prefinal, **kw)
        return dec, qloss, ind, prefinal, None

    def gen_loss(params_g, params_d, x, masks, global_step, rng):
        dec, qloss, ind, prefinal, gaus = _forward(params_g, x, rng)
        nll, parts = nll_from_dec(dec, x, masks)
        if s2_render:
            rend = render_range_from_gaussians(dec[..., :1], gaus, s2_geom)
            rend_model = depth_to_model(rend["rendered_range"],
                                        s2_geom)[..., None]
            s2, s2_parts = s2_loss(geo, x, rend_model)
            nll = nll + s2_factor * s2
            parts.update(s2_parts)

        disc_recon = assemble_disc_input(loss_cfg, geo, dec, masks, is_recon=True)
        logits_fake = disc.apply(params_d, disc_recon)
        g_loss = -jnp.mean(logits_fake)

        # ---- adaptive weight: grads of both losses wrt the last conv only ----
        w_last = params_g["params"]["decoder"]["conv_out"]
        a = jax.lax.stop_gradient(prefinal)

        def nll_of_w(w):
            d = last_conv.apply({"params": w}, a)
            return nll_from_dec(d, x, masks)[0]

        def g_of_w(w):
            d = last_conv.apply({"params": w}, a)
            di = assemble_disc_input(loss_cfg, geo, d, masks, is_recon=True)
            return -jnp.mean(disc.apply(jax.lax.stop_gradient(params_d), di))

        nll_g = jax.grad(nll_of_w)(jax.lax.stop_gradient(w_last))["conv"]["kernel"]
        gan_g = jax.grad(g_of_w)(jax.lax.stop_gradient(w_last))["conv"]["kernel"]
        d_weight = adaptive_weight_from_grads(
            jnp.linalg.norm(nll_g.reshape(-1)), jnp.linalg.norm(gan_g.reshape(-1)),
            loss_cfg.disc_weight)
        d_weight = jax.lax.stop_gradient(d_weight)

        disc_factor = disc_factor_at(loss_cfg, global_step)
        loss = nll + d_weight * disc_factor * g_loss + loss_cfg.codebook_weight * qloss
        parts.update({"total_loss": loss, "quant_loss": qloss, "g_loss": g_loss,
                      "d_weight": d_weight, "nll_loss": nll})
        return loss, (parts, dec)

    def disc_loss(params_d, x, dec, masks, global_step):
        disc_in = assemble_disc_input(loss_cfg, geo, jax.lax.stop_gradient(x),
                                      masks, is_recon=False)
        disc_rec = assemble_disc_input(loss_cfg, geo, jax.lax.stop_gradient(dec),
                                       masks, is_recon=True)
        logits_real = disc.apply(params_d, disc_in)
        logits_fake = disc.apply(params_d, disc_rec)
        loss = d_loss_fn(logits_real, logits_fake) * disc_factor_at(loss_cfg, global_step)
        return loss, {"disc_loss": loss, "logits_real": jnp.mean(logits_real),
                      "logits_fake": jnp.mean(logits_fake)}

    def raw_step(state: AETrainState, batch: Dict[str, Array], rng: Array):
        x = batch["image"]
        masks = batch.get("mask") if loss_cfg.mask_factor > 0 else None

        # optimizer_idx == 0: generator
        (gl, (parts, dec)), grads_g = jax.value_and_grad(gen_loss, has_aux=True)(
            state.params_g, state.params_d, x, masks, state.step, rng)
        upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)

        # optimizer_idx == 1: discriminator (on the pre-update recon, as PL does)
        (dl, dparts), grads_d = jax.value_and_grad(disc_loss, has_aux=True)(
            state.params_d, x, dec, masks, state.step)
        upd_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd_d)

        logs = {**parts, **dparts}
        return AETrainState(params_g=params_g, params_d=params_d,
                            opt_g=opt_g, opt_d=opt_d, step=state.step + 1), logs

    return raw_step


def make_ae_train_step(model: VQModel, disc: nn.Module, loss_cfg: VQLossConfig,
                       geo: GeoConverter, tx_g, tx_d,
                       perceptual_fn: Optional[Callable] = None,
                       s2_render: bool = False, s2_geom=None) -> Callable:
    """Returns jitted step(state, batch, rng) -> (state, logs)."""
    return jax.jit(_make_raw_ae_step(model, disc, loss_cfg, geo, tx_g, tx_d,
                                     perceptual_fn=perceptual_fn,
                                     s2_render=s2_render, s2_geom=s2_geom))


def make_chunked_ae_train_step(model: VQModel, disc: nn.Module,
                               loss_cfg: VQLossConfig, geo: GeoConverter,
                               tx_g, tx_d, batch_fn: Callable, n_inner: int,
                               perceptual_fn: Optional[Callable] = None,
                               donate: bool = False,
                               s2_render: bool = False, s2_geom=None) -> Callable:
    """Scan-chunked AE training: step(state, rng) runs ``n_inner`` generator+
    discriminator updates in one XLA program, micro-batches built on device by
    ``batch_fn(rng) -> batch`` (see diffusion_trainer.chunk_steps)."""
    from .diffusion_trainer import chunk_steps
    raw = _make_raw_ae_step(model, disc, loss_cfg, geo, tx_g, tx_d,
                            perceptual_fn=perceptual_fn,
                            s2_render=s2_render, s2_geom=s2_geom)
    return chunk_steps(raw, batch_fn, n_inner, donate=donate)


def make_ae_val_step(model: VQModel, loss_cfg: VQLossConfig,
                     geo: GeoConverter,
                     perceptual_fn: Optional[Callable] = None) -> Callable:
    """validation_step for the AE (autoencoder.py:181-196): reconstruction
    NLL + codebook loss on held-out batches, no GAN terms."""

    @jax.jit
    def val_step(state: AETrainState, batch: Dict[str, Array], rng: Array
                 ) -> Dict[str, Array]:
        x = batch["image"]
        masks = batch.get("mask") if loss_cfg.mask_factor > 0 else None
        out = model.apply(state.params_g, x)  # gaus forward returns a 4-tuple
        dec, qloss = out[0], out[1]
        nll, parts = reconstruction_nll(loss_cfg, geo, x, dec, masks,
                                        perceptual_fn=perceptual_fn)
        return {"rec_loss": parts["rec_loss"], "nll_loss": nll,
                "quant_loss": qloss}

    return val_step
