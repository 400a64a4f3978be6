"""Per-family trainer construction for the config-driven CLI.

The reference trains every model family through one entry point because each
LightningModule carries its own ``training_step`` (main.py:560+749). Here the
equivalent protocol is this dispatch: given a registry-instantiated model, it
returns the train state, jitted step, validation step and checkpoint monitor
for that family, so ``scripts/train_lidm.py -b <any registered config> -t``
works for all of them (previously only VQModel and LatentDiffusion routed;
gaus/object/cube/KL/R2DM configs crashed in the generic branch).

Batch contracts (what ``data.factory.build_batches`` yields per family):
  range AEs / LiDMs : {"image" (B,H,W,C), "mask", ["cond"]}
  cube AE/diffusion : {"points" (B,N,3), "feats" (B,N,F), "mask" (B,N)}
  object AE         : {"fg_points" (B,P,3), "fg_class" (B,1)}
  R2DM              : {"image" (B,H,W,2)}
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@dataclasses.dataclass
class FamilyTrainer:
    state: Any
    step: Callable                 # (state, batch, rng) -> (state, logs)
    val_step: Optional[Callable]   # (state, batch, rng) -> logs
    monitor: str
    render_fn: Optional[Callable] = None  # (state, batch, rng) -> image dict


@chex.dataclass
class SimpleTrainState:
    """Single-optimizer state with EMA (R2DM / object / cube families)."""
    params: Any
    opt_state: Any
    ema: Any
    step: Array


def _simple_state(params, tx, ema_decay=0.9999):
    return SimpleTrainState(params=params, opt_state=tx.init(params),
                            ema=params, step=jnp.zeros((), jnp.int32))


def _simple_update(state, grads, tx, ema_decay=0.9999):
    upd, opt = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, upd)
    # LitEma warmup: decay = min(ema_decay, (1+step)/(10+step)) (ema.py:27-32)
    d = jnp.minimum(ema_decay, (1.0 + state.step) / (10.0 + state.step))
    ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), state.ema, params)
    return SimpleTrainState(params=params, opt_state=opt, ema=ema,
                            step=state.step + 1)


# --------------------------------------------------------------------- KL AE
def make_kl_train_step(model, disc, loss_cfg, geo, tx_g, tx_d) -> Callable:
    """AutoencoderKL two-optimizer step (contperceptual LPIPSWithDiscriminator
    semantics: NLL+KL generator + hinge GAN, autoencoder.py:305-446).
    logvar is fixed at its init value (reference logvar_init=0; the learnable
    scalar moves the loss by a constant factor only)."""
    from ..losses.contperceptual import kl_autoencoder_loss
    from ..losses.discriminator import hinge_d_loss

    logvar = jnp.asarray(loss_cfg.logvar_init, jnp.float32)

    def gen_loss(params_g, params_d, x, rng):
        dec, posterior = model.apply(params_g, x, rng=rng)
        loss, parts = kl_autoencoder_loss(loss_cfg, geo, x, dec, posterior,
                                          logvar)
        logits_fake = disc.apply(params_d, dec)
        g_loss = -jnp.mean(logits_fake)
        total = loss + 0.5 * g_loss
        parts.update({"g_loss": g_loss, "total_loss": total})
        return total, (parts, dec)

    def disc_loss(params_d, x, dec):
        lr_ = disc.apply(params_d, jax.lax.stop_gradient(x))
        lf = disc.apply(params_d, jax.lax.stop_gradient(dec))
        loss = hinge_d_loss(lr_, lf)
        return loss, {"disc_loss": loss}

    @jax.jit
    def step(state, batch, rng):
        x = batch["image"]
        (gl, (parts, dec)), grads_g = jax.value_and_grad(
            gen_loss, has_aux=True)(state.params_g, state.params_d, x, rng)
        upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)
        (dl, dparts), grads_d = jax.value_and_grad(disc_loss, has_aux=True)(
            state.params_d, x, dec)
        upd_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd_d)
        logs = {**parts, **dparts}
        return state.replace(params_g=params_g, params_d=params_d,
                             opt_g=opt_g, opt_d=opt_d,
                             step=state.step + 1), logs

    return step


# ---------------------------------------------------------------- dispatcher
def build_family_trainer(model, model_cfg: Dict, *, seed: int, lr,
                         accumulate: int, geom, image_channels: int = 1,
                         perceptual_fn: Optional[Callable] = None
                         ) -> FamilyTrainer:
    """Dispatch on the instantiated model's family. Raises NotImplementedError
    with the correct entry point for models trained elsewhere
    (LayoutDiffusion -> scripts/train_layout.py, DenseDecoder ->
    scripts/train_dense_decoder.py)."""
    from ..losses.discriminator import LiDARNLayerDiscriminator
    from ..losses.geometric import GeoConverter
    from ..models.autoencoder import AutoencoderKL, VQModel
    from ..models.autoencoder_gaus import VQModelGaus
    from ..models.cube_diffusion import CubeDiffusion
    from ..models.diffusion import LatentDiffusion
    from ..models.object_ae import VQModelObject, object_ae_loss
    from ..models.r2dm import R2DMDiffusion
    from ..models.sparse_vae import SparseVAE, struct_loss

    rng = jax.random.key(seed)

    # ---------------- latent diffusion (uncond / concat / crossattn) -------
    if isinstance(model, LatentDiffusion):
        from .diffusion_trainer import (create_train_state, make_optimizer,
                                        make_train_step, make_val_step)
        tx = make_optimizer(lr, accumulate=accumulate)
        params = model.init(rng, image_shape=(*geom.size, image_channels))
        state = create_train_state(model, params, tx)
        return FamilyTrainer(state=state, step=make_train_step(model, tx),
                             val_step=make_val_step(model),
                             monitor="val/loss_simple_ema")

    # ---------------- range VQ AEs (plain + gaussian head) -----------------
    if isinstance(model, VQModel):  # VQModelGaus subclasses VQModel
        from .ae_trainer import (create_ae_state, make_ae_optimizers,
                                 make_ae_train_step, make_ae_val_step)
        from ..losses.vq_loss import VQLossConfig
        lc = (model_cfg.get("params") or {}).get("lossconfig")
        if isinstance(lc, dict) and lc.get("target") not in (
                None, "torch.nn.Identity"):
            from ..config import instantiate_from_config
            loss_cfg = instantiate_from_config(lc)
        else:
            loss_cfg = VQLossConfig()
        geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
        disc = LiDARNLayerDiscriminator()
        tx_g, tx_d = make_ae_optimizers(lr, lr, accumulate)
        state = create_ae_state(model, disc, rng,
                                (*geom.size, model.cfg.in_channels),
                                tx_g, tx_d, loss_cfg, geo)
        s2 = isinstance(model, VQModelGaus)
        step = make_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d,
                                  perceptual_fn=perceptual_fn,
                                  s2_render=s2, s2_geom=geom if s2 else None)
        val = make_ae_val_step(model, loss_cfg, geo,
                               perceptual_fn=perceptual_fn)
        return FamilyTrainer(state=state, step=step, val_step=val,
                             monitor="val/rec_loss")

    # ---------------- KL AE -------------------------------------------------
    if isinstance(model, AutoencoderKL):
        from .ae_trainer import AETrainState, make_ae_optimizers
        from ..losses.contperceptual import KLLossConfig
        lc = (model_cfg.get("params") or {}).get("lossconfig") or {}
        lp = lc.get("params", {}) if isinstance(lc, dict) else {}
        loss_cfg = KLLossConfig(
            kl_weight=float(lp.get("kl_weight", 1e-6)),
            pixelloss_weight=float(lp.get("pixelloss_weight", 1.0)))
        geo = GeoConverter(geom, curve_length=1)
        disc = LiDARNLayerDiscriminator()
        tx_g, tx_d = make_ae_optimizers(lr, lr, accumulate)
        rg, rd, rs = jax.random.split(rng, 3)
        x = jnp.zeros((1, *geom.size, model.cfg.in_channels))
        params_g = model.init(rg, x, rng=rs)
        dec, _ = model.apply(params_g, x, rng=rs)
        params_d = disc.init(rd, dec)
        state = AETrainState(params_g=params_g, params_d=params_d,
                             opt_g=tx_g.init(params_g),
                             opt_d=tx_d.init(params_d),
                             step=jnp.zeros((), jnp.int32))
        step = make_kl_train_step(model, disc, loss_cfg, geo, tx_g, tx_d)

        @jax.jit
        def val(state, batch, rng):
            from ..losses.contperceptual import kl_autoencoder_loss
            dec, post = model.apply(state.params_g, batch["image"], rng=rng)
            loss, parts = kl_autoencoder_loss(loss_cfg, geo, batch["image"],
                                              dec, post, jnp.zeros(()))
            return {"rec_loss": parts["rec_loss"], "kl_loss": parts["kl_loss"]}

        return FamilyTrainer(state=state, step=step, val_step=val,
                             monitor="val/rec_loss")

    # ---------------- R2DM (pixel-space range diffusion) -------------------
    if isinstance(model, R2DMDiffusion):
        tx = optax.adamw(lr)
        params = model.init(rng)
        state = _simple_state(params, tx)

        @jax.jit
        def step(state, batch, rng):
            def loss_fn(p):
                return model.p_losses(p, rng, batch["image"])
            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return _simple_update(state, grads, tx), {"loss": loss, **parts}

        @jax.jit
        def val(state, batch, rng):
            loss, _ = model.p_losses(state.ema, rng, batch["image"])
            return {"loss_simple_ema": loss}

        return FamilyTrainer(state=state, step=step, val_step=val,
                             monitor="val/loss_simple_ema")

    # ---------------- per-object point VQ-AE (G2SD) ------------------------
    if isinstance(model, VQModelObject):
        tx = optax.adamw(lr)
        params = model.init(rng, jnp.zeros((model.cfg.num_points, 3)))
        state = _simple_state(params, tx)

        def batch_loss(p, pts):
            rec, q, _ = jax.vmap(lambda x: model.apply(p, x))(pts)
            losses = jax.vmap(object_ae_loss)(rec, pts, q)
            return jnp.mean(losses[0]), {k: jnp.mean(v)
                                         for k, v in losses[1].items()}

        @jax.jit
        def step(state, batch, rng):
            (loss, parts), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(state.params, batch["fg_points"])
            return _simple_update(state, grads, tx), parts

        @jax.jit
        def val(state, batch, rng):
            _, parts = batch_loss(state.ema, batch["fg_points"])
            return {"rec_loss": parts["rec_loss"]}

        return FamilyTrainer(state=state, step=step, val_step=val,
                             monitor="val/rec_loss")

    # ---------------- sparse-voxel VAE (cube AE) ----------------------------
    if isinstance(model, SparseVAE):
        tx = optax.adamw(lr)

        def batch_loss(p, batch, rng):
            rngs = jax.random.split(rng, batch["points"].shape[0])
            losses, parts = jax.vmap(
                lambda pt, f, m, r: struct_loss(
                    model.apply(p, pt, f, m, r),
                    kl_weight=model.cfg.kl_weight))(
                batch["points"], batch["feats"], batch["mask"], rngs)
            return jnp.mean(losses), {k: jnp.mean(v) for k, v in parts.items()}

        @jax.jit
        def step(state, batch, rng):
            (loss, parts), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(state.params, batch, rng)
            return _simple_update(state, grads, tx), {"loss": loss, **parts}

        @jax.jit
        def val(state, batch, rng):
            loss, _ = batch_loss(state.ema, batch, rng)
            return {"struct_loss": loss}

        def make_state(batch):  # deferred init: capacity comes from the data
            p = model.init(rng, jnp.asarray(batch["points"][0]),
                           jnp.asarray(batch["feats"][0]),
                           jnp.asarray(batch["mask"][0]), jax.random.key(1))
            return _simple_state(p, tx)

        ft = FamilyTrainer(state=None, step=step, val_step=val,
                           monitor="val/struct_loss")
        ft.make_state = make_state
        return ft

    # ---------------- sparse-latent diffusion (cube) ------------------------
    if isinstance(model, CubeDiffusion):
        # the diffusion trains over latents from a separately-built frozen
        # first stage (first_stage_config, voxel_uncond_diffusion_256.yaml);
        # only the U-Net parameters are optimized.
        from ..config import instantiate_from_config
        fsc = (model_cfg.get("params") or {}).get("first_stage_config") or {}
        first_stage = instantiate_from_config(fsc) if fsc.get("target") \
            else None
        if first_stage is None:
            raise NotImplementedError(
                "cube_latent_diffusion needs first_stage_config to encode "
                "clouds")
        tx = optax.adamw(lr)

        def encode_one(fs_p, pt, f, m, r):
            return first_stage.apply(fs_p, pt, f, m, r)

        def batch_loss(unet_p, fs_p, batch, rng):
            n = batch["points"].shape[0]
            r1 = jax.random.split(rng, n)
            outs = jax.vmap(lambda pt, f, m, r: encode_one(fs_p, pt, f, m, r)
                            )(batch["points"], batch["feats"],
                              batch["mask"], r1)
            r2 = jax.random.split(jax.random.fold_in(rng, 1), n)
            losses, parts = jax.vmap(
                lambda g, z, r: model.p_losses(unet_p, r, g,
                                               jax.lax.stop_gradient(z)))(
                outs["latent_grid"], outs["latent"], r2)
            return jnp.mean(losses), {k: jnp.mean(v) for k, v in parts.items()}

        @jax.jit
        def step(state, batch, rng):
            unet_p, fs_p = state.params["diffusion"], state.params["first_stage"]
            (loss, parts), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(unet_p, fs_p, batch, rng)
            upd, opt = tx.update(grads, state.opt_state, unet_p)
            new_unet = optax.apply_updates(unet_p, upd)
            d = jnp.minimum(0.9999, (1.0 + state.step) / (10.0 + state.step))
            ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               state.ema, new_unet)
            new = SimpleTrainState(
                params={"diffusion": new_unet, "first_stage": fs_p},
                opt_state=opt, ema=ema, step=state.step + 1)
            return new, {"loss": loss, **parts}

        @jax.jit
        def val(state, batch, rng):
            loss, _ = batch_loss(state.ema, state.params["first_stage"],
                                 batch, rng)
            return {"loss_simple_ema": loss}

        def make_state(batch):
            pt = jnp.asarray(batch["points"][0])
            f = jnp.asarray(batch["feats"][0])
            m = jnp.asarray(batch["mask"][0])
            fs_p = first_stage.init(rng, pt, f, m, jax.random.key(1))
            ckpt = (fsc.get("params") or {}).get("ckpt_path")
            if ckpt:
                from .checkpoint import load_first_stage_params
                fs_p = load_first_stage_params(ckpt, fs_p)
            out = first_stage.apply(fs_p, pt, f, m, jax.random.key(1))
            dp = model.init(jax.random.key(seed + 1), out["latent_grid"])
            st = SimpleTrainState(
                params={"diffusion": dp, "first_stage": fs_p},
                opt_state=tx.init(dp), ema=dp, step=jnp.zeros((), jnp.int32))
            return st

        ft = FamilyTrainer(state=None, step=step, val_step=val,
                           monitor="val/loss_simple_ema")
        ft.make_state = make_state
        return ft

    target = model_cfg.get("target", type(model).__name__)
    hints = {"layout_diffusion": "scripts/train_layout.py",
             "LayoutDiffusion": "scripts/train_layout.py",
             "dense_decoder": "scripts/train_dense_decoder.py",
             "DenseDecoder": "scripts/train_dense_decoder.py"}
    for k, v in hints.items():
        if k in str(target):
            raise NotImplementedError(
                f"{target} trains through {v}, not train_lidm.py")
    raise NotImplementedError(
        f"no trainer registered for model family {target!r}")
