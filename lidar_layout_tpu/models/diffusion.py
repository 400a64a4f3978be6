"""DDPM / latent diffusion over range-image latents.

Parity targets:
  - DDPM base math: ``lidm/models/diffusion/ddpm.py:45-423`` (schedules, q_sample,
    p_losses with eps/x0 parameterization, l_simple/elbo weighting, logvar).
  - LatentDiffusion: ``ddpm.py:425-1409`` — frozen first stage, scale_factor
    (optionally calibrated from data std), conditioning-key dispatch
    (DiffusionWrapper ``ddpm.py:2306-2339``).

TPU-first: the model is a *pure function container* — parameters are explicit
pytrees, the whole train step jits into one XLA program, and sampling loops are
``lax.scan`` bodies (see ``samplers.py``). No Lightning-style mutable module.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .autoencoder import AEConfig, VQModelInterface, apply_raydrop
from .schedules import DiffusionSchedule, extract, q_sample
from .unet import UNetConfig, UNetModel

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """model.params block of the reference LiDM configs."""

    timesteps: int = 1024
    beta_schedule: str = "linear"
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    cosine_s: float = 8e-3
    parameterization: str = "eps"       # "eps" | "x0"
    loss_type: str = "l2"               # "l1" | "l2"
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    v_posterior: float = 0.0
    learn_logvar: bool = False
    logvar_init: float = 0.0
    conditioning_key: Optional[str] = None  # None|concat|crossattn|hybrid|adm
    scale_factor: float = 1.0
    scale_by_std: bool = False
    cond_stage_trainable: bool = False
    latent_shape: Tuple[int, int, int] = (16, 128, 8)  # (H, W, C) of z
    # split_input_params (ddpm.py:608-658): fold/unfold patched inference for
    # inputs wider/taller than the training size. ks/stride are in *latent*
    # units for apply_model and scaled by the first-stage factor for
    # encode/decode. None = plain path (training size).
    split_ks: Optional[Tuple[int, int]] = None
    split_stride: Optional[Tuple[int, int]] = None


class LatentDiffusion:
    """Bundles U-Net + frozen first stage + optional conditioning encoder.

    Parameters are explicit: ``params = {"unet", "first_stage", "cond_stage",
    "logvar"}``. Only "unet" (+ "cond_stage" when trainable) receive gradients.
    """

    def __init__(self, cfg: DiffusionConfig, unet_cfg: Optional[UNetConfig],
                 first_stage_cfg: Optional[AEConfig] = None,
                 n_embed: int = 16384, embed_dim: int = 8, use_mask: bool = True,
                 vq_init: str = "taming",
                 cond_stage: Optional[nn.Module] = None,
                 unet: Optional[nn.Module] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps, beta_schedule=cfg.beta_schedule,
            linear_start=cfg.linear_start, linear_end=cfg.linear_end,
            cosine_s=cfg.cosine_s, v_posterior=cfg.v_posterior,
            parameterization=cfg.parameterization)
        # ``unet`` overrides the standard openaimodel U-Net — used for
        # conditioning_key='layout_crossattn' (object_cross_unet.py:632) whose
        # module takes the raw layout-encoder dict instead of context/concat.
        self.unet = unet if unet is not None else UNetModel(unet_cfg, dtype=dtype)
        self.first_stage = (VQModelInterface(first_stage_cfg, n_embed=n_embed,
                                             embed_dim=embed_dim, use_mask=use_mask,
                                             vq_init=vq_init, dtype=dtype)
                            if first_stage_cfg is not None else None)
        self.cond_stage = cond_stage

    # ------------------------------------------------------------------ init
    def init(self, rng: Array, image_shape: Tuple[int, int, int],
             cond_example: Any = None) -> Dict[str, Any]:
        h, w, c = self.cfg.latent_shape
        r1, r2, r3 = jax.random.split(rng, 3)
        z = jnp.zeros((1, h, w, c))
        t = jnp.zeros((1,), jnp.int32)

        context = None
        concat = None
        y = None
        cond_params = {}
        cond_out = None
        if self.cond_stage is not None and cond_example is not None:
            cond_params = self.cond_stage.init(r3, cond_example)
            cond_out = self.cond_stage.apply(cond_params, cond_example)
            context, concat, y = self._cond_views(cond_out)

        if self.cfg.conditioning_key == "layout_crossattn" \
                and isinstance(cond_out, dict) and "xf_proj" in cond_out:
            # batch sizes must agree: the object-aware attention concatenates
            # image tokens with the layout tokens along the sequence axis
            b = cond_out["xf_proj"].shape[0]
            zb = jnp.broadcast_to(z, (b, *z.shape[1:]))
            tb = jnp.zeros((b,), jnp.int32)
            unet_params = self.unet.init(r1, zb, tb, cond_out)
        else:
            # batch sizes must agree between latents and conditioning (cross-
            # attention K/V reshape uses the query batch): broadcast z/t to
            # the conditioning batch when an example with batch > 1 is given.
            b = 1
            for part in (context, concat, y):
                if part is not None:
                    b = max(b, part.shape[0])
            zb = jnp.broadcast_to(z, (b, *z.shape[1:]))
            tb = jnp.zeros((b,), jnp.int32)
            unet_in = zb if concat is None else jnp.concatenate(
                [zb, concat], axis=-1)
            unet_params = self.unet.init(r1, unet_in, tb, context=context, y=y)

        fs_params = {}
        if self.first_stage is not None:
            x = jnp.zeros((1, *image_shape))
            fs_params = self.first_stage.init(r2, x)

        return {
            "unet": unet_params,
            "first_stage": fs_params,
            "cond_stage": cond_params,
            "logvar": jnp.full((self.cfg.timesteps,), self.cfg.logvar_init),
        }

    # -------------------------------------------------------- first stage io
    def _first_stage_factor(self) -> Tuple[int, int]:
        """Total (H, W) downsampling of the first stage (the reference's vqf)."""
        fh = fw = 1
        for sh, sw in self.first_stage.cfg.strides:
            fh *= sh
            fw *= sw
        return fh, fw

    def _split_active(self, h: int, w: int) -> bool:
        """Patched path iff configured AND the input exceeds the patch size
        (the reference sets split_input_params only for oversized inference,
        ddpm.py:608)."""
        ks = self.cfg.split_ks
        return ks is not None and (h > ks[0] or w > ks[1])

    def encode_first_stage(self, params, x: Array) -> Array:
        """x -> scaled latent z (ddpm.py:830-872). Frozen: stop_gradient."""
        if self.first_stage is None:  # IdentityFirstStage (pixel-space diffusion)
            return x

        def enc(xi):
            return self.first_stage.apply(
                params["first_stage"], xi,
                method=lambda m, v: m.encode_to_prequant(v))

        fh, fw = self._first_stage_factor()
        if self._split_active(x.shape[1] // fh, x.shape[2] // fw):
            from ..ops.foldunfold import patched_apply_scaled
            kh, kw = self.cfg.split_ks
            sh, sw = self.cfg.split_stride or self.cfg.split_ks
            z = patched_apply_scaled(enc, x, (kh * fh, kw * fw),
                                     (sh * fh, sw * fw),
                                     scale=(1.0 / fh, 1.0 / fw))
        else:
            z = enc(x)
        return jax.lax.stop_gradient(self.cfg.scale_factor * z)

    def decode_first_stage(self, params, z: Array,
                           force_not_quantize: bool = False) -> Array:
        if self.first_stage is None:
            return z
        z = z / self.cfg.scale_factor

        def dec(zi):
            return self.first_stage.apply(
                params["first_stage"], zi, force_not_quantize,
                method=lambda m, h, f: m.decode_latent(h, force_not_quantize=f))

        if self._split_active(z.shape[1], z.shape[2]):
            from ..ops.foldunfold import patched_apply_scaled
            fh, fw = self._first_stage_factor()
            stride = self.cfg.split_stride or self.cfg.split_ks
            return patched_apply_scaled(dec, z, self.cfg.split_ks, stride,
                                        scale=(float(fh), float(fw)))
        return dec(z)

    def get_learned_conditioning(self, params, cond: Any) -> Any:
        if self.cond_stage is None:
            return cond
        out = self.cond_stage.apply(params["cond_stage"], cond)
        if not self.cfg.cond_stage_trainable:
            out = jax.lax.stop_gradient(out)
        return out

    # ------------------------------------------------------------- the model
    @staticmethod
    def _split_cond(cond: Any) -> Tuple[Optional[Array], Optional[Array], Optional[Array]]:
        """Normalize conditioning into (context, concat, label)."""
        if cond is None:
            return None, None, None
        if isinstance(cond, dict):
            return cond.get("c_crossattn"), cond.get("c_concat"), cond.get("c_adm")
        return cond, None, None  # bare array: meaning depends on conditioning_key

    def _cond_views(self, cond: Any
                    ) -> Tuple[Optional[Array], Optional[Array], Optional[Array]]:
        """(context, concat, label) per conditioning_key — a bare-array cond
        means concat for 'concat', context for '*crossattn', label for 'adm'
        (DiffusionWrapper semantics, ddpm.py:2313-2339). Used by BOTH init and
        apply_model so the U-Net is created with the channels it will see."""
        key = self.cfg.conditioning_key
        context = concat = y = None
        if key is None or cond is None:
            pass
        elif key == "concat":
            _, concat, _ = self._split_cond(cond)
            if concat is None:
                concat = cond
        elif key in ("crossattn", "layout_crossattn", "graph_crossattn"):
            context, _, _ = self._split_cond(cond)
        elif key == "hybrid":
            context, concat, _ = self._split_cond(cond)
        elif key == "adm":
            _, _, y = self._split_cond(cond)
            if y is None:
                y = cond
        else:
            raise NotImplementedError(key)
        return context, concat, y

    def apply_model(self, params, x_noisy: Array, t: Array, cond: Any = None,
                    deterministic: bool = True, rngs=None) -> Array:
        """DiffusionWrapper dispatch (ddpm.py:2313-2339)."""
        key = self.cfg.conditioning_key
        if key == "layout_crossattn" and isinstance(cond, dict) \
                and "xf_proj" in cond:
            # object-aware cross-attention U-Net consumes the layout-encoder
            # output dict directly (ddpm.py:2334-2336 'layout_crossattn')
            return self.unet.apply(params["unet"], x_noisy, t, cond,
                                   deterministic=deterministic, rngs=rngs)
        context, concat, y = self._cond_views(cond)

        def core(x, cc):
            x_in = x if cc is None else jnp.concatenate([x, cc], axis=-1)
            return self.unet.apply(params["unet"], x_in, t, context=context,
                                   y=y, deterministic=deterministic, rngs=rngs)

        if self._split_active(x_noisy.shape[1], x_noisy.shape[2]):
            # patched denoising on oversized latents (ddpm.py:911-992): image-
            # like concat conditioning unfolds with the latent, crossattn
            # context / class labels are shared across crops.
            from ..ops.foldunfold import fold_patches, unfold_patches
            ks = self.cfg.split_ks
            stride = self.cfg.split_stride or ks
            tiles, coords = unfold_patches(x_noisy, ks, stride)
            ctiles = None
            if concat is not None:
                ctiles, _ = unfold_patches(concat, ks, stride)
            outs = []
            for i in range(tiles.shape[1]):
                outs.append(core(tiles[:, i],
                                 None if ctiles is None else ctiles[:, i]))
            outs = jnp.stack(outs, axis=1)
            b, h, w = x_noisy.shape[:3]
            return fold_patches(outs, coords, (b, h, w, outs.shape[-1]))

        return core(x_noisy, concat)

    # ----------------------------------------------------------------- loss
    def p_losses(self, params, rng: Array, x_start: Array, cond: Any,
                 t: Array, deterministic: bool = False
                 ) -> Tuple[Array, Dict[str, Array]]:
        """ddpm.py:1020-1060 (LatentDiffusion.p_losses)."""
        rngs = None
        if not deterministic:
            rng, r_drop = jax.random.split(rng)
            rngs = {"dropout": r_drop}
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_noisy = q_sample(self.schedule, x_start, t, noise)
        model_out = self.apply_model(params, x_noisy, t, cond,
                                     deterministic=deterministic, rngs=rngs)

        target = noise if self.cfg.parameterization == "eps" else x_start
        if self.cfg.loss_type == "l2":
            per = (model_out - target) ** 2
        else:
            per = jnp.abs(model_out - target)
        loss_simple = per.mean(axis=tuple(range(1, per.ndim)))  # (B,)

        logvar_t = params["logvar"][t]
        if not self.cfg.learn_logvar:
            logvar_t = jax.lax.stop_gradient(logvar_t)
        loss = loss_simple / jnp.exp(logvar_t) + logvar_t
        loss = self.cfg.l_simple_weight * loss.mean()

        lvlb = jnp.asarray(self.schedule.lvlb_weights, per.dtype)[t]
        loss_vlb = (lvlb * loss_simple).mean()
        loss = loss + self.cfg.original_elbo_weight * loss_vlb

        logs = {"loss_simple": loss_simple.mean(), "loss_vlb": loss_vlb,
                "loss": loss}
        return loss, logs

    def training_loss(self, params, rng: Array, batch: Dict[str, Array],
                      deterministic: bool = False) -> Tuple[Array, Dict[str, Array]]:
        """One full shared_step: encode, sample t, p_losses (ddpm.py:874-880)."""
        r_t, r_noise, r_drop = jax.random.split(rng, 3)
        x = batch["image"]
        z = self.encode_first_stage(params, x)
        cond = None
        if self.cfg.conditioning_key is not None:
            cond = self.get_learned_conditioning(params, batch["cond"])
        t = jax.random.randint(r_t, (x.shape[0],), 0, self.cfg.timesteps)
        return self.p_losses(params, r_noise, z, cond, t,
                             deterministic=deterministic)

    # ------------------------------------------------------------- sampling
    def predict_eps_from_x(self, x_t: Array, t: Array, pred_x0: Array) -> Array:
        s = self.schedule
        return ((extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_x0)
                / extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))

    def eps_from_model_out(self, x_t: Array, t: Array, out: Array) -> Array:
        """Model output -> epsilon, whatever the parameterization."""
        if self.cfg.parameterization == "eps":
            return out
        return self.predict_eps_from_x(x_t, t, out)


def calibrate_scale_factor(z: Array) -> float:
    """scale_by_std calibration: 1/std(z) over the first batch (ddpm.py:540-553)."""
    return float(1.0 / jnp.std(z))


def apply_scale_by_std(model: "LatentDiffusion", params, first_batch_image: Array
                       ) -> float:
    """on_train_batch_start rescaling (ddpm.py:540-553): when scale_by_std is
    set and scale_factor is still the default 1.0, replace it with
    1/std(encode(first batch)). Mutates ``model.cfg`` in place (the config is
    a frozen dataclass; the model holds a fresh copy) and returns the factor.
    """
    if not model.cfg.scale_by_std or model.cfg.scale_factor != 1.0:
        return model.cfg.scale_factor
    z = model.encode_first_stage(params, first_batch_image)
    s = calibrate_scale_factor(z)
    model.cfg = dataclasses.replace(model.cfg, scale_factor=s)
    return s
