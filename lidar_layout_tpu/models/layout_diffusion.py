"""Layout diffusion: denoising diffusion over object-box vectors conditioned on
a scene graph.

Parity: ``lidm/models/diffusion/ddpm.py:1411-2304`` LayoutDiffusion — boxes are
8-dim [size3, loc3, sin, cos] (angle preprocessed via
``misc_utils.preprocess_angle2sincos:245``); a SceneGraph GCN supplies a per-box
relation latent (``c_b``) and object embedding (``uc_b``); each *scene* shares
one diffusion timestep across its boxes (ddpm.py:1995-1999); the denoiser is
UNet1DModel via the 'graph_crossattn' dispatch; sampling is LayoutDDIMSampler
(``ddim.py:209-401``) over (N, 8) vectors.

TPU-first: per-scene timesteps come from gathering t[scene_ids] (no
torch.unique — scene ids are already dense from the fixed-capacity collate);
the DDIM loop is one ``lax.scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..encoders.scene_graph import SceneGraphEncoder
from .schedules import DDIMSchedule, DiffusionSchedule, extract, q_sample
from .unet1d import UNet1DConfig, UNet1DModel

Array = jax.Array


def angle_to_sincos(angle: Array) -> Array:
    """(..., 1) angle -> (..., 2) [sin, cos] (misc_utils.py:245-249)."""
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)


def sincos_to_angle(sincos: Array) -> Array:
    return jnp.arctan2(sincos[..., 0:1], sincos[..., 1:2])


@dataclasses.dataclass(frozen=True)
class LayoutDiffusionConfig:
    """configs/layout_diffusion/nuscenes/layout_nusc.yaml model.params."""

    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    loss_type: str = "l2"
    l_simple_weight: float = 1.0
    parameterization: str = "eps"
    box_dim: int = 8


class LayoutDiffusion:
    """Box diffusion with a trainable scene-graph conditioning stage."""

    def __init__(self, cfg: LayoutDiffusionConfig, unet_cfg: UNet1DConfig,
                 num_objs: int = 32, num_preds: int = 16,
                 sg_embedding_dim: int = 64, use_clip: bool = True):
        self.cfg = cfg
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps, beta_schedule=cfg.beta_schedule,
            linear_start=cfg.linear_start, linear_end=cfg.linear_end,
            parameterization=cfg.parameterization)
        self.unet = UNet1DModel(unet_cfg)
        self.cond_stage = SceneGraphEncoder(
            num_objs=num_objs, num_preds=num_preds,
            embedding_dim=sg_embedding_dim, use_clip=use_clip,
            replace_latent=True, residual=True)

    # ---------------------------------------------------------------- init
    def init(self, rng: Array, graph: Dict[str, Array]) -> Dict[str, Any]:
        r1, r2, r3 = jax.random.split(rng, 3)
        cond_params = self.cond_stage.init({"params": r1, "change": r2}, graph)
        latent, obj_embed = self.cond_stage.apply(cond_params, graph,
                                                  rngs={"change": r2})
        n = graph["dec_objs"].shape[0]
        box_t = jnp.zeros((n, self.cfg.box_dim))
        t = jnp.zeros((n,), jnp.int32)
        unet_params = self.unet.init(r3, box_t, obj_embed, graph["dec_triples"],
                                     t, context=latent)
        return {"unet": unet_params, "cond_stage": cond_params}

    # ------------------------------------------------------------- forward
    def encode_graph(self, params, graph: Dict[str, Array], rng: Array
                     ) -> Tuple[Array, Array]:
        return self.cond_stage.apply(params["cond_stage"], graph,
                                     rngs={"change": rng})

    def apply_model(self, params, box_t: Array, t: Array, obj_embed: Array,
                    triples: Array, condition_cross: Array,
                    pred_mask: Optional[Array] = None) -> Array:
        return self.unet.apply(params["unet"], box_t, obj_embed, triples, t,
                               context=condition_cross, pred_mask=pred_mask)

    # ---------------------------------------------------------------- loss
    def p_losses(self, params, rng: Array, graph: Dict[str, Array]
                 ) -> Tuple[Array, Dict[str, Array]]:
        """Boxes (dec_boxes (N,7): size3+loc3+angle1), scene ids (N,) map each
        box to its scene so all boxes of a scene share one t (ddpm.py:1995-99).
        Padding boxes (obj_mask False) are excluded from the loss."""
        r_cond, r_t, r_noise = jax.random.split(rng, 3)
        latent, obj_embed = self.encode_graph(params, graph, r_cond)

        boxes = graph["dec_boxes"]
        scene_ids = graph["dec_objs_to_scene"]
        n_scenes = int(graph["n_scenes"]) if "n_scenes" in graph else int(
            scene_ids.max()) + 1

        x_start = jnp.concatenate([boxes[:, :-1],
                                   angle_to_sincos(boxes[:, -1:])], axis=-1)

        t_scene = jax.random.randint(r_t, (n_scenes,), 0, self.cfg.timesteps)
        t = t_scene[scene_ids]

        noise = jax.random.normal(r_noise, x_start.shape, x_start.dtype)
        x_noisy = q_sample(self.schedule, x_start, t, noise)
        model_out = self.apply_model(params, x_noisy, t, obj_embed,
                                     graph["dec_triples"], latent,
                                     graph.get("dec_pred_mask"))

        target = noise if self.cfg.parameterization == "eps" else x_start
        per = ((model_out - target) ** 2 if self.cfg.loss_type == "l2"
               else jnp.abs(model_out - target)).mean(axis=-1)  # (N,)

        mask = graph.get("obj_mask")
        if mask is not None:
            m = mask.astype(per.dtype)
            loss_simple = (per * m).sum() / jnp.maximum(m.sum(), 1.0)
        else:
            loss_simple = per.mean()
        loss = self.cfg.l_simple_weight * loss_simple
        return loss, {"loss": loss, "loss_simple": loss_simple}

    # ------------------------------------------------------------- sampling
    def ddim_sample(self, params, rng: Array, graph: Dict[str, Array],
                    steps: int = 100, eta: float = 0.0) -> Array:
        """LayoutDDIMSampler.sample over (N, box_dim) vectors, one lax.scan."""
        r_cond, r_loop = jax.random.split(rng)
        latent, obj_embed = self.encode_graph(params, graph, r_cond)
        triples = graph["dec_triples"]
        scene_ids = graph["dec_objs_to_scene"]
        pred_mask = graph.get("dec_pred_mask")
        n = obj_embed.shape[0]
        shape = (n, self.cfg.box_dim)

        d = DDIMSchedule.create(self.schedule, steps, eta)
        ts = jnp.asarray(d.timesteps[::-1].copy(), jnp.int32)
        a_t = jnp.asarray(d.alphas[::-1].copy(), jnp.float32)
        a_prev = jnp.asarray(d.alphas_prev[::-1].copy(), jnp.float32)
        s1ma = jnp.asarray(d.sqrt_one_minus_alphas[::-1].copy(), jnp.float32)
        sig = jnp.asarray(d.sigmas[::-1].copy(), jnp.float32)

        rng, r_init = jax.random.split(r_loop)
        x = jax.random.normal(r_init, shape)
        step_rngs = jax.random.split(rng, len(d.timesteps))

        def body(x, inp):
            r, t_scalar, at, aprev, s, sg = inp
            t = jnp.full((n,), t_scalar, jnp.int32)
            e_t = self.apply_model(params, x, t, obj_embed, triples, latent,
                                   pred_mask)
            pred_x0 = (x - s * e_t) / jnp.sqrt(at)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev - sg**2, 0.0)) * e_t
            x = jnp.sqrt(aprev) * pred_x0 + dir_xt + sg * jax.random.normal(r, shape)
            return x, 0.0

        x, _ = jax.lax.scan(body, x, (step_rngs, ts, a_t, a_prev, s1ma, sig))
        return x

    def postprocess_boxes(self, x: Array) -> Array:
        """(N, 8) [size3, loc3, sin, cos] -> (N, 7) with angle."""
        return jnp.concatenate([x[:, :6], sincos_to_angle(x[:, 6:8])], axis=-1)
