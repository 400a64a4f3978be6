"""Sonata (Sonata-v1m1): self-distillation pretraining for point transformers.

Parity: ``pointcept/models/sonata/sonata_v1m1_base.py``
  OnlineCluster head (:27-70 — MLP -> L2 normalize -> weight-normed prototype
  similarity), Sonata (:72-532): student/teacher PT-v3 pair with the teacher
  EMA-updated and gradient-free, ball masking of the student's view with
  cosine-scheduled mask size/ratio, teacher-temperature and momentum cosine
  schedules, and a DINO-style cross-entropy between teacher prototype
  assignments (centered, sharp temp) and student log-softmax (masked +
  unmasked loss terms).

TPU-first re-design: functional — params are one pytree
``{"student", "teacher", "center"}``; ``make_pretrain_step`` returns a single
jitted step that (1) draws a masked view on device, (2) computes the
distillation loss, (3) applies optax updates to the student only, (4) EMA-
updates teacher and prototype center. Schedules are closed-form functions of
the step counter traced into the program (cosine, :189-229). The reference's
hook lifecycle (before_train/before_step) collapses into this one function.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .ptv3 import PTv3, PTv3Config

Array = jax.Array


@dataclass(frozen=True)
class SonataConfig:
    """Defaults follow Sonata.__init__ (:73-102) at compact scale."""

    head_in_channels: int = 64          # PT-v3 decoder output width
    head_hidden_channels: int = 256     # reference: 4096
    head_embed_channels: int = 64       # reference: 512
    head_num_prototypes: int = 256      # reference: 4096
    mask_size_start: float = 0.1
    mask_size_base: float = 0.4
    mask_ratio_start: float = 0.3
    mask_ratio_base: float = 0.7
    warmup_ratio: float = 0.05
    teacher_temp_start: float = 0.04
    teacher_temp_base: float = 0.07
    student_temp: float = 0.1
    mask_loss_weight: float = 0.25
    unmask_loss_weight: float = 0.5
    momentum_base: float = 0.996
    momentum_final: float = 1.0
    center_momentum: float = 0.9
    total_steps: int = 10_000


class OnlineCluster(nn.Module):
    """MLP -> L2 normalize -> weight-normalized prototype logits (:27-70)."""

    hidden: int
    embed: int
    num_prototypes: int

    @nn.compact
    def __call__(self, feat: Array) -> Array:
        h = nn.Dense(self.hidden, name="mlp1")(feat)
        h = nn.Dense(self.embed, name="mlp2")(jax.nn.gelu(h))
        # rsqrt(sum+eps), not x/max(||x||, eps): padded rows have h == 0 and
        # the divide form's gradient is 0/0 = NaN there
        h = h * jax.lax.rsqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-12)
        v = self.param("prototype_v", nn.initializers.normal(0.02),
                       (self.num_prototypes, self.embed))
        # weight-norm with gain fixed to 1 (:43-54): rows live on the sphere
        w = v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)
        return h @ w.T


class SonataNet(nn.Module):
    """Backbone + mask/unmask OnlineCluster heads (one tower)."""

    backbone_cfg: PTv3Config
    cfg: SonataConfig

    @nn.compact
    def __call__(self, coord: Array, feat: Array, mask: Array,
                 deterministic: bool = True) -> Dict[str, Array]:
        h, _ = PTv3(self.backbone_cfg, name="backbone")(
            coord, feat, mask, deterministic=deterministic)
        c = self.cfg
        out = {"feat": h}
        out["mask_sim"] = OnlineCluster(c.head_hidden_channels,
                                        c.head_embed_channels,
                                        c.head_num_prototypes,
                                        name="mask_head")(h)
        out["unmask_sim"] = OnlineCluster(c.head_hidden_channels,
                                          c.head_embed_channels,
                                          c.head_num_prototypes,
                                          name="unmask_head")(h)
        return out


def _cosine(step, start, base, warmup, total):
    """CosineScheduler (:189-229): linear warmup start->base, then base."""
    t = jnp.clip(step / jnp.maximum(warmup, 1), 0.0, 1.0)
    return start + (base - start) * t


def ball_mask(rng: Array, coord: Array, mask: Array, mask_size: Array,
              mask_ratio: Array, n_seeds: int = 32) -> Array:
    """Ball masking: points within ``mask_size`` of accepted random seeds are
    masked; seeds accepted until ~mask_ratio of valid points are covered."""
    n = coord.shape[0]
    seed_idx = jax.random.choice(rng, n, (n_seeds,), replace=False)
    d2 = jnp.sum((coord[:, None] - coord[seed_idx][None]) ** 2, axis=-1)
    covered = d2 <= mask_size ** 2                        # (n, n_seeds)
    # accept a prefix of seeds so coverage approximates mask_ratio
    cum = jnp.cumsum(covered, axis=1) > 0                 # coverage by prefix
    frac = (cum & mask[:, None]).sum(0) / jnp.maximum(mask.sum(), 1)
    k = jnp.argmin(jnp.abs(frac - mask_ratio))
    return (cum[:, k] & mask)


class Sonata:
    """Functional student/teacher pair (:72-532)."""

    def __init__(self, backbone_cfg: PTv3Config, cfg: SonataConfig):
        self.net = SonataNet(backbone_cfg, cfg)
        self.cfg = cfg

    def init(self, rng: Array, coord: Array, feat: Array,
             mask: Array) -> Dict[str, Any]:
        params = self.net.init(rng, coord, feat, mask)
        return {"student": params, "teacher": jax.tree.map(jnp.copy, params),
                "center": jnp.zeros((self.cfg.head_num_prototypes,))}

    def loss(self, state: Dict[str, Any], rng: Array, coord: Array,
             feat: Array, mask: Array, step: Array):
        c = self.cfg
        warm = c.total_steps * c.warmup_ratio
        m_size = _cosine(step, c.mask_size_start, c.mask_size_base, warm,
                         c.total_steps)
        m_ratio = _cosine(step, c.mask_ratio_start, c.mask_ratio_base, warm,
                          c.total_steps)
        t_temp = _cosine(step, c.teacher_temp_start, c.teacher_temp_base,
                         warm, c.total_steps)

        r_mask, r_drop = jax.random.split(rng)
        masked = ball_mask(r_mask, coord, mask, m_size, m_ratio)
        student_feat = jnp.where(masked[:, None], 0.0, feat)

        s_out = self.net.apply(state["student"], coord, student_feat, mask)
        t_out = jax.lax.stop_gradient(
            self.net.apply(state["teacher"], coord, feat, mask))

        def dino_ce(s_sim, t_sim, sel):
            t_prob = jax.nn.softmax((t_sim - state["center"]) / t_temp, -1)
            s_logp = jax.nn.log_softmax(s_sim / c.student_temp, -1)
            ce = -(t_prob * s_logp).sum(-1)
            w = sel.astype(ce.dtype)
            return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        loss = (c.mask_loss_weight * dino_ce(s_out["mask_sim"],
                                             t_out["mask_sim"], masked)
                + c.unmask_loss_weight * dino_ce(s_out["unmask_sim"],
                                                 t_out["unmask_sim"],
                                                 mask & ~masked))
        batch_center = (t_out["unmask_sim"] * mask[:, None]).sum(0) \
            / jnp.maximum(mask.sum(), 1.0)
        return loss, batch_center

    def make_pretrain_step(self, tx: optax.GradientTransformation):
        c = self.cfg

        @jax.jit
        def step_fn(state, opt_state, rng, coord, feat, mask, step):
            (loss, batch_center), grads = jax.value_and_grad(
                self.loss, has_aux=True)(state, rng, coord, feat, mask, step)
            updates, opt_state = tx.update(grads["student"], opt_state,
                                           state["student"])
            student = optax.apply_updates(state["student"], updates)
            mom = c.momentum_base + (c.momentum_final - c.momentum_base) \
                * jnp.clip(step / c.total_steps, 0.0, 1.0)
            teacher = jax.tree.map(lambda t, s: mom * t + (1 - mom) * s,
                                   state["teacher"], student)
            center = c.center_momentum * state["center"] \
                + (1 - c.center_momentum) * batch_center
            return ({"student": student, "teacher": teacher,
                     "center": center}, opt_state, loss)

        return step_fn
