"""Latent-diffusion training: one jitted SPMD step.

Replaces the reference's Lightning ``training_step`` + DDP (main.py:751,
ddpm.py:343): encode first stage (frozen), sample t, p_losses, AdamW update,
EMA — all inside a single XLA program with donated state. Data parallelism
comes from sharding the batch over the mesh; XLA inserts the gradient
all-reduce (the NCCL allreduce equivalent) automatically.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from ..models.diffusion import LatentDiffusion
from ..nn.ema import EmaState, init_ema, update_ema

Array = jax.Array


@chex.dataclass
class DiffusionTrainState:
    params: Any          # {"unet", "first_stage", "cond_stage", "logvar"}
    opt_state: Any
    ema: EmaState        # over the U-Net (+ cond stage when trainable)
    step: Array


def trainable_keys(model: LatentDiffusion) -> Tuple[str, ...]:
    keys = ["unet"]
    if model.cfg.cond_stage_trainable and model.cond_stage is not None:
        keys.append("cond_stage")
    if model.cfg.learn_logvar:
        keys.append("logvar")
    return tuple(keys)


def split_params(params: Dict[str, Any], keys: Tuple[str, ...]):
    train = {k: params[k] for k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return train, frozen


def make_optimizer(lr, weight_decay: float = 1e-2,
                   grad_clip: Optional[float] = None,
                   accumulate: int = 1) -> optax.GradientTransformation:
    """AdamW as in configure_optimizers (ddpm.py:1378).

    ``lr`` may be a float or an optax schedule (the LambdaWarmUpCosine family
    from ``train/lr_schedule.py``). ``accumulate > 1`` wraps the optimizer in
    ``optax.MultiSteps`` — the reference's accumulate_grad_batches
    (main.py:712-717): updates apply every k-th step, gradients average over
    the window, so k micro-steps at batch b match one step at batch k*b."""
    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(lr, weight_decay=weight_decay))
    tx = optax.chain(*txs)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def create_train_state(model: LatentDiffusion, params: Dict[str, Any],
                       tx: optax.GradientTransformation) -> DiffusionTrainState:
    keys = trainable_keys(model)
    train, _ = split_params(params, keys)
    return DiffusionTrainState(
        params=params,
        opt_state=tx.init(train),
        ema=init_ema(train),
        step=jnp.zeros((), jnp.int32),
    )


def _make_raw_step(model: LatentDiffusion, tx: optax.GradientTransformation,
                   ema_decay: float, deterministic: Optional[bool]) -> Callable:
    """Unjitted step(state, batch, rng) -> (state, logs); shared by the
    one-dispatch-per-step and scan-chunked drivers."""
    keys = trainable_keys(model)
    if deterministic is None:
        deterministic = getattr(getattr(model.unet, "cfg", None),
                                "dropout", 0.0) == 0.0

    def loss_fn(train_params, frozen_params, rng, batch):
        params = {**train_params, **frozen_params}
        return model.training_loss(params, rng, batch,
                                   deterministic=deterministic)

    def step(state: DiffusionTrainState, batch: Dict[str, Array], rng: Array):
        train, frozen = split_params(state.params, keys)
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train, frozen, rng, batch)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)
        ema = update_ema(state.ema, train, ema_decay)
        params = {**train, **frozen}
        logs = dict(logs)
        logs["grad_norm"] = optax.global_norm(grads)
        return DiffusionTrainState(params=params, opt_state=opt_state, ema=ema,
                                   step=state.step + 1), logs

    return step


def make_train_step(model: LatentDiffusion, tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999, donate: bool = False,
                    deterministic: Optional[bool] = None) -> Callable:
    """Returns step(state, batch, rng) -> (state, logs).

    ``donate=True`` reuses the input state's buffers in-place (halves peak HBM
    for big models) but invalidates the passed-in state — callers must always
    continue from the returned one.

    ``deterministic`` defaults to "dropout off iff the U-Net config has
    dropout == 0" so configs with dropout > 0 (e.g. the reference's
    layout_cond_c2_p4.yaml, unet dropout: 0.1) actually train with dropout;
    p_losses threads the rng through apply_model."""
    raw = _make_raw_step(model, tx, ema_decay, deterministic)
    return jax.jit(raw, donate_argnums=(0,) if donate else ())


def chunk_steps(raw_step: Callable, batch_fn: Callable, n_inner: int,
                donate: bool = False) -> Callable:
    """Fuse ``n_inner`` training steps into ONE XLA program via ``lax.scan``.

    Returns step(state, rng) -> (state, logs-of-last-inner-step). Each inner
    step derives its own rng (``fold_in(rng, i)``) and builds its micro-batch
    *on device* with ``batch_fn(rng_b) -> batch dict`` — e.g. gathering from a
    device-resident sample pool. This is the TPU-idiomatic answer to
    per-step launcher/dispatch overhead (the reference pays a Python
    Lightning hook cycle per step, main.py:751; through the axon relay one
    dispatch costs ~35 ms — at K=64 that amortizes to <1 ms/step).

    The scan carries the full train state, so XLA cannot hoist the body
    (PERF.md pitfall 3). ``donate=True`` recycles the state buffers across
    the chunk boundary — opt-in because the axon TPU relay rejects the
    donated-scan-carry program with INVALID_ARGUMENT (PERF.md pitfall 4);
    on direct TPU runtimes it halves peak HBM for big models.

    Large device-resident pools must flow through the optional ``data``
    argument (``step(state, rng, data=pool)`` with ``batch_fn(rng, data)``)
    rather than a ``batch_fn`` closure: closed-over arrays are baked into
    the lowered program as literal constants, and a >~0.5 GB pool then
    overflows the serialized-HLO upload to a remote compiler (observed:
    HTTP 413 through the axon relay at pool=2048 64x1024 scans)."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: DiffusionTrainState, rng: Array, data=None):
        def body(carry, i):
            r = jax.random.fold_in(rng, i)
            r_batch, r_step = jax.random.split(r)
            batch = batch_fn(r_batch) if data is None \
                else batch_fn(r_batch, data)
            return raw_step(carry, batch, r_step)

        state, logs = jax.lax.scan(body, state, jnp.arange(n_inner))
        return state, jax.tree.map(lambda x: x[-1], logs)

    return step


def make_chunked_train_step(model: LatentDiffusion,
                            tx: optax.GradientTransformation,
                            batch_fn: Callable, n_inner: int,
                            ema_decay: float = 0.9999, donate: bool = False,
                            deterministic: Optional[bool] = None) -> Callable:
    """Scan-chunked variant of make_train_step: step(state, rng) runs
    ``n_inner`` optimizer steps per dispatch, micro-batches built on device by
    ``batch_fn``."""
    raw = _make_raw_step(model, tx, ema_decay, deterministic)
    return chunk_steps(raw, batch_fn, n_inner, donate=donate)


def ema_params(model: LatentDiffusion, state: DiffusionTrainState) -> Dict[str, Any]:
    """Full params with the EMA weights swapped in (ema_scope equivalent)."""
    keys = trainable_keys(model)
    _, frozen = split_params(state.params, keys)
    return {**state.ema.params, **frozen}


def make_val_step(model: LatentDiffusion) -> Callable:
    """validation_step (ddpm.py:882-895): the shared-step loss with current
    AND EMA weights, deterministic. Feeds ``val/loss_simple{,_ema}`` — the
    reference's checkpoint monitor."""

    @jax.jit
    def val_step(state: DiffusionTrainState, batch: Dict[str, Array],
                 rng: Array) -> Dict[str, Array]:
        _, logs = model.training_loss(state.params, rng, batch,
                                      deterministic=True)
        _, logs_ema = model.training_loss(ema_params(model, state), rng,
                                          batch, deterministic=True)
        return {"loss_simple": logs["loss_simple"],
                "loss": logs["loss"],
                "loss_simple_ema": logs_ema["loss_simple"]}

    return val_step
