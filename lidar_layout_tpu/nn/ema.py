"""Exponential moving average over parameter pytrees.

Parity: ``lidm/modules/ema.py`` LitEma — decay warmup min(decay, (1+step)/(10+step)),
stored alongside the train state and swapped in for eval/sampling (ema_scope).
In JAX the "scope" is just using the ema params pytree for apply().
"""
from __future__ import annotations

from typing import Any

import chex
import jax
import jax.numpy as jnp


@chex.dataclass
class EmaState:
    params: Any
    step: jnp.ndarray  # int32 scalar


def init_ema(params) -> EmaState:
    return EmaState(params=jax.tree.map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def update_ema(state: EmaState, new_params, decay: float = 0.9999) -> EmaState:
    step = state.step + 1
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    ema = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)),
                       state.params, new_params)
    return EmaState(params=ema, step=step)
