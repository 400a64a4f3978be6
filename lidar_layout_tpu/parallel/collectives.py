"""Collective helpers — the pointcept ``utils/comm.py`` surface, TPU-natively.

Parity: ``pointcept/utils/comm.py:23-197`` (get_world_size/rank, all_gather,
reduce_dict, synchronize). Under SPMD these become ``jax.lax`` collectives
inside ``shard_map``/``pmap`` regions (ICI), or host-level helpers built on
``jax.experimental.multihost_utils`` for the DCN/process dimension. There is
no NCCL/Gloo split: one program, XLA emits the transfers.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (comm.synchronize equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("lidar_layout_tpu.sync")


# --- in-program collectives (use inside shard_map/pmap with an axis name) ----

def all_gather(x, axis_name: str = "dp"):
    """comm.all_gather equivalent inside an SPMD region."""
    return jax.lax.all_gather(x, axis_name)


def reduce_mean(x, axis_name: str = "dp"):
    return jax.lax.pmean(x, axis_name)


def reduce_dict(d: Dict[str, Any], axis_name: str = "dp",
                average: bool = True) -> Dict[str, Any]:
    """comm.reduce_dict (comm.py:171): reduce scalar dicts across replicas."""
    op = jax.lax.pmean if average else jax.lax.psum
    return {k: op(v, axis_name) for k, v in d.items()}


# --- host-level gathers (eval-style, outside jit) ----------------------------

def host_all_gather(x: np.ndarray) -> np.ndarray:
    """Gather numpy arrays from every process (comm.all_gather's pickle path).
    Single-process: identity with a leading axis."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(x), tiled=False))
