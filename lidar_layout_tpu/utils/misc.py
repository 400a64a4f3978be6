"""Misc utilities (parity: lidm/utils/misc_utils.py)."""
from __future__ import annotations

import random
from types import SimpleNamespace
from typing import Any, Dict

import numpy as np


def set_seed(seed: int) -> None:
    """Deterministic seeding (misc_utils.py:19-32). JAX randomness is already
    explicit via keys; this pins the host-side generators."""
    random.seed(seed)
    np.random.seed(seed)


def dict2namespace(d: Dict[str, Any]) -> SimpleNamespace:
    """Recursive dict -> attribute access (misc_utils dict2namespace)."""
    ns = SimpleNamespace()
    for k, v in d.items():
        setattr(ns, k, dict2namespace(v) if isinstance(v, dict) else v)
    return ns


def count_params(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
