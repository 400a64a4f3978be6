"""Approximate Earth Mover's Distance via auction assignment, in pure XLA.

Replaces the reference CUDA kernel (``lidm/eval/modules/emd/emd_cuda.cu`` —
Bertsekas auction, point counts multiple of 1024, iters=50, eps=0.005; wrapper
semantics in ``metric_utils.py:447-458``: ``dist, _ = emd(x, y, 0.005, 50);
sqrt(dist).mean()``).

The auction is inherently iterative; here each Jacobi round is fully vectorized
(top-2 benefits + scatter-max bid resolution) inside ``lax.fori_loop`` so the
whole solve is one compiled program. The object-owner array is the single
source of truth — reassignment implicitly evicts the previous owner. Points
still unassigned after the iteration budget fall back to nearest neighbor (the
reference's truncated auction is likewise approximate).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BIG = 1e10


EPS_PHASES = (50.0, 10.0, 2.0, 1.0)  # epsilon-scaling multipliers


@partial(jax.jit, static_argnames=("iters",))
def auction_match(x: Array, y: Array, eps: float = 0.005, iters: int = 200
                  ) -> Array:
    """(N, D) vs (N, D) -> (N,) mapping each x to a (mostly) distinct y.

    Epsilon scaling: prices warm-start across phases of decreasing eps while
    assignments reset, the classic Bertsekas accelerant. The default 200 Jacobi
    rounds do comparable work to the reference's 50 multi-sweep CUDA
    iterations; rounds are O(N^2) top-2 reductions, trivial on TPU for the
    1024-point clouds the EMD metric uses.
    """
    n = x.shape[0]
    d = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)  # (N, N)
    ar = jnp.arange(n)

    def derive_assign(owner):
        return jnp.full((n,), -1, jnp.int32).at[
            jnp.where(owner >= 0, owner, n - 1)].max(
            jnp.where(owner >= 0, ar, -1).astype(jnp.int32))

    def make_round(eps_k):
        def round_fn(_, state):
            prices, owner = state  # owner[j] = bidder index or -1
            unassigned = derive_assign(owner) < 0

            benefit = -d - prices[None, :]
            top2_vals, top2_idx = jax.lax.top_k(benefit, 2)
            best_y = top2_idx[:, 0]
            gamma = top2_vals[:, 0] - top2_vals[:, 1] + eps_k
            bid = jnp.where(unassigned, gamma, -BIG)

            best_bid = jnp.full((n,), -BIG).at[best_y].max(bid)  # per object
            won = unassigned & (bid >= best_bid[best_y]) & (bid > -BIG)
            # tie-break to the lowest bidder index
            winner = jnp.full((n,), n, jnp.int32).at[
                jnp.where(won, best_y, n - 1)].min(
                jnp.where(won, ar, n).astype(jnp.int32))

            got_bid = winner < n
            owner = jnp.where(got_bid, jnp.clip(winner, 0, n - 1), owner)
            prices = prices + jnp.where(got_bid, best_bid, 0.0)
            return prices, owner
        return round_fn

    prices = jnp.zeros((n,))
    owner = jnp.full((n,), -1, jnp.int32)
    per_phase = max(iters // len(EPS_PHASES), 1)
    for scale in EPS_PHASES:
        owner = jnp.full((n,), -1, jnp.int32)  # re-match at the finer eps
        prices, owner = jax.lax.fori_loop(0, per_phase, make_round(eps * scale),
                                          (prices, owner))

    assign = derive_assign(owner)
    nn = jnp.argmin(d, axis=-1)
    return jnp.where(assign >= 0, assign, nn)


def emd_distance(x: Array, y: Array, eps: float = 0.005, iters: int = 200
                 ) -> Array:
    """Reference wrapper semantics: truncate to a multiple of 1024, match,
    return sqrt(per-point squared dist).mean()."""
    n = min(x.shape[0], y.shape[0])
    n = n - n % 1024
    if n == 0:
        n = min(x.shape[0], y.shape[0])
    x, y = x[:n], y[:n]
    assign = auction_match(x, y, eps, iters)
    dsq = jnp.sum((x - y[assign]) ** 2, axis=-1)
    return jnp.sqrt(dsq).mean()
