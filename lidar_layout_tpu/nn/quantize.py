"""Vector quantization with taming VectorQuantizer2 semantics.

Parity target: the codebook lookup used by the reference VQ models
(``lidm/models/ae/autoencoder.py:46`` via taming's VectorQuantizer2, beta=0.25,
legacy loss form), plus the 1D variant for the per-object point AE
(``lidm/modules/encoders/vq.py:8``).

TPU-first: the nearest-neighbor search is one big (B*H*W, n_embed) matmul —
exactly what the MXU wants — rather than a loop or gather-heavy topk.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class VectorQuantizer(nn.Module):
    """Straight-through VQ over the channel (last) axis of NHWC or (B, N, C) input.

    loss = beta * mean((sg[z_q] - z)^2) + mean((z_q - sg[z])^2)   (legacy=True form)
    """

    n_embed: int
    embed_dim: int
    beta: float = 0.25
    # "taming": uniform(-1/n, 1/n) — parity with the reference's Embedding
    # init (converted checkpoints overwrite it anyway). "normal": N(0, 1) —
    # for from-scratch training: the taming ball (±1/n) is ~1e-4 wide while
    # encoder latents reach std ~4, so nearly all codes start equidistant-at-
    # the-origin and collapse (r03 diag: perplexity 30 of 2048).
    # NOTE: named codebook_init, not "init" — a field called `init` would
    # shadow flax's nn.Module.init and break the module's public API.
    codebook_init: str = "taming"

    @nn.compact
    def __call__(self, z: Array) -> Tuple[Array, Array, Array]:
        if self.codebook_init == "taming":
            cb_init = lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed,
                maxval=1.0 / self.n_embed)
        else:
            cb_init = nn.initializers.normal(1.0)
        codebook = self.param("embedding", cb_init,
                              (self.n_embed, self.embed_dim))

        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)

        # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e  — distance matrix via one matmul
        d = (jnp.sum(flat**2, axis=1, keepdims=True)
             + jnp.sum(cb**2, axis=1)[None, :]
             - 2.0 * jnp.dot(flat, cb.T, preferred_element_type=jnp.float32))
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(cb, idx, axis=0).reshape(z.shape).astype(z.dtype)

        commit = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        embed = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        loss = self.beta * commit + embed

        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss, idx.reshape(z.shape[:-1])

    def embed_code(self, codebook: Array, idx: Array) -> Array:
        return jnp.take(codebook, idx, axis=0)


def perplexity(indices: Array, n_embed: int) -> Tuple[Array, Array]:
    """Codebook usage stats (reference losses/__init__.py measure_perplexity)."""
    onehot = jax.nn.one_hot(indices.reshape(-1), n_embed)
    avg = onehot.mean(axis=0)
    perp = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    used = jnp.sum(avg > 0)
    return perp, used
