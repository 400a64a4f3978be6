"""Transformer blocks for cross-attention conditioning in the diffusion U-Net.

Parity: ``lidm/modules/attention.py`` — CrossAttention (:152),
BasicTransformerBlock (:196, GEGLU feed-forward), SpatialTransformer (:218,
zero-initialized output projection so the block starts as identity).

TPU-first: attention goes through ``jax.nn.dot_product_attention`` so XLA can pick
the fused (flash) TPU path; sequence lengths here are small (<= 2048) so full
attention maps directly onto the MXU.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            h = jax.nn.gelu(nn.Dense(inner, dtype=self.dtype, name="in")(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(dim, dtype=self.dtype, name="out")(h)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``context`` is None."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None, deterministic: bool = True) -> Array:
        b, n, dim = x.shape
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, ctx.shape[1], self.heads, self.dim_head)
        v = v.reshape(b, ctx.shape[1], self.heads, self.dim_head)

        attn_mask = None
        if mask is not None:
            # mask: (B, S) True = attend; broadcast to (B, 1, 1, S)
            attn_mask = mask[:, None, None, :]

        from ..ops.pallas_attention import attend
        out = attend(q, k, v, mask=attn_mask)
        out = out.reshape(b, n, inner)
        out = nn.Dense(dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        x = x + CrossAttention(self.heads, self.dim_head, self.dropout,
                               dtype=self.dtype, name="attn1")(
            nn.LayerNorm(dtype=jnp.float32, name="norm1")(x),
            deterministic=deterministic)
        x = x + CrossAttention(self.heads, self.dim_head, self.dropout,
                               dtype=self.dtype, name="attn2")(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(x), context=context,
            mask=context_mask, deterministic=deterministic)
        x = x + FeedForward(glu=self.gated_ff, dropout=self.dropout,
                            dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=jnp.float32, name="norm3")(x),
            deterministic=deterministic)
        return x


class SpatialTransformer(nn.Module):
    """Image-to-sequence transformer wrapper: norm -> 1x1 in -> blocks -> 1x1 out(0).

    The output projection is zero-initialized so the module starts as identity
    (attention.py:218-259 parity).
    """

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.heads, self.dim_head, self.dropout,
                                      dtype=self.dtype,
                                      name=f"block_{i}")(
                x, context=context, context_mask=context_mask,
                deterministic=deterministic)
        x = x.reshape(b, h, w, inner)
        x = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="proj_out")(x)
        return x + residual
