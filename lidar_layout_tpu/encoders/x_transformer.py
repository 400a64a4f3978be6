"""x-transformers feature set in flax — the vendored library's used+notable
surface, compact.

Parity: ``lidm/modules/x_transformer.py`` (642-line vendored torch library) —
AbsolutePositionalEmbedding (:25), FixedPositionalEmbedding / position-infused
attention (:39, :404), Scale (:120), Rezero (:131), ScaleNorm (:142), RMSNorm
(:154), GRUGating / gate_residual (:171), GEGLU + FeedForward (:187-217),
Attention with talking heads / sparse top-k / memory key-values / attention-on-
attention (:218-372), AttentionLayers with pre/post norm, macaron, sandwich
coef, residual attention, cross attention (:373-543), Encoder (:544),
TransformerWrapper with memory tokens + tied embeddings (:550-642).

The conditioning path (BERTEmbedder / TransformerEmbedder in
``encoders/modules.py``) keeps its compact stand-in for checkpoint-template
compatibility; this module supplies the full configurable library for parity
with x-transformer-style configs.

TPU notes: everything is dense matmul + softmax (MXU/XLA territory); the
sparse_topk path uses ``jax.lax.top_k`` over lanes, fine at text lengths.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
DEFAULT_DIM_HEAD = 64


class ScaleNorm(nn.Module):
    """g * x / ||x|| (:142-151)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (1,))
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        scale = x.shape[-1] ** -0.5
        return x / jnp.maximum(n * scale, self.eps) * g


class RMSNorm(nn.Module):
    """g * x / rms(x) (:154-163)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        scale = x.shape[-1] ** -0.5
        return x / jnp.maximum(n * scale, self.eps) * g


def make_norm(kind: str, name: str):
    if kind == "scale":
        return ScaleNorm(name=name)
    if kind == "rms":
        return RMSNorm(name=name)
    return nn.LayerNorm(name=name)


def fixed_positional_embedding(n: int, dim: int, offset: int = 0) -> Array:
    """Sinusoidal table (:39-49): (n, dim) [sin | cos]."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2) / dim))
    t = jnp.arange(n) + offset
    sinusoid = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)


class GEGLU(nn.Module):
    """x * gelu(gate) projection (:187-194)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(g)


class FeedForward(nn.Module):
    """(:197-215); glu switches the first projection to GEGLU."""

    dim: int
    mult: int = 4
    glu: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        inner = self.dim * self.mult
        if self.glu:
            h = GEGLU(inner, name="geglu")(x)
        else:
            h = jax.nn.gelu(nn.Dense(inner, name="fc1")(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, name="fc2")(h)


class Attention(nn.Module):
    """Multi-head attention with the library's optional features (:218-372):
    talking heads (pre/post softmax head mixing), sparse top-k logits,
    per-head memory key-values, attention-on-attention output projection.
    """

    dim: int
    dim_head: int = DEFAULT_DIM_HEAD
    heads: int = 8
    causal: bool = False
    talking_heads: bool = False
    sparse_topk: Optional[int] = None
    num_mem_kv: int = 0
    dropout: float = 0.0
    on_attn: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 pia_emb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        kv_in = x if context is None else context
        if pia_emb is not None:        # position-infused attention (:404)
            x = x + pia_emb[None, :n]
            if context is None:
                kv_in = x

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(kv_in)
        v = nn.Dense(inner, use_bias=False, name="to_v")(kv_in)
        m = kv_in.shape[1]

        def split(t, ln):
            return t.reshape(b, ln, h, d).transpose(0, 2, 1, 3)

        q, k, v = split(q, n), split(k, m), split(v, m)

        if self.num_mem_kv > 0:        # learned memory key/values (:246,:300)
            mem_k = self.param("mem_k", nn.initializers.normal(0.02),
                               (h, self.num_mem_kv, d))
            mem_v = self.param("mem_v", nn.initializers.normal(0.02),
                               (h, self.num_mem_kv, d))
            k = jnp.concatenate(
                [jnp.broadcast_to(mem_k, (b, h, self.num_mem_kv, d)), k], 2)
            v = jnp.concatenate(
                [jnp.broadcast_to(mem_v, (b, h, self.num_mem_kv, d)), v], 2)
            m = m + self.num_mem_kv
            if context_mask is None and mask is not None and context is None:
                context_mask = mask
            if context_mask is not None:
                context_mask = jnp.concatenate(
                    [jnp.ones((b, self.num_mem_kv), bool), context_mask], 1)
        elif context_mask is None and context is None:
            context_mask = mask

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** -0.5)
        big_neg = jnp.finfo(dots.dtype).min

        if self.talking_heads:         # head mixing before softmax (:240-244)
            pre = self.param("pre_softmax_proj",
                             nn.initializers.normal(0.02), (h, h))
            dots = jnp.einsum("bhij,hk->bkij", dots, pre)

        if context_mask is not None:
            dots = jnp.where(context_mask[:, None, None, :], dots, big_neg)
        if self.causal:
            causal_mask = jnp.tril(jnp.ones((n, m), bool), m - n)
            dots = jnp.where(causal_mask[None, None], dots, big_neg)
        if self.sparse_topk is not None and self.sparse_topk < m:
            topv = jax.lax.top_k(dots, self.sparse_topk)[0][..., -1:]
            dots = jnp.where(dots >= topv, dots, big_neg)

        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        if self.talking_heads:         # and after (:242-244)
            post = self.param("post_softmax_proj",
                              nn.initializers.normal(0.02), (h, h))
            attn = jnp.einsum("bhij,hk->bkij", attn, post)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if self.on_attn:               # attention-on-attention (:369-371)
            g = nn.Dense(self.dim * 2, name="to_out")(out)
            a, gate = jnp.split(g, 2, axis=-1)
            return a * jax.nn.sigmoid(gate)
        return nn.Dense(self.dim, name="to_out")(out)


class AttentionLayers(nn.Module):
    """Encoder/decoder stack with the library's layout flags (:373-543)."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = DEFAULT_DIM_HEAD
    causal: bool = False
    cross_attend: bool = False
    norm: str = "layer"                # "layer" | "scale" | "rms"
    use_rezero: bool = False
    position_infused_attn: bool = False
    macaron: bool = False
    pre_norm: bool = True
    residual_attn: bool = False
    gate_residual: bool = False
    ff_glu: bool = False
    ff_mult: int = 4
    attn_talking_heads: bool = False
    attn_sparse_topk: Optional[int] = None
    attn_num_mem_kv: int = 0
    dropout: float = 0.0

    def _residual(self, name: str):
        if self.gate_residual:         # GRUGating (:171-184)
            cell = nn.GRUCell(self.dim, name=name)

            def gate(new, old):
                b, n, d2 = new.shape
                out, _ = cell(old.reshape(-1, d2), new.reshape(-1, d2))
                return out.reshape(b, n, d2)

            return gate
        return lambda new, old: new + old

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        pia = (fixed_positional_embedding(x.shape[1], self.dim)
               if self.position_infused_attn else None)

        def rezero_or_norm(i, kind):
            if self.use_rezero:        # Rezero (:131-139): g starts at 0
                g = self.param(f"rezero_{kind}{i}", nn.initializers.zeros,
                               (1,))
                return None, g
            return make_norm(self.norm, f"norm_{kind}{i}"), None

        for i in range(self.depth):
            blocks = []
            if self.macaron:           # half-step FF before attention (:436)
                blocks.append(("ff_pre", FeedForward(
                    self.dim, self.ff_mult, self.ff_glu, self.dropout,
                    name=f"ff_pre{i}"), 0.5))
            blocks.append(("attn", Attention(
                self.dim, self.dim_head, self.heads, self.causal,
                self.attn_talking_heads, self.attn_sparse_topk,
                self.attn_num_mem_kv, self.dropout,
                name=f"attn{i}"), 1.0))
            if self.cross_attend:
                blocks.append(("cross", Attention(
                    self.dim, self.dim_head, self.heads, False,
                    self.attn_talking_heads, self.attn_sparse_topk,
                    self.attn_num_mem_kv, self.dropout,
                    name=f"cross{i}"), 1.0))
            blocks.append(("ff", FeedForward(
                self.dim, self.ff_mult, self.ff_glu, self.dropout,
                name=f"ff{i}"), 1.0))

            for kind, block, scale in blocks:
                norm, g = rezero_or_norm(i, kind)
                residual = self._residual(f"gru_{kind}{i}") \
                    if self.gate_residual else (lambda new, old: new + old)
                h = x
                if norm is not None and self.pre_norm:
                    h = norm(h)
                if kind in ("attn",):
                    h = block(h, mask=mask, pia_emb=pia,
                              deterministic=deterministic)
                elif kind == "cross":
                    h = block(h, context=context, mask=mask,
                              context_mask=context_mask,
                              deterministic=deterministic)
                else:
                    h = block(h, deterministic=deterministic)
                h = h * scale
                if g is not None:
                    h = h * g
                x = residual(h, x)
                if norm is not None and not self.pre_norm:
                    x = norm(x)
        if self.pre_norm and not self.use_rezero:
            x = make_norm(self.norm, "final_norm")(x)
        return x


class Encoder(AttentionLayers):
    """Non-causal AttentionLayers (:544-548)."""

    causal: bool = False


class Decoder(AttentionLayers):
    causal: bool = True


class TransformerWrapper(nn.Module):
    """Token embedding + abs pos + memory tokens + head (:550-642)."""

    num_tokens: int
    max_seq_len: int
    attn_layers: AttentionLayers
    emb_dim: Optional[int] = None
    num_memory_tokens: int = 0
    tie_embedding: bool = False
    use_pos_emb: bool = True
    emb_dropout: float = 0.0
    return_logits: bool = True

    @nn.compact
    def __call__(self, tokens: Array, mask: Optional[Array] = None,
                 return_embeddings: bool = False,
                 deterministic: bool = True) -> Array:
        dim = self.attn_layers.dim
        emb_dim = self.emb_dim or dim
        b, n = tokens.shape

        token_emb = self.param("token_emb", nn.initializers.normal(0.02),
                               (self.num_tokens, emb_dim))
        x = token_emb[tokens]
        if self.use_pos_emb and not self.attn_layers.position_infused_attn:
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (self.max_seq_len, emb_dim))
            x = x + pos[None, :n]
        x = nn.Dropout(self.emb_dropout, deterministic=deterministic)(x)
        if emb_dim != dim:
            x = nn.Dense(dim, name="project_emb")(x)

        if self.num_memory_tokens > 0:  # (:591-596,:611-617)
            mem = self.param("memory_tokens", nn.initializers.normal(0.02),
                             (self.num_memory_tokens, dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(mem, (b, self.num_memory_tokens, dim)), x],
                axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((b, self.num_memory_tokens), bool), mask], 1)

        x = self.attn_layers(x, mask=mask, deterministic=deterministic)

        if self.num_memory_tokens > 0:
            x = x[:, self.num_memory_tokens:]

        if return_embeddings or not self.return_logits:
            return x
        if self.tie_embedding:
            return x @ token_emb.T
        return nn.Dense(self.num_tokens, name="to_logits")(x)
