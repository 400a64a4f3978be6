"""pointops2 fused window-attention + relative-position-encoding ops.

Parity targets (pointcept/libs/pointops2/functions/pointops.py — the CUDA
kernels written for the stratified transformer):
  attention_step1 (:93-168)                  q·k over an edge list -> (M, h)
  attention_step2 (:261-337)                 attn-weighted scatter of v -> (N, h, d)
  dot_prod_with_idx (:407-475)               RPE position-bias lookup -> (M, h)
  attention_step2_with_rel_pos_value (:758-853)  step2 with RPE value tables

TPU-first: each op is a gather + (masked) ``segment_sum`` — XLA fuses the
gathers into the surrounding compute and ``jax.grad`` derives the exact
backward kernels the reference hand-writes in CUDA (its grads are themselves
gathers/scatters of the same structure). The edge list (index0, index1) is a
fixed-capacity M with a validity mask instead of a ragged count, so the whole
attention jits with static shapes.

Edge convention: edge m attends query index0[m] to key/value index1[m];
index0 need not be sorted (the reference's *_v2 variants requiring sorted
offsets are a CUDA-locality concern only — segment_sum is order-free).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked(x: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return x
    return jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, 0.0)


def attention_step1(q: Array, k: Array, index0: Array, index1: Array,
                    mask: Optional[Array] = None) -> Array:
    """Per-edge q·k: out[m, i] = <q[index0[m], i], k[index1[m], i]>.

    q, k: (N, h, d); index0/index1: (M,) int; mask: (M,) bool for padded edges.
    Returns (M, h). Parity: AttentionStep1.forward (pointops.py:93-120).
    """
    attn = jnp.einsum("mhd,mhd->mh", q[index0], k[index1])
    return _masked(attn, mask)


def attention_step2(attn: Array, v: Array, index0: Array, index1: Array,
                    n_out: int, mask: Optional[Array] = None) -> Array:
    """Weighted scatter of values: out[n, i] = Σ_{m: index0[m]=n} attn[m,i]·v[index1[m],i].

    attn: (M, h); v: (N, h, d). Returns (n_out, h, d).
    Parity: AttentionStep2.forward (pointops.py:261-290).
    """
    vals = _masked(attn[..., None] * v[index1], mask)
    return jax.ops.segment_sum(vals, index0, num_segments=n_out)


def dot_prod_with_idx(q: Array, index: Array, table: Array, rel_idx: Array,
                      mask: Optional[Array] = None) -> Array:
    """RPE position bias: out[m, i] = Σ_d <q[index[m], i], table[rel_idx[m,d], i, :, d]>.

    q: (N, h, d); table: (L, h, d, 3) — one learned embedding table per
    spatial axis; rel_idx: (M, 3) quantized relative offsets. Returns (M, h).
    Parity: DotProdWithIdx.forward (pointops.py:407-431).
    """
    qg = q[index]  # (M, h, d)
    out = 0.0
    for d in range(rel_idx.shape[1]):
        out = out + jnp.einsum("mhd,mhd->mh", qg, table[rel_idx[:, d], :, :, d])
    return _masked(out, mask)


def relative_pos_value(table: Array, rel_idx: Array) -> Array:
    """Σ_d table[rel_idx[:, d], :, :, d] -> (M, h, d) positional values."""
    pe = 0.0
    for d in range(rel_idx.shape[1]):
        pe = pe + table[rel_idx[:, d], :, :, d]
    return pe


def attention_step2_with_rel_pos_value(attn: Array, v: Array, index0: Array,
                                       index1: Array, table: Array,
                                       rel_idx: Array, n_out: int,
                                       mask: Optional[Array] = None) -> Array:
    """step2 where each edge's value is v[index1[m]] + RPE(rel_idx[m]).

    Parity: AttentionStep2WithRelPosValue.forward (pointops.py:758-788).
    """
    vals = attn[..., None] * (v[index1] + relative_pos_value(table, rel_idx))
    return jax.ops.segment_sum(_masked(vals, mask), index0,
                               num_segments=n_out)


def segment_softmax(scores: Array, index0: Array, n_seg: int,
                    mask: Optional[Array] = None) -> Array:
    """Numerically-stable softmax over edges sharing a query (scatter-softmax
    — the composition the stratified transformer builds from exp + scatter_max
    + scatter_sum). scores: (M, h); returns (M, h)."""
    neg = jnp.full_like(scores, -jnp.inf)
    s = scores if mask is None else jnp.where(mask[:, None], scores, neg)
    seg_max = jax.ops.segment_max(s, index0, num_segments=n_seg)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    e = jnp.exp(s - seg_max[index0])
    e = _masked(e, mask)
    den = jax.ops.segment_sum(e, index0, num_segments=n_seg)
    return e / jnp.maximum(den[index0], 1e-12)


def window_attention(q: Array, k: Array, v: Array, index0: Array,
                     index1: Array, n_out: int,
                     table_q: Optional[Array] = None,
                     table_v: Optional[Array] = None,
                     rel_idx: Optional[Array] = None,
                     mask: Optional[Array] = None,
                     scale: Optional[float] = None) -> Array:
    """Full fused sparse window attention over an edge list — the op sequence
    the stratified transformer composes from the kernels above
    (stratified_transformer_v1m1_origin.py WindowAttention.forward):
    step1 (+RPE bias) -> scatter-softmax -> step2 (+RPE values).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    attn = attention_step1(q * scale, k, index0, index1, mask)
    if table_q is not None and rel_idx is not None:
        attn = attn + dot_prod_with_idx(q * scale, index0, table_q, rel_idx,
                                        mask)
    attn = segment_softmax(attn, index0, n_out, mask)
    if table_v is not None and rel_idx is not None:
        return attention_step2_with_rel_pos_value(attn, v, index0, index1,
                                                  table_v, rel_idx, n_out,
                                                  mask)
    return attention_step2(attn, v, index0, index1, n_out, mask)
