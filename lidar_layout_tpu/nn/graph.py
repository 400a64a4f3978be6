"""Scene-graph convolution (GraphTripleConv) as masked segment ops.

Parity: ``lidm/modules/unets/graph.py:89-249`` — per-triple MLP over
(subject, predicate, object), scatter-add pooling back to nodes with avg/sum/
weighted pooling, residual projections.

TPU-first: the reference's ragged flat-node arrays + ``scatter_add`` become
fixed-capacity padded arrays + ``.at[].add`` with masks — the whole batch of
graphs is one dense tensor program, no dynamic shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def build_mlp(dims: Sequence[int], final_nonlinearity: bool = True,
              name: str = "mlp"):
    """relu MLP matching the reference's build_mlp defaults (layers.py)."""

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, d in enumerate(dims[1:]):
                x = nn.Dense(d, kernel_init=nn.initializers.he_normal(),
                             name=f"dense_{i}")(x)
                if i < len(dims) - 2 or final_nonlinearity:
                    x = nn.relu(x)
            return x

    return MLP(name=name)


class GraphTripleConv(nn.Module):
    """One scene-graph conv layer over padded graphs.

    Inputs:
      obj_vecs:  (N, D_obj) node features (padded; mask via obj_mask)
      pred_vecs: (T, D_pred) predicate features
      edges:     (T, 2) int32 [subject_idx, object_idx] into the node axis
      pred_mask: (T,) bool — False rows are padding and contribute nothing
    """

    input_dim_obj: int
    input_dim_pred: int
    output_dim: Optional[int] = None
    hidden_dim: int = 512
    pooling: str = "avg"
    residual: bool = True

    @nn.compact
    def __call__(self, obj_vecs: Array, pred_vecs: Array, edges: Array,
                 pred_mask: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        n = obj_vecs.shape[0]
        h_dim = self.hidden_dim
        d_pred = self.input_dim_pred
        out_dim = self.output_dim or self.input_dim_obj

        s_idx, o_idx = edges[:, 0], edges[:, 1]
        cur_s = obj_vecs[s_idx]
        cur_o = obj_vecs[o_idx]
        t_in = jnp.concatenate([cur_s, pred_vecs, cur_o], axis=-1)

        net1 = build_mlp([2 * self.input_dim_obj + d_pred, h_dim,
                          2 * h_dim + d_pred], name="net1")
        t_out = net1(t_in)
        new_s = t_out[:, :h_dim]
        new_p = t_out[:, h_dim:h_dim + d_pred]
        new_o = t_out[:, h_dim + d_pred:]

        if pred_mask is not None:
            m = pred_mask[:, None].astype(new_s.dtype)
            new_s = new_s * m
            new_o = new_o * m

        pooled = jnp.zeros((n, h_dim), obj_vecs.dtype)
        pooled = pooled.at[s_idx].add(new_s)
        pooled = pooled.at[o_idx].add(new_o)

        if self.pooling == "avg":
            ones = (pred_mask.astype(obj_vecs.dtype) if pred_mask is not None
                    else jnp.ones((edges.shape[0],), obj_vecs.dtype))
            counts = jnp.zeros((n,), obj_vecs.dtype)
            counts = counts.at[s_idx].add(ones)
            counts = counts.at[o_idx].add(ones)
            pooled = pooled / jnp.maximum(counts, 1.0)[:, None]

        net2 = build_mlp([h_dim, h_dim, out_dim], name="net2")
        new_obj = net2(pooled)

        if self.residual:
            new_obj = new_obj + nn.Dense(out_dim, name="proj_obj")(obj_vecs)
            new_p = new_p + nn.Dense(d_pred, name="proj_pred")(pred_vecs)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of GraphTripleConv layers (graph.py:216-249)."""

    input_dim_obj: int
    input_dim_pred: int
    num_layers: int = 2
    hidden_dim: int = 512
    pooling: str = "avg"
    residual: bool = False
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, pred_mask=None):
        for i in range(self.num_layers):
            last = i >= self.num_layers - 1
            out_dim = self.output_dim if (last and self.output_dim) else None
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim_obj=obj_vecs.shape[-1],
                input_dim_pred=self.input_dim_pred,
                output_dim=out_dim,
                hidden_dim=self.hidden_dim,
                pooling=self.pooling,
                residual=self.residual,
                name=f"gconv_{i}")(obj_vecs, pred_vecs, edges, pred_mask)
        return obj_vecs, pred_vecs
