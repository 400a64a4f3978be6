"""Grad-equivalence tests for the pointops2 fused attention/RPE ops.

Mirrors the reference's kernel self-checks
(pointcept/libs/pointops2/functions/test_attention_op_step1.py,
test_relative_pos_encoding_op_step1.py, test_relative_pos_encoding_op_step2.py):
values AND input gradients of every fused op must match an independent torch
autograd implementation of the same math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lidar_layout_tpu.ops.pointops2 import (attention_step1, attention_step2,
                                            attention_step2_with_rel_pos_value,
                                            dot_prod_with_idx,
                                            segment_softmax, window_attention)

N, M, H, D, L = 20, 64, 4, 8, 9


@pytest.fixture(scope="module")
def edges():
    rng = np.random.default_rng(1)
    return (rng.integers(0, N, M).astype(np.int32),
            rng.integers(0, N, M).astype(np.int32),
            rng.integers(0, L, (M, 3)).astype(np.int32))


def _t(x):
    t = torch.tensor(np.asarray(x), dtype=torch.float64)
    t.requires_grad_(True)
    return t


class TestAttentionStep1:
    def test_value_and_grads(self, edges):
        i0, i1, _ = edges
        rng = np.random.default_rng(0)
        q = rng.normal(size=(N, H, D)).astype(np.float32)
        k = rng.normal(size=(N, H, D)).astype(np.float32)

        out = attention_step1(jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(i0), jnp.asarray(i1))
        qt, kt = _t(q), _t(k)
        ref = torch.einsum("mhd,mhd->mh", qt[i0.astype(np.int64)],
                           kt[i1.astype(np.int64)])
        np.testing.assert_allclose(np.asarray(out),
                                   ref.detach().numpy(), atol=1e-4)

        # grad equivalence under the same scalar loss
        w = rng.normal(size=(M, H)).astype(np.float32)
        gq, gk = jax.grad(
            lambda q_, k_: (attention_step1(q_, k_, jnp.asarray(i0),
                                            jnp.asarray(i1))
                            * jnp.asarray(w)).sum(), argnums=(0, 1))(
            jnp.asarray(q), jnp.asarray(k))
        (ref * torch.tensor(w, dtype=torch.float64)).sum().backward()
        np.testing.assert_allclose(np.asarray(gq), qt.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), kt.grad.numpy(), atol=1e-4)


class TestAttentionStep2:
    def test_value_and_grads(self, edges):
        i0, i1, _ = edges
        rng = np.random.default_rng(2)
        attn = rng.normal(size=(M, H)).astype(np.float32)
        v = rng.normal(size=(N, H, D)).astype(np.float32)

        out = attention_step2(jnp.asarray(attn), jnp.asarray(v),
                              jnp.asarray(i0), jnp.asarray(i1), N)
        at, vt = _t(attn), _t(v)
        ref = torch.zeros(N, H, D, dtype=torch.float64)
        ref.index_add_(0, torch.tensor(i0, dtype=torch.int64),
                       at[..., None] * vt[i1.astype(np.int64)])
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                                   atol=1e-4)

        w = rng.normal(size=(N, H, D)).astype(np.float32)
        ga, gv = jax.grad(
            lambda a_, v_: (attention_step2(a_, v_, jnp.asarray(i0),
                                            jnp.asarray(i1), N)
                            * jnp.asarray(w)).sum(), argnums=(0, 1))(
            jnp.asarray(attn), jnp.asarray(v))
        (ref * torch.tensor(w, dtype=torch.float64)).sum().backward()
        np.testing.assert_allclose(np.asarray(ga), at.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), vt.grad.numpy(), atol=1e-4)


class TestRelPosOps:
    def test_dot_prod_with_idx(self, edges):
        i0, _, rel = edges
        rng = np.random.default_rng(3)
        q = rng.normal(size=(N, H, D)).astype(np.float32)
        table = rng.normal(size=(L, H, D, 3)).astype(np.float32)

        out = dot_prod_with_idx(jnp.asarray(q), jnp.asarray(i0),
                                jnp.asarray(table), jnp.asarray(rel))
        qt, tt = _t(q), _t(table)
        ref = sum(
            torch.einsum("mhd,mhd->mh", qt[i0.astype(np.int64)],
                         tt[rel[:, d].astype(np.int64), :, :, d])
            for d in range(3))
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                                   atol=1e-4)

        w = rng.normal(size=(M, H)).astype(np.float32)
        gq, gt = jax.grad(
            lambda q_, t_: (dot_prod_with_idx(q_, jnp.asarray(i0), t_,
                                              jnp.asarray(rel))
                            * jnp.asarray(w)).sum(), argnums=(0, 1))(
            jnp.asarray(q), jnp.asarray(table))
        (ref * torch.tensor(w, dtype=torch.float64)).sum().backward()
        np.testing.assert_allclose(np.asarray(gq), qt.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(), atol=1e-4)

    def test_step2_with_rel_pos_value(self, edges):
        i0, i1, rel = edges
        rng = np.random.default_rng(4)
        attn = rng.normal(size=(M, H)).astype(np.float32)
        v = rng.normal(size=(N, H, D)).astype(np.float32)
        table = rng.normal(size=(L, H, D, 3)).astype(np.float32)

        out = attention_step2_with_rel_pos_value(
            jnp.asarray(attn), jnp.asarray(v), jnp.asarray(i0),
            jnp.asarray(i1), jnp.asarray(table), jnp.asarray(rel), N)
        at, vt, tt = _t(attn), _t(v), _t(table)
        pe = sum(tt[rel[:, d].astype(np.int64), :, :, d] for d in range(3))
        ref = torch.zeros(N, H, D, dtype=torch.float64)
        ref.index_add_(0, torch.tensor(i0, dtype=torch.int64),
                       at[..., None] * (vt[i1.astype(np.int64)] + pe))
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                                   atol=1e-4)

        w = rng.normal(size=(N, H, D)).astype(np.float32)
        grads = jax.grad(
            lambda a_, v_, t_: (attention_step2_with_rel_pos_value(
                a_, v_, jnp.asarray(i0), jnp.asarray(i1), t_,
                jnp.asarray(rel), N) * jnp.asarray(w)).sum(),
            argnums=(0, 1, 2))(jnp.asarray(attn), jnp.asarray(v),
                               jnp.asarray(table))
        (ref * torch.tensor(w, dtype=torch.float64)).sum().backward()
        for g, t in zip(grads, (at, vt, tt)):
            np.testing.assert_allclose(np.asarray(g), t.grad.numpy(),
                                       atol=1e-4)


class TestWindowAttention:
    def test_softmax_normalizes_per_query(self, edges):
        i0, _, _ = edges
        rng = np.random.default_rng(5)
        s = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
        p = segment_softmax(s, jnp.asarray(i0), N)
        sums = jax.ops.segment_sum(p, jnp.asarray(i0), num_segments=N)
        present = np.unique(i0)
        np.testing.assert_allclose(np.asarray(sums)[present],
                                   np.ones((len(present), H)), atol=1e-5)

    def test_masked_edges_ignored(self, edges):
        i0, i1, rel = edges
        rng = np.random.default_rng(6)
        q = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        mask = jnp.asarray(np.arange(M) < M // 2)

        # full call with second half masked == call on the first half only
        full = window_attention(q, k, v, jnp.asarray(i0), jnp.asarray(i1), N,
                                mask=mask)
        half = window_attention(q, k, v, jnp.asarray(i0[: M // 2]),
                                jnp.asarray(i1[: M // 2]), N)
        np.testing.assert_allclose(np.asarray(full), np.asarray(half),
                                   atol=1e-5)

    def test_matches_dense_attention(self):
        """All-to-all edge list over one window == plain dense softmax attn."""
        n = 6
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(n, H, D)).astype(np.float32))
        i0 = jnp.repeat(jnp.arange(n), n)
        i1 = jnp.tile(jnp.arange(n), n)
        out = window_attention(q, k, v, i0, i1, n)

        scores = jnp.einsum("nhd,mhd->hnm", q, k) * D ** -0.5
        p = jax.nn.softmax(scores, axis=-1)
        dense = jnp.einsum("hnm,mhd->nhd", p, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-4)

    def test_with_rpe_tables_runs_and_differs(self, edges):
        i0, i1, rel = edges
        rng = np.random.default_rng(8)
        q = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
        tq = jnp.asarray(rng.normal(size=(L, H, D, 3)).astype(np.float32))
        tv = jnp.asarray(rng.normal(size=(L, H, D, 3)).astype(np.float32))

        plain = window_attention(q, k, v, jnp.asarray(i0), jnp.asarray(i1), N)
        rpe = window_attention(q, k, v, jnp.asarray(i0), jnp.asarray(i1), N,
                               table_q=tq, table_v=tv, rel_idx=jnp.asarray(rel))
        assert np.isfinite(np.asarray(rpe)).all()
        assert float(jnp.abs(rpe - plain).max()) > 1e-3
