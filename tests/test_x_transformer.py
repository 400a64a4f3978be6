"""x-transformers feature-set module (reference lidm/modules/x_transformer.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.encoders.x_transformer import (Attention, Decoder,
                                                     Encoder, FeedForward,
                                                     TransformerWrapper)


def _tokens(b=2, n=12, v=50):
    return jnp.asarray(np.random.default_rng(0).integers(0, v, (b, n)))


def _run(model, tokens, mask=None):
    params = model.init(jax.random.key(0), tokens, mask)
    return model.apply(params, tokens, mask), params


class TestWrapper:
    def test_logits_shape(self):
        m = TransformerWrapper(num_tokens=50, max_seq_len=16,
                               attn_layers=Encoder(dim=32, depth=2, heads=4,
                                                   dim_head=8))
        out, _ = _run(m, _tokens())
        assert out.shape == (2, 12, 50)
        assert np.isfinite(np.asarray(out)).all()

    def test_memory_tokens_do_not_change_output_shape(self):
        m = TransformerWrapper(num_tokens=50, max_seq_len=16,
                               num_memory_tokens=4,
                               attn_layers=Encoder(dim=32, depth=1, heads=4,
                                                   dim_head=8))
        tokens = _tokens()
        mask = jnp.asarray(np.arange(12)[None, :].repeat(2, 0) < 10)
        out, params = _run(m, tokens, mask)
        assert out.shape == (2, 12, 50)
        names = [jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)]
        assert any("memory_tokens" in s for s in names)

    def test_tie_embedding_has_no_logits_head(self):
        m = TransformerWrapper(num_tokens=50, max_seq_len=16,
                               tie_embedding=True,
                               attn_layers=Encoder(dim=32, depth=1, heads=4,
                                                   dim_head=8))
        out, params = _run(m, _tokens())
        assert out.shape == (2, 12, 50)
        names = [jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)]
        assert not any("to_logits" in s for s in names)

    def test_emb_dim_projection(self):
        m = TransformerWrapper(num_tokens=50, max_seq_len=16, emb_dim=16,
                               attn_layers=Encoder(dim=32, depth=1, heads=4,
                                                   dim_head=8))
        out, params = _run(m, _tokens())
        assert out.shape == (2, 12, 50)


class TestAttentionFeatures:
    def _x(self):
        return jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 10, 32)), jnp.float32)

    @pytest.mark.parametrize("kw", [
        dict(talking_heads=True), dict(sparse_topk=4), dict(num_mem_kv=3),
        dict(on_attn=True), dict(causal=True)])
    def test_variants_finite(self, kw):
        a = Attention(dim=32, dim_head=8, heads=4, **kw)
        x = self._x()
        p = a.init(jax.random.key(0), x)
        out = a.apply(p, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_causal_masks_future(self):
        a = Attention(dim=32, dim_head=8, heads=4, causal=True)
        x = self._x()
        p = a.init(jax.random.key(0), x)
        out1 = a.apply(p, x)
        x2 = x.at[:, -1].set(99.0)  # future token must not affect position 0
        out2 = a.apply(p, x2)
        np.testing.assert_allclose(np.asarray(out1[:, 0]),
                                   np.asarray(out2[:, 0]), atol=1e-5)

    def test_cross_attention(self):
        enc = Encoder(dim=32, depth=1, heads=4, dim_head=8,
                      cross_attend=True)
        x = self._x()
        ctx = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 7, 32)), jnp.float32)
        p = enc.init(jax.random.key(0), x, context=ctx)
        out = enc.apply(p, x, context=ctx)
        assert out.shape == x.shape


class TestLayerLayouts:
    def _check(self, **kw):
        enc = Encoder(dim=32, depth=2, heads=4, dim_head=8, **kw)
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 10, 32)), jnp.float32)
        p = enc.init(jax.random.key(0), x)
        out = enc.apply(p, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        return p

    def test_scalenorm(self):
        self._check(norm="scale")

    def test_rmsnorm(self):
        self._check(norm="rms")

    def test_rezero_starts_as_identity(self):
        enc = Encoder(dim=32, depth=1, heads=4, dim_head=8, use_rezero=True)
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 10, 32)), jnp.float32)
        p = enc.init(jax.random.key(0), x)
        np.testing.assert_allclose(np.asarray(enc.apply(p, x)),
                                   np.asarray(x), atol=1e-6)

    def test_macaron_and_glu(self):
        self._check(macaron=True, ff_glu=True)

    def test_gate_residual(self):
        self._check(gate_residual=True)

    def test_position_infused(self):
        self._check(position_infused_attn=True)

    def test_postnorm(self):
        self._check(pre_norm=False)

    def test_decoder_is_causal(self):
        dec = Decoder(dim=32, depth=1, heads=4, dim_head=8)
        assert dec.causal
