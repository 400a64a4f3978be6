"""PT-v2 grouped-vector-attention backbone
(reference pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.ptv2 import (GridPool, GroupedVectorAttention,
                                          PointTransformerV2, PTv2Config)

TINY = PTv2Config(
    in_channels=4, num_classes=5,
    patch_embed_depth=1, patch_embed_channels=12, patch_embed_groups=3,
    patch_embed_neighbours=4,
    enc_depths=(1, 1), enc_channels=(24, 48), enc_groups=(6, 12),
    enc_neighbours=(4, 4),
    dec_depths=(1, 1), dec_channels=(12, 24), dec_groups=(3, 6),
    dec_neighbours=(4, 4),
    grid_sizes=(0.12, 0.24), pool_ratios=(0.5, 0.25))


def _cloud(rng, n=64, valid=48):
    coord = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_forward_shape_and_finiteness():
    coord, feat, mask = _cloud(np.random.default_rng(0))
    model = PointTransformerV2(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = jax.jit(model.apply)(params, coord, feat, mask)
    assert out.shape == (64, 5)
    assert np.isfinite(np.asarray(out)).all()
    # padded rows zeroed
    assert np.abs(np.asarray(out)[48:]).max() == 0.0


def test_padding_invariance():
    """Garbage in padded slots must not change valid outputs."""
    rng = np.random.default_rng(1)
    coord, feat, mask = _cloud(rng)
    model = PointTransformerV2(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out1 = model.apply(params, coord, feat, mask)
    coord2 = coord.at[48:].set(1000.0 + jnp.arange(16)[:, None] * 13.0)
    feat2 = feat.at[48:].set(-99.0)
    out2 = model.apply(params, coord2, feat2, mask)
    np.testing.assert_allclose(np.asarray(out1)[:48], np.asarray(out2)[:48],
                               rtol=2e-4, atol=2e-4)


def test_features_mode_no_head():
    cfg = PTv2Config(**{**TINY.__dict__, "num_classes": 0})
    coord, feat, mask = _cloud(np.random.default_rng(2), n=32, valid=32)
    model = PointTransformerV2(cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (32, cfg.dec_channels[0])


def test_gva_masked_softmax_rows():
    """All-invalid neighborhoods produce zeros, not NaNs."""
    attn = GroupedVectorAttention(channels=8, groups=2)
    feat = jnp.ones((4, 8))
    coord = jnp.zeros((4, 3))
    ref_idx = jnp.zeros((4, 3), jnp.int32)
    ref_valid = jnp.zeros((4, 3), bool)  # nothing valid
    params = attn.init(jax.random.key(0), feat, coord, ref_idx, ref_valid)
    out = attn.apply(params, feat, coord, ref_idx, ref_valid)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_grid_pool_merges_cells():
    """Points sharing a voxel pool to one segment; coord is the cell mean."""
    pool = GridPool(channels=4, grid_size=1.0, capacity=4)
    # origin = (0.1, 0.1, 0.1); cells relative to it: A -> (0,0,0), B -> (5,5,5)
    coord = jnp.asarray([[0.1, 0.1, 0.1], [0.3, 0.2, 0.4],   # cell A
                         [5.3, 5.3, 5.3], [5.5, 5.4, 5.6]])  # cell B
    feat = jnp.eye(4)
    mask = jnp.ones((4,), bool)
    params = pool.init(jax.random.key(0), feat, coord, mask)
    (new_coord, new_feat, new_mask), cluster = pool.apply(params, feat, coord, mask)
    assert int(new_mask.sum()) == 2
    assert int(cluster[0]) == int(cluster[1])
    assert int(cluster[2]) == int(cluster[3])
    got = np.sort(np.asarray(new_coord[new_mask])[:, 0])
    np.testing.assert_allclose(got, [0.2, 5.4], atol=1e-5)


def test_gradients_flow():
    coord, feat, mask = _cloud(np.random.default_rng(3), n=32, valid=24)
    model = PointTransformerV2(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)

    def loss(p):
        out = model.apply(p, coord, feat, mask)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # attention weight encodings receive gradient
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0.0


def test_interp_unpool_backend():
    cfg = PTv2Config(**{**TINY.__dict__, "unpool_backend": "interp"})
    coord, feat, mask = _cloud(np.random.default_rng(4), n=32, valid=32)
    model = PointTransformerV2(cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (32, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_vmap_over_batch():
    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(2, 32, 4)), jnp.float32)
    masks = jnp.ones((2, 32), bool)
    model = PointTransformerV2(TINY)
    params = model.init(jax.random.key(0), coords[0], feats[0], masks[0])
    out = jax.vmap(lambda c, f, m: model.apply(params, c, f, m))(coords, feats, masks)
    assert out.shape == (2, 32, 5)
