"""PT-v1 vector-attention backbone
(reference pointcept/models/point_transformer/point_transformer_seg.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from lidar_layout_tpu.models.ptv1 import (Bottleneck, PointTransformerSeg,
                                          PTv1Config, TransitionDown)

TINY = PTv1Config(in_channels=4, num_classes=5, blocks=(1, 1, 1, 1, 1),
                  planes=(8, 12, 16, 20, 24), strides=(1, 2, 2, 2, 2),
                  nsamples=(4, 4, 4, 4, 4), share_planes=4)


def _cloud(rng, n=64, valid=None):
    coord = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < (valid if valid is not None else n)
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_forward_shape_and_finiteness():
    coord, feat, mask = _cloud(np.random.default_rng(0), n=64, valid=56)
    model = PointTransformerSeg(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = jax.jit(model.apply)(params, coord, feat, mask)
    assert out.shape == (64, 5)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)[56:]).max() == 0.0  # padded rows zeroed


def test_transition_down_fps_capacity_and_mask():
    td = TransitionDown(planes=8, stride=4, nsample=4)
    coord, feat, mask = _cloud(np.random.default_rng(1), n=32, valid=10)
    params = td.init(jax.random.key(0), coord, feat, mask)
    nc, nf, nm = td.apply(params, coord, feat, mask)
    assert nc.shape == (8, 3) and nf.shape == (8, 8)
    # only min(capacity, n_valid)=8 slots valid, features finite
    assert int(nm.sum()) == 8
    assert np.isfinite(np.asarray(nf)).all()
    # sparser cloud: validity limited by the valid count
    _, _, nm2 = td.apply(params, coord, feat, jnp.arange(32) < 5)
    assert int(nm2.sum()) == 5


def test_bottleneck_residual_identity_scale():
    blk = Bottleneck(planes=8, share_planes=4, nsample=4)
    coord, feat, mask = _cloud(np.random.default_rng(2), n=16)
    feat8 = jnp.concatenate([feat, feat], axis=-1)
    params = blk.init(jax.random.key(0), coord, feat8, mask)
    out = blk.apply(params, coord, feat8, mask)
    assert out.shape == (16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_invariance():
    rng = np.random.default_rng(3)
    coord, feat, mask = _cloud(rng, n=48, valid=40)
    model = PointTransformerSeg(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out1 = model.apply(params, coord, feat, mask)
    coord2 = coord.at[40:].add(500.0)
    feat2 = feat.at[40:].set(77.0)
    out2 = model.apply(params, coord2, feat2, mask)
    np.testing.assert_allclose(np.asarray(out1)[:40], np.asarray(out2)[:40],
                               rtol=2e-4, atol=2e-4)


def test_registry_variants():
    from lidar_layout_tpu.config import instantiate_from_config

    m = instantiate_from_config({
        "target": "PointTransformer-Seg26",
        "params": {"in_channels": 4, "num_classes": 3,
                   "planes": [8, 12, 16, 20, 24],
                   "strides": [1, 2, 2, 2, 2], "nsamples": [4, 4, 4, 4, 4],
                   "share_planes": 4}})
    assert m.cfg.blocks == (1, 1, 1, 1, 1)
    coord, feat, mask = _cloud(np.random.default_rng(4), n=32)
    params = m.init(jax.random.key(0), coord, feat, mask)
    out = m.apply(params, coord, feat, mask)
    assert out.shape == (32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow():
    coord, feat, mask = _cloud(np.random.default_rng(5), n=32, valid=28)
    model = PointTransformerSeg(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)

    def loss(p):
        return jnp.sum(model.apply(p, coord, feat, mask) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0.0
