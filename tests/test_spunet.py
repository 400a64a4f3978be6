"""SpUNet-v1m1 sparse-conv U-Net backbone
(reference pointcept/models/sparse_unet/spconv_unet_v1m1_base.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.spunet import SpUNet, SpUNetConfig

pytestmark = pytest.mark.slow  # heavy e2e/kernel file; default run skips (pytest.ini), CI/--runslow includes


TINY = SpUNetConfig(
    in_channels=4, num_classes=5, base_channels=8,
    channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
    stem_kernel=3, voxel_size=0.2, capacity=256)


def _cloud(rng, n=128, valid=100):
    coord = rng.uniform(0.0, 6.0, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_forward_shape_and_finiteness():
    coord, feat, mask = _cloud(np.random.default_rng(0))
    model = SpUNet(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = jax.jit(model.apply)(params, coord, feat, mask)
    assert out.shape == (128, 5)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)[100:]).max() == 0.0  # padded rows zeroed


def test_padding_invariance():
    """Garbage in padded slots must not change valid outputs."""
    rng = np.random.default_rng(1)
    coord, feat, mask = _cloud(rng)
    model = SpUNet(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out1 = model.apply(params, coord, feat, mask)
    coord2 = coord.at[100:].set(777.0 + jnp.arange(28)[:, None] * 3.0)
    feat2 = feat.at[100:].set(-55.0)
    out2 = model.apply(params, coord2, feat2, mask)
    np.testing.assert_allclose(np.asarray(out1)[:100],
                               np.asarray(out2)[:100], rtol=2e-4, atol=2e-4)


def test_features_mode_and_cls_mode():
    coord, feat, mask = _cloud(np.random.default_rng(2), n=64, valid=64)
    feat_cfg = SpUNetConfig(**{**TINY.__dict__, "num_classes": 0})
    model = SpUNet(feat_cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (64, TINY.channels[-1])

    cls_cfg = SpUNetConfig(**{**TINY.__dict__, "cls_mode": True})
    model = SpUNet(cls_cfg)
    params = model.init(jax.random.key(0), coord, feat, mask)
    out = model.apply(params, coord, feat, mask)
    assert out.shape == (5,)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_target():
    from lidar_layout_tpu.config import instantiate_from_config
    m = instantiate_from_config({"target": "SpUNet-v1m1",
                     "params": {"in_channels": 4, "num_classes": 3,
                                "base_channels": 8,
                                "channels": [8, 16, 16, 8],
                                "layers": [1, 1, 1, 1],
                                "stem_kernel": 3, "capacity": 128,
                                "voxel_size": 0.25}})
    coord, feat, mask = _cloud(np.random.default_rng(3), n=48, valid=40)
    params = m.init(jax.random.key(0), coord, feat, mask)
    out = m.apply(params, coord, feat, mask)
    assert out.shape == (48, 3)


def test_gradients_flow():
    coord, feat, mask = _cloud(np.random.default_rng(4), n=64, valid=50)
    model = SpUNet(TINY)
    params = model.init(jax.random.key(0), coord, feat, mask)

    def loss(p):
        out = model.apply(p, coord, feat, mask)
        return (out ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_config_validation():
    import pytest
    with pytest.raises(ValueError):
        SpUNetConfig(channels=(8, 16, 16), layers=(1, 1, 1))  # odd halves
    with pytest.raises(ValueError):
        SpUNetConfig(channels=(8, 16, 16, 8), layers=(1, 1))  # len mismatch
