"""Swin3D-v1m1 (reference pointcept/models/swin3d/) — shifted-window voxel
attention with cRSE on the pointops2 edge kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.swin3d import Swin3DConfig, Swin3DUNet

pytestmark = pytest.mark.slow  # model-scale file (see pytest.ini tiers)

TINY = Swin3DConfig(
    in_channels=6, num_classes=5, channels=(8, 16, 16, 16, 16),
    depths=(1, 1, 1, 1, 1), num_heads=(2, 2, 2, 2, 2),
    window_sizes=(3, 3, 3, 3, 3), quant_size=2, base_grid_size=0.25,
    k=4, capacity=512, n_windows=32, window_capacity=12)


def _cloud(rng, n=200, valid=170):
    coord = rng.uniform(0.0, 6.0, size=(n, 3)).astype(np.float32)
    feat = rng.uniform(-1, 1, size=(n, 6)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


class TestSwin3D:
    @pytest.fixture(scope="class")
    def built(self):
        coord, feat, mask = _cloud(np.random.default_rng(0))
        model = Swin3DUNet(TINY)
        params = model.init(jax.random.key(0), coord, feat, mask)
        return model, params, (coord, feat, mask)

    def test_forward(self, built):
        model, params, (coord, feat, mask) = built
        out = model.apply(params, coord, feat, mask)
        assert out.shape == (200, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[~np.asarray(mask)], 0.0)

    def test_crse_tables_exist_per_modality(self, built):
        _, params, _ = built
        names = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(params)]
        for mod in ("xyz", "rgb"):
            for role in ("query", "key", "value"):
                assert any(f"{role}_{mod}_table" in s for s in names), \
                    (role, mod)

    def test_xyz_only_mode_has_no_rgb_tables(self):
        import dataclasses
        cfg = dataclasses.replace(TINY, crse="XYZ")
        coord, feat, mask = _cloud(np.random.default_rng(1), n=64, valid=50)
        m = Swin3DUNet(cfg)
        params = m.init(jax.random.key(0), coord, feat, mask)
        names = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(params)]
        assert not any("rgb_table" in s for s in names)
        assert m.apply(params, coord, feat, mask).shape == (64, 5)

    def test_gradients_flow_into_crse(self, built):
        model, params, (coord, feat, mask) = built

        def loss(p):
            return (model.apply(p, coord, feat, mask) ** 2).sum()

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
        flat = jax.tree_util.tree_leaves_with_path(g)
        for tab in ("query_xyz_table", "value_rgb_table"):
            vals = [np.abs(np.asarray(l)).max() for p_, l in flat
                    if tab in jax.tree_util.keystr(p_)]
            assert vals and max(vals) > 0, tab

    def test_registry(self):
        from lidar_layout_tpu.config import instantiate_from_config
        m = instantiate_from_config({
            "target": "Swin3D-v1m1",
            "params": {"in_channels": 6, "num_classes": 3,
                       "channels": [8, 8, 8, 8, 8],
                       "depths": [1, 1, 1, 1, 1],
                       "num_heads": [2, 2, 2, 2, 2],
                       "window_sizes": [3, 3, 3, 3, 3], "quant_size": 2,
                       "base_grid_size": 0.25, "k": 4, "capacity": 256,
                       "n_windows": 16, "window_capacity": 8}})
        coord, feat, mask = _cloud(np.random.default_rng(2), n=80, valid=64)
        params = m.init(jax.random.key(0), coord, feat, mask)
        assert m.apply(params, coord, feat, mask).shape == (80, 3)

    def test_learning_smoke(self, built):
        import optax
        model, params, (coord, feat, mask) = built
        labels = jnp.asarray(np.random.default_rng(3).integers(0, 5, 200))
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p):
            logits = model.apply(p, coord, feat, mask)
            l = optax.softmax_cross_entropy_with_integer_labels(logits,
                                                                labels)
            return (l * mask).sum() / mask.sum()

        l0 = float(loss_fn(params))
        for _ in range(6):
            g = jax.grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            params = optax.apply_updates(params, up)
        assert float(loss_fn(params)) < l0
