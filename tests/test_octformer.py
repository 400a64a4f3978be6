"""OctFormer-v1m1 (reference pointcept/models/octformer/octformer_v1m1_base.py)
— octree patch attention as z-order sequence reshapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.octformer import (OctFormer, OctFormerConfig,
                                               OctreeAttention)
from lidar_layout_tpu.ops.voxel import build_grid

pytestmark = pytest.mark.slow  # model-scale file (see pytest.ini tiers)

TINY = OctFormerConfig(
    in_channels=4, num_classes=5, fpn_channels=16, channels=(8, 16, 16, 16),
    num_blocks=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), patch_size=8,
    dilation=2, stem_down=1, voxel_size=0.25, capacity=512, rpe_quant=4)


def _cloud(rng, n=256, valid=220):
    coord = rng.uniform(0.0, 8.0, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_attention_patch_and_dilated_shapes():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.integers(0, 16, (64, 3)), jnp.int32)
    grid, _ = build_grid(coords, jnp.ones(64, bool), 64)
    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    for dil in (1, 2):
        attn = OctreeAttention(dim=8, num_heads=2, patch_size=8,
                               dilation=dil, rpe_quant=4)
        p = attn.init(jax.random.key(0), grid, x)
        out = attn.apply(p, grid, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        # padded (invalid) rows stay zero
        inv = ~np.asarray(grid.mask)
        if inv.any():
            assert np.abs(np.asarray(out)[inv]).max() == 0.0


class TestOctFormer:
    @pytest.fixture(scope="class")
    def built(self):
        coord, feat, mask = _cloud(np.random.default_rng(1))
        model = OctFormer(TINY)
        params = model.init(jax.random.key(0), coord, feat, mask)
        return model, params, (coord, feat, mask)

    def test_forward(self, built):
        model, params, (coord, feat, mask) = built
        out = model.apply(params, coord, feat, mask)
        assert out.shape == (256, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[~np.asarray(mask)], 0.0)

    def test_gradients_flow(self, built):
        model, params, (coord, feat, mask) = built

        def loss(p):
            return (model.apply(p, coord, feat, mask) ** 2).sum()

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
        flat = jax.tree_util.tree_leaves_with_path(g)
        rpe = [np.abs(np.asarray(l)).max() for pth, l in flat
               if "rpe_table" in jax.tree_util.keystr(pth)]
        assert rpe and max(rpe) > 0  # RPE path is live

    def test_registry(self):
        from lidar_layout_tpu.config import instantiate_from_config
        m = instantiate_from_config({
            "target": "OctFormer-v1m1",
            "params": {"in_channels": 4, "num_classes": 3,
                       "fpn_channels": 8, "channels": [8, 8, 8, 8],
                       "num_blocks": [1, 1, 1, 1],
                       "num_heads": [2, 2, 2, 2], "patch_size": 8,
                       "dilation": 2, "stem_down": 1, "voxel_size": 0.25,
                       "capacity": 256, "rpe_quant": 4}})
        coord, feat, mask = _cloud(np.random.default_rng(2), n=96, valid=80)
        params = m.init(jax.random.key(0), coord, feat, mask)
        assert m.apply(params, coord, feat, mask).shape == (96, 3)

    def test_learning_smoke(self, built):
        import optax
        model, params, (coord, feat, mask) = built
        labels = jnp.asarray(np.random.default_rng(3).integers(0, 5, 256))
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
