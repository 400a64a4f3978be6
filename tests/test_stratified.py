"""Stratified Transformer ST-v1m1 (reference
pointcept/models/stratified_transformer/stratified_transformer_v1m1_origin.py)
— the consumer of the fused edge-list attention ops in ops/pointops2."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.stratified import (StratifiedConfig,

                                                StratifiedTransformer,
                                                dense_window_edges,
                                                stratified_edges,
                                                window_buckets)

pytestmark = pytest.mark.slow  # heavy e2e/kernel file; default run skips (pytest.ini), CI/--runslow includes

TINY = StratifiedConfig(
    in_channels=4, num_classes=5, channels=(8, 16, 16, 16),
    depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
    window_size=(0.8, 1.6, 3.2, 6.4), quant_size=(0.2, 0.4, 0.8, 1.6),
    k=4, kp_neighbors=4, kp_kernel_points=5, downsample_scale=4,
    n_windows=32, window_capacity=12, sample_capacity=4)


def _cloud(rng, n=128, valid=100):
    coord = rng.uniform(0.0, 4.0, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


class TestWindowMachinery:
    def test_buckets_group_by_window(self):
        # two clusters far apart -> distinct windows
        coord = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2],
                             [5.0, 5.0, 5.0], [5.05, 5.05, 5.05]], jnp.float32)
        mask = jnp.ones(4, bool)
        bucket, bvalid, codes, pcode = window_buckets(coord, mask, 1.0, 8, 4)
        b = np.asarray(bucket)
        v = np.asarray(bvalid)
        rows = {tuple(sorted(b[i][v[i]])) for i in range(8) if v[i].any()}
        assert rows == {(0, 1), (2, 3)}
        # point codes agree within a cluster, differ across
        pc = np.asarray(pcode)
        assert pc[0] == pc[1] and pc[2] == pc[3] and pc[0] != pc[2]

    def test_dense_edges_are_intra_window_pairs(self):
        coord = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0],
                             [9.0, 9.0, 9.0]], jnp.float32)
        mask = jnp.ones(3, bool)
        bucket, bvalid, _, _ = window_buckets(coord, mask, 1.0, 4, 4)
        i0, i1, m = dense_window_edges(bucket, bvalid, 3)
        pairs = {(int(a), int(b))
                 for a, b, ok in zip(np.asarray(i0), np.asarray(i1),
                                     np.asarray(m)) if ok}
        assert pairs == {(0, 0), (0, 1), (1, 0), (1, 1), (2, 2)}

    def test_capacity_overflow_drops_tail_only(self):
        rng = np.random.default_rng(0)
        coord = jnp.asarray(rng.uniform(0, 0.5, (20, 3)).astype(np.float32))
        mask = jnp.ones(20, bool)
        bucket, bvalid, _, _ = window_buckets(coord, mask, 1.0, 4, 8)
        assert int(np.asarray(bvalid).sum()) == 8  # cap, not 20

    def test_stratified_edges_skip_same_fine_window(self):
        rng = np.random.default_rng(1)
        coord = jnp.asarray(rng.uniform(0, 4.0, (64, 3)).astype(np.float32))
        mask = jnp.ones(64, bool)
        cfg = TINY
        _, _, _, pcode = window_buckets(coord, mask, 0.8, cfg.n_windows,
                                        cfg.window_capacity, cfg.bits, False)
        i0, i1, m = stratified_edges(coord, mask, pcode, 0.8, cfg, 16, False)
        pc = np.asarray(pcode)
        a = np.asarray(i0)[np.asarray(m)]
        b = np.asarray(i1)[np.asarray(m)]
        assert (pc[a] != pc[b]).all()


class TestStratifiedTransformer:
    @pytest.fixture(scope="class")
    def built(self):
        coord, feat, mask = _cloud(np.random.default_rng(2))
        model = StratifiedTransformer(TINY)
        params = model.init(jax.random.key(0), coord, feat, mask)
        return model, params, (coord, feat, mask)

    def test_forward_shape_and_finite(self, built):
        model, params, (coord, feat, mask) = built
        out = model.apply(params, coord, feat, mask)
        assert out.shape == (128, 5)
        assert np.isfinite(np.asarray(out)).all()
        assert np.allclose(np.asarray(out)[~np.asarray(mask)], 0.0)

    def test_uses_pointops2_rpe_tables(self, built):
        _, params, _ = built
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = [jax.tree_util.keystr(p) for p, _ in flat]
        assert any("rel_query_table" in s for s in names)
        assert any("rel_value_table" in s for s in names)

    def test_gradients_flow(self, built):
        model, params, (coord, feat, mask) = built

        def loss(p):
            return (model.apply(p, coord, feat, mask) ** 2).sum()

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # RPE tables receive gradient (the pointops2 path is live)
        flat = jax.tree_util.tree_leaves_with_path(g)
        rpe = [np.abs(np.asarray(l)).max() for p, l in flat
               if "rel_query_table" in jax.tree_util.keystr(p)]
        assert rpe and max(rpe) > 0

    def test_registry_target(self):
        from lidar_layout_tpu.config import instantiate_from_config
        m = instantiate_from_config({
            "target": "ST-v1m1",
            "params": {"in_channels": 4, "num_classes": 3,
                       "channels": [8, 8, 8, 8], "depths": [1, 1, 1, 1],
                       "num_heads": [2, 2, 2, 2], "k": 4,
                       "kp_neighbors": 4, "kp_kernel_points": 5,
                       "n_windows": 16, "window_capacity": 8,
                       "sample_capacity": 4}})
        coord, feat, mask = _cloud(np.random.default_rng(3), n=48, valid=40)
        params = m.init(jax.random.key(0), coord, feat, mask)
        out = m.apply(params, coord, feat, mask)
        assert out.shape == (48, 3)

    def test_learning_smoke(self, built):
        import optax
        model, params, (coord, feat, mask) = built
        labels = jnp.asarray(
            np.random.default_rng(4).integers(0, 5, 128))
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p):
            logits = model.apply(p, coord, feat, mask)
            l = optax.softmax_cross_entropy_with_integer_labels(logits,
                                                                labels)
            return (l * mask).sum() / mask.sum()

        l0 = float(loss_fn(params))
        for _ in range(8):
            g = jax.grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            params = optax.apply_updates(params, up)
        assert float(loss_fn(params)) < l0
