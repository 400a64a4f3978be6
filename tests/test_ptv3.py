"""PT-v3 + serialization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.ptv3 import (PTv3, PTv3Config,
                                          grid_pool_segments, segment_mean)
from lidar_layout_tpu.ops.serialization import (hilbert_code, serialize_code,
                                                z_order_code)

SMALL_CFG = PTv3Config(in_channels=4, patch_size=64,
                       enc_depths=(1, 1, 1), enc_channels=(16, 32, 64),
                       enc_heads=(2, 4, 8), dec_depths=(1, 1),
                       dec_channels=(16, 32), dec_heads=(2, 4), bits=8)


class TestSerialization:
    def test_z_order_bijective_8cube(self):
        g = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     -1).reshape(-1, 3)
        codes = np.asarray(z_order_code(jnp.asarray(g), bits=3))
        assert len(np.unique(codes)) == 512
        assert codes.min() == 0 and codes.max() == 511

    def test_z_order_golden(self):
        # pointcept layout (x highest bit of each triplet, z_order.py xyz2key):
        # (x=1,y=0,z=0) -> 4; (0,1,0) -> 2; (0,0,1) -> 1
        g = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
        codes = np.asarray(z_order_code(g))
        np.testing.assert_array_equal(codes, [4, 2, 1, 7])

    def test_z_order_matches_pointcept_xyz2key(self):
        # reference formula: key |= (x&m)<<(2i+2) | (y&m)<<(2i+1) | (z&m)<<2i
        rng = np.random.default_rng(0)
        g = rng.integers(0, 256, size=(64, 3))
        want = np.zeros(64, np.int64)
        for i in range(8):
            m = 1 << i
            want |= ((g[:, 0] & m) << (2 * i + 2)) | \
                    ((g[:, 1] & m) << (2 * i + 1)) | ((g[:, 2] & m) << 2 * i)
        codes = np.asarray(z_order_code(jnp.asarray(g), bits=8))
        np.testing.assert_array_equal(codes, want)

    def test_hilbert_bijective_and_local(self):
        g = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing="ij"),
                     -1).reshape(-1, 3)
        codes = np.asarray(hilbert_code(jnp.asarray(g), bits=3))
        assert len(np.unique(codes)) == 512, "hilbert must be a bijection"
        # locality: consecutive curve positions are adjacent cells (L1 dist 1)
        order = np.argsort(codes)
        diffs = np.abs(np.diff(g[order], axis=0)).sum(axis=1)
        assert (diffs == 1).all(), f"non-adjacent steps: {(diffs != 1).sum()}"

    def test_trans_variant_swaps_axes(self):
        g = jnp.asarray([[3, 5, 1]])
        gt = jnp.asarray([[5, 3, 1]])
        a = np.asarray(serialize_code(g, "z-trans", 8))
        b = np.asarray(serialize_code(gt, "z", 8))
        np.testing.assert_array_equal(a, b)


class TestPooling:
    def test_segments_group_equal_codes(self):
        codes = jnp.asarray([5, 3, 5, 3, 9, 100], jnp.int32)
        mask = jnp.asarray([True] * 5 + [False])
        seg, valid, order = grid_pool_segments(codes, mask, 4)
        seg = np.asarray(seg)
        assert seg[0] == seg[2] and seg[1] == seg[3]
        assert seg[0] != seg[1] != seg[4]
        assert np.asarray(valid).sum() == 3

    def test_segment_mean(self):
        x = jnp.asarray([[1.0], [2.0], [3.0], [100.0]])
        seg = jnp.asarray([0, 0, 1, 1])
        mask = jnp.asarray([True, True, True, False])
        out = np.asarray(segment_mean(x, seg, mask, 2))
        np.testing.assert_allclose(out[:, 0], [1.5, 3.0])


class TestPTv3:
    @pytest.fixture(scope="class")
    def model_params(self, ):
        rng = np.random.default_rng(0)
        n = 256
        # unique grid cells (coords < 2^bits): with distinct codes the
        # serialized order is a pure function of geometry, so permutation
        # equivariance holds exactly; tied codes (same cell) break ties by
        # storage order — true of the reference's argsort too
        cells = rng.choice(100**3, size=n, replace=False)
        gxyz = np.stack([cells % 100, (cells // 100) % 100, cells // 10000], -1)
        pts = (gxyz * SMALL_CFG.grid_size).astype(np.float32)
        feats = np.concatenate([pts, rng.standard_normal((n, 1))], -1
                               ).astype(np.float32)
        mask = np.ones(n, bool)
        mask[200:] = False
        model = PTv3(SMALL_CFG)
        params = model.init(jax.random.key(0), jnp.asarray(pts),
                            jnp.asarray(feats), jnp.asarray(mask))
        return model, params, pts, feats, mask

    def test_forward_shapes(self, model_params):
        model, params, pts, feats, mask = model_params
        out, m = model.apply(params, jnp.asarray(pts), jnp.asarray(feats),
                             jnp.asarray(mask))
        assert out.shape == (256, SMALL_CFG.dec_channels[0])
        assert np.isfinite(np.asarray(out)).all()
        # padded rows must be zero
        assert np.abs(np.asarray(out)[~mask]).max() == 0

    def test_encoder_only(self, model_params):
        model, params, pts, feats, mask = model_params
        enc = PTv3(SMALL_CFG, encoder_only=True)
        ep = enc.init(jax.random.key(0), jnp.asarray(pts), jnp.asarray(feats),
                      jnp.asarray(mask))
        z, zmask = enc.apply(ep, jnp.asarray(pts), jnp.asarray(feats),
                             jnp.asarray(mask))
        assert z.shape == (256 // 4, SMALL_CFG.enc_channels[-1])

    def test_permutation_invariance(self, model_params):
        """Point sets are unordered: permuting inputs permutes outputs."""
        model, params, pts, feats, mask = model_params
        perm = np.random.default_rng(1).permutation(256)
        o1, _ = model.apply(params, jnp.asarray(pts), jnp.asarray(feats),
                            jnp.asarray(mask))
        o2, _ = model.apply(params, jnp.asarray(pts[perm]),
                            jnp.asarray(feats[perm]), jnp.asarray(mask[perm]))
        np.testing.assert_allclose(np.asarray(o1)[perm], np.asarray(o2),
                                   rtol=2e-2, atol=2e-3)
