"""Eval toolbox tests: chamfer vs brute force, EMD sanity, JSD/MMD/Fréchet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.eval import metrics as M
from lidar_layout_tpu.eval.rangenet import RangeNet
from lidar_layout_tpu.ops.chamfer import (chamfer_distance, chamfer_loss,
                                          pairwise_cd)
from lidar_layout_tpu.ops.emd import auction_match, emd_distance


class TestChamfer:
    def test_matches_bruteforce(self, rng):
        x = rng.standard_normal((500, 3)).astype(np.float32)
        y = rng.standard_normal((300, 3)).astype(np.float32)
        d1, d2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
        bd1 = ((x[:, None] - y[None]) ** 2).sum(-1).min(1)
        bd2 = ((y[:, None] - x[None]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(np.asarray(d1), bd1, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), bd2, rtol=1e-3, atol=1e-4)

    def test_identical_clouds_zero(self, rng):
        x = rng.standard_normal((256, 3)).astype(np.float32)
        assert float(pairwise_cd(jnp.asarray(x), jnp.asarray(x))) < 1e-6

    def test_mask_excludes_padding(self, rng):
        x = rng.standard_normal((100, 3)).astype(np.float32)
        y = np.vstack([x, np.full((50, 3), 1e6, np.float32)])
        ym = np.concatenate([np.ones(100, bool), np.zeros(50, bool)])
        d = pairwise_cd(jnp.asarray(x), jnp.asarray(y), None, jnp.asarray(ym))
        assert float(d) < 1e-6

    def test_chamfer_grad(self, rng):
        x = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
        g = jax.grad(lambda a: chamfer_loss(a, y))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestEMD:
    def test_permutation_recovery(self, rng):
        """For a permuted copy of the same cloud the optimal EMD is 0."""
        x = rng.standard_normal((128, 3)).astype(np.float32)
        perm = rng.permutation(128)
        y = x[perm]
        a = np.asarray(auction_match(jnp.asarray(x), jnp.asarray(y),
                                     eps=1e-4, iters=200))
        d = np.sqrt(((x - y[a]) ** 2).sum(-1)).mean()
        assert d < 0.05  # near-perfect matching
        # assignment is (nearly) a permutation
        assert len(np.unique(a)) > 120

    def test_emd_translation_lower_bound(self, rng):
        """EMD of a translated cloud >= translation norm (approx equality)."""
        x = rng.standard_normal((1024, 3)).astype(np.float32)
        y = x + np.asarray([1.0, 0.0, 0.0], np.float32)
        d = float(emd_distance(jnp.asarray(x), jnp.asarray(y)))
        # permutation matchings satisfy EMD >= ||translation|| = 1; the truncated
        # auction leaves a small duplicate tail, so allow slight underestimate
        assert 0.8 < d < 1.5

    def test_shape_contract_1024_multiple(self, rng):
        x = rng.standard_normal((1500, 3)).astype(np.float32)
        y = rng.standard_normal((1400, 3)).astype(np.float32)
        d = float(emd_distance(jnp.asarray(x), jnp.asarray(y)))
        assert np.isfinite(d)  # internally truncates to 1024


class TestStatisticalMetrics:
    def _clouds(self, rng, n=6, shift=0.0):
        out = []
        for _ in range(n):
            p = rng.standard_normal((2000, 3)).astype(np.float32) * 10
            p[:, 0] += shift
            out.append(p)
        return out

    def test_jsd_identical_zero(self, rng):
        c = self._clouds(rng)
        assert M.compute_jsd(c, c) == pytest.approx(0.0, abs=1e-6)

    def test_jsd_orders_by_shift(self, rng):
        ref = self._clouds(rng)
        near = M.compute_jsd(ref, self._clouds(rng, shift=1.0))
        far = M.compute_jsd(ref, self._clouds(rng, shift=20.0))
        assert 0 < near < far <= 1.0

    def test_mmd_identical_near_zero(self, rng):
        c = self._clouds(rng, n=4)
        v = M.compute_mmd(c, c)
        assert v == pytest.approx(0.0, abs=1e-6)

    def test_mmd_matches_bruteforce(self, rng):
        """The EDT/matmul formulation equals the explicit min over pairwise
        chamfer on the binned clouds (what the reference brute-forces on GPU,
        eval_utils.py:70-84)."""
        ref = self._clouds(rng, n=3)
        smp = self._clouds(rng, n=4, shift=2.0)
        v = M.compute_mmd(ref, smp)
        rb, sb = M.bev_bin_clouds(ref), M.bev_bin_clouds(smp)
        expect = np.mean([min(float(pairwise_cd(jnp.asarray(r),
                                                jnp.asarray(s)))
                              for s in sb) for r in rb])
        assert v == pytest.approx(expect, rel=1e-4, abs=1e-7)

    def test_mmd_empty_cloud_is_finite(self, rng):
        """Clouds that bin to zero cells follow the masked-chamfer convention
        (BIG sentinel) instead of dividing by zero."""
        ref = self._clouds(rng, n=2)
        empty = [np.full((10, 3), 1e4, np.float32)]  # outside BEV range
        assert np.isfinite(M.compute_mmd(ref, empty))
        assert M.compute_mmd(ref, empty) > 1.0
        assert np.isfinite(M.compute_mmd(empty, ref))

    def test_frechet_distance(self, rng):
        f1 = rng.standard_normal((500, 16))
        f2 = rng.standard_normal((500, 16)) + 2.0
        d_same = M.frechet_distance(f1, f1)
        d_diff = M.frechet_distance(f1, f2)
        assert abs(d_same) < 1e-6
        assert d_diff > 16 * 3.5  # ~ ||mu_diff||^2 = 16*4

    def test_evaluate_dispatch(self, rng):
        c1, c2 = self._clouds(rng, 3), self._clouds(rng, 3, shift=0.5)
        out = M.evaluate(c1, c2, ["cd", "jsd"], "64")
        assert set(out) == {"cd", "jsd"}
        assert all(np.isfinite(v) for v in out.values())


class TestFeatureFn:
    def test_chunked_extraction_matches_padless(self, rng):
        """build_feature_fn chunks into fixed feat_batch programs (a full-set
        batch OOMs on chip); a set that needs a padded final chunk must give
        the same per-cloud features as batch-aligned extraction."""
        from lidar_layout_tpu.eval.registry import build_feature_fn

        clouds = [rng.standard_normal((800, 3)).astype(np.float32) * 8
                  for _ in range(3)]
        fn2 = build_feature_fn("64", "range", feat_batch=2)  # 3 -> pad chunk
        fn4 = build_feature_fn("64", "range", feat_batch=4)  # single pad chunk
        f2, f4 = fn2(clouds), fn4(clouds)
        assert f2.shape[0] == 3 and f2.shape == f4.shape
        np.testing.assert_allclose(f2, f4, rtol=1e-4, atol=1e-5)


class TestDeviceMetrics:
    """Device-side sufficient statistics == host metrics (serving loop path)."""

    def _clouds(self, rng, n_clouds=4, n=1500):
        # clip into the 64-beam BEV range with some out-of-range strays
        return np.stack([(rng.standard_normal((n, 3)) * 18).astype(np.float32)
                         for _ in range(n_clouds)])

    def test_jsd_from_device_hists(self, rng):
        from lidar_layout_tpu.eval import device_metrics as D

        ref = self._clouds(rng)
        smp = self._clouds(rng)
        valid = jnp.ones(ref.shape[:2], bool)
        hp = np.asarray(D.bev_hist_accumulate(jnp.asarray(ref), valid))
        hq = np.asarray(D.bev_hist_accumulate(jnp.asarray(smp), valid))
        got = D.jsd_from_hists(hp, hq)
        want = M.compute_jsd(list(ref), list(smp))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_jsd_hist_respects_validity_mask(self, rng):
        from lidar_layout_tpu.eval import device_metrics as D

        ref = self._clouds(rng, n_clouds=2)
        valid = jnp.ones(ref.shape[:2], bool).at[:, ::2].set(False)
        h = np.asarray(D.bev_hist_accumulate(jnp.asarray(ref), valid))
        want = M.bev_count_histogram([c[1::2] for c in ref])
        np.testing.assert_allclose(h, want)

    def test_mmd_from_device_bitmaps(self, rng):
        from lidar_layout_tpu.eval import device_metrics as D

        ref = self._clouds(rng)
        smp = self._clouds(rng)
        valid = jnp.ones(ref.shape[:2], bool)
        rb = np.asarray(D.bev_occupancy_bitmaps(jnp.asarray(ref), valid))
        sb = np.asarray(D.bev_occupancy_bitmaps(jnp.asarray(smp), valid))
        got = D.mmd_from_bitmaps(rb, sb)
        want = M.compute_mmd(list(ref), list(smp))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)

    def test_packed_bitmaps_roundtrip_and_mmd(self, rng):
        from lidar_layout_tpu.eval import device_metrics as D

        ref = self._clouds(rng)
        smp = self._clouds(rng)
        valid = jnp.ones(ref.shape[:2], bool)
        rb = np.asarray(D.bev_occupancy_bitmaps(jnp.asarray(ref), valid))
        rp = np.asarray(D.bev_occupancy_packed(jnp.asarray(ref), valid))
        assert rp.dtype == np.uint8 and rp.shape[1] == (rb.shape[1] + 7) // 8
        np.testing.assert_array_equal(
            D.unpack_bitmaps(rp, rb.shape[1]), rb)
        sp = np.asarray(D.bev_occupancy_packed(jnp.asarray(smp), valid))
        sb = np.asarray(D.bev_occupancy_bitmaps(jnp.asarray(smp), valid))
        np.testing.assert_allclose(D.mmd_from_packed(rp, sp),
                                   D.mmd_from_bitmaps(rb, sb),
                                   rtol=0, atol=0)

    def test_rangenet_input_matches_host_path(self, rng):
        from lidar_layout_tpu.eval import device_metrics as D
        from lidar_layout_tpu.eval.rangenet import preprocess_range_batch
        from lidar_layout_tpu.ops import lidar as L
        from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY as geom

        # model-space range images from synthetic clouds
        pts = (rng.standard_normal((2, 4000, 3)) * 15).astype(np.float32)
        imgs = []
        for p in pts:
            img, _ = L.pcd2range(jnp.asarray(p), geom)
            m, _ = L.process_scan(img, geom)
            imgs.append(m)
        imgs = jnp.stack(imgs)

        got = np.asarray(D.rangenet_input_from_model_imgs(imgs, geom))
        # host path: decode to clouds (drop invalid rows), then re-rasterize.
        # Reprojected points sit exactly on pixel-floor boundaries, so the
        # two paths may disagree on a small fraction of pixels (ulp flips to
        # a neighboring pixel); everywhere else they must agree.
        clouds = []
        for im in imgs:
            xyz, valid = L.range2pcd(im, geom)
            clouds.append(np.asarray(xyz)[np.asarray(valid)])
        want = preprocess_range_batch(clouds, geom)
        same = np.all(np.isclose(got, want, rtol=1e-4, atol=1e-4), axis=-1)
        assert same.mean() > 0.99, f"pixel agreement only {same.mean():.4f}"


class TestRangeNet:
    def test_preprocess_matches_jax_projection(self, rng):
        """Host-numpy eval preprocessing == ops.lidar pcd2range/range2xyz."""
        from lidar_layout_tpu.eval.rangenet import preprocess_range_batch
        from lidar_layout_tpu.ops import lidar as L
        from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY as geom

        clouds = [(rng.standard_normal((n, 3)) * 12).astype(np.float32)
                  for n in (700, 1300)]
        got = preprocess_range_batch(clouds, geom)
        assert got.shape == (2, *geom.size, 4)
        for i, pcd in enumerate(clouds):
            img, _ = L.pcd2range(jnp.asarray(pcd), geom)
            xyz, _ = L.range2xyz(img, geom, from_model_space=False)
            np.testing.assert_allclose(got[i, ..., 0], np.asarray(img),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(got[i, ..., 1:], np.asarray(xyz),
                                       rtol=1e-4, atol=1e-4)

    def test_descriptor_shape(self, rng):
        net = RangeNet(layers=21)
        x = jnp.asarray(rng.standard_normal((2, 32, 64, 4)), jnp.float32)
        params = net.init(jax.random.key(0), x)
        feats = net.apply(params, x, return_final_logits=True, agg_type="depth")
        assert feats.shape == (2, 16 * 32)
        assert np.isfinite(np.asarray(feats)).all()
