"""pointops, augmentation, fold/unfold tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.data.aug import keypoint_drop, random_flip, random_rotate
from lidar_layout_tpu.ops.foldunfold import patched_apply
from lidar_layout_tpu.ops.pointops import (ball_query, farthest_point_sample,
                                           group_points, knn_query,
                                           three_nn_interpolate)


class TestPointOps:
    def test_fps_spreads(self, rng):
        # clustered cloud: FPS must pick from all clusters
        c1 = rng.normal(0, 0.1, (100, 3))
        c2 = rng.normal(10, 0.1, (100, 3))
        c3 = rng.normal(-10, 0.1, (100, 3))
        pts = jnp.asarray(np.vstack([c1, c2, c3]), jnp.float32)
        idx = np.asarray(farthest_point_sample(pts, 3))
        clusters = set(i // 100 for i in idx)
        assert len(clusters) == 3

    def test_fps_respects_mask(self, rng):
        pts = jnp.asarray(rng.standard_normal((50, 3)), jnp.float32)
        mask = jnp.asarray([True] * 10 + [False] * 40)
        idx = np.asarray(farthest_point_sample(pts, 5, mask))
        assert (idx < 10).all()

    def test_knn_matches_bruteforce(self, rng):
        q = jnp.asarray(rng.standard_normal((20, 3)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((100, 3)), jnp.float32)
        idx, d2 = knn_query(q, p, 4)
        bd = np.asarray(((np.asarray(q)[:, None] - np.asarray(p)[None]) ** 2
                         ).sum(-1))
        ref = np.sort(bd, axis=1)[:, :4]
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_ball_query_radius(self, rng):
        q = jnp.zeros((1, 3))
        p = jnp.asarray([[0.1, 0, 0], [0.2, 0, 0], [5.0, 0, 0]], jnp.float32)
        idx, valid = ball_query(q, p, radius=1.0, k=3)
        v = np.asarray(valid)[0]
        assert v[:2].all() and not v[2]
        # out-of-radius slot falls back to the nearest neighbor
        assert np.asarray(idx)[0, 2] == np.asarray(idx)[0, 0]

    def test_interpolation_exact_at_points(self, rng):
        p = jnp.asarray(rng.standard_normal((50, 3)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((50, 8)), jnp.float32)
        out = three_nn_interpolate(p[:5], p, f)
        np.testing.assert_allclose(np.asarray(out), np.asarray(f[:5]),
                                   rtol=1e-3, atol=1e-4)

    def test_grouping_shapes(self, rng):
        p = jnp.asarray(rng.standard_normal((40, 3)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((40, 4)), jnp.float32)
        idx, _ = knn_query(p[:8], p, 5)
        g = group_points(p, f, idx, p[:8])
        assert g.shape == (8, 5, 7)


class TestAug:
    def test_flip_preserves_norm(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        boxes = rng.standard_normal((4, 7)).astype(np.float32)
        p2, b2 = random_flip(pts, boxes, np.random.default_rng(0))
        np.testing.assert_allclose(np.linalg.norm(p2, axis=1),
                                   np.linalg.norm(pts, axis=1), rtol=1e-6)
        assert b2.shape == boxes.shape

    def test_rotate_preserves_z_and_norm(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        p2, _ = random_rotate(pts, None, np.random.default_rng(1))
        np.testing.assert_allclose(p2[:, 2], pts[:, 2])
        np.testing.assert_allclose(np.linalg.norm(p2[:, :2], axis=1),
                                   np.linalg.norm(pts[:, :2], axis=1),
                                   rtol=1e-5)

    def test_keypoint_drop_removes_points(self, rng):
        pts = rng.uniform(-20, 20, (5000, 3)).astype(np.float32)
        out = keypoint_drop(pts, np.random.default_rng(2))
        assert 0 < len(out) < len(pts)


class TestFoldUnfold:
    def test_identity_fn_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 64, 2)), jnp.float32)
        out = patched_apply(lambda t: t, x, patch=(8, 16), stride=(4, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_wraps_azimuth(self, rng):
        """A fn that mixes within patches still reconstructs constants across
        the wrap seam."""
        x = jnp.ones((1, 8, 32, 1))
        out = patched_apply(lambda t: t * 2.0, x, patch=(8, 16), stride=(4, 8))
        np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


class TestSphericalHarmonics:
    def test_degree0_is_constant(self):
        from lidar_layout_tpu.ops.sh import C0, eval_sh
        sh = jnp.ones((5, 2, 1))
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                           jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(np.asarray(out), C0, rtol=1e-5)

    def test_degree3_matches_reference_polynomials(self):
        """Spot-check vs the closed-form real SH at +z: only m=0 bands are
        nonzero there, with Y_l0(z=1) = C0, C1, C2[2]*2, C3[3]*2."""
        from lidar_layout_tpu.ops.sh import C0, C1, C2, C3, eval_sh
        sh = jnp.zeros((1, 1, 16))
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        for idx, expected in ((0, C0), (2, C1), (6, 2 * C2[2]), (12, 2 * C3[3])):
            out = eval_sh(3, sh.at[..., idx].set(1.0), dirs)
            np.testing.assert_allclose(float(out[0, 0]), expected, rtol=1e-5)

    def test_linear_in_coefficients(self):
        from lidar_layout_tpu.ops.sh import eval_sh
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(3, 4, 16)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(3, 4, 16)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        lhs = eval_sh(3, a + b, dirs)
        rhs = eval_sh(3, a, dirs) + eval_sh(3, b, dirs)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-4, atol=1e-5)


class TestVisHtml:
    def test_save_pcd_html(self, tmp_path):
        from lidar_layout_tpu.utils.vis import save_pcd_html, save_scene_grid_html
        pts = np.random.default_rng(0).uniform(-10, 10, (500, 3)).astype(np.float32)
        p = save_pcd_html(str(tmp_path / "cloud.html"), pts)
        html = open(p).read()
        assert "<canvas" in html and "500 points" in html
        g = save_scene_grid_html(str(tmp_path / "grid.html"), [pts, pts])
        assert "1000 points" in open(g).read()
