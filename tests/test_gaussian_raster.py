"""Panoramic Gaussian rasterizer tests: geometry, compositing, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.ops.gaussian_raster import (RasterConfig,
                                                  build_covariance,
                                                  quat_to_rotmat, rasterize,
                                                  render_range_image,
                                                  spherical_project)
from lidar_layout_tpu.ops.lidar import LidarGeometry

GEOM = LidarGeometry(size=(32, 128), fov=(3.0, -25.0), depth_range=(1.0, 56.0))
CFG = RasterConfig(chunk=64)


def make_gaussians(rng, n=64, r=(5, 30)):
    depth = rng.uniform(*r, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(GEOM.fov_down + 0.05, GEOM.fov_up - 0.01, n)
    means = np.stack([np.cos(yaw) * np.cos(pitch) * depth,
                      -np.sin(yaw) * np.cos(pitch) * depth,
                      np.sin(pitch) * depth], -1).astype(np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = np.full((n, 3), 0.5, np.float32)
    ops = np.full((n,), 0.9, np.float32)
    feats = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    return means, quats, scales, ops, feats


class TestGeometry:
    def test_quat_identity(self):
        R = np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_covariance_isotropic(self):
        cov = np.asarray(build_covariance(jnp.asarray([[1.0, 0, 0, 0]]),
                                          jnp.asarray([[2.0, 2.0, 2.0]])))
        np.testing.assert_allclose(cov[0], 4 * np.eye(3), atol=1e-5)

    def test_projection_matches_lidar_ops(self):
        from lidar_layout_tpu.ops.lidar import project_coords
        pts = jnp.asarray([[10.0, 3.0, -2.0], [5.0, -5.0, 0.0]])
        u, v, d = spherical_project(pts, GEOM)
        px, py, dd = project_coords(pts, GEOM)
        np.testing.assert_allclose(np.asarray(u), np.asarray(px) * 128, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(py) * 32, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d), np.asarray(dd), rtol=1e-6)


class TestRasterize:
    def test_single_gaussian_renders_at_projection(self):
        means = jnp.asarray([[15.0, 0.0, -2.0]])
        out = rasterize(means, jnp.asarray([[1.0, 0, 0, 0]]),
                        jnp.asarray([[0.5, 0.5, 0.5]]), jnp.asarray([0.95]),
                        jnp.asarray([[1.0]]), GEOM, cfg=CFG)
        alpha = np.asarray(out["alpha"])
        u, v, _ = spherical_project(means, GEOM)
        iu, iv = int(np.asarray(u)[0]), int(np.asarray(v)[0])
        assert alpha[iv, iu] > 0.5          # peak at the projected center
        assert alpha.max() == alpha[iv, iu]
        # depth at the peak equals the gaussian's depth
        d = np.asarray(out["depth"])[iv, iu] / alpha[iv, iu]
        np.testing.assert_allclose(d, np.linalg.norm([15.0, 0, -2.0]), rtol=0.05)

    def test_front_occludes_back(self):
        # two gaussians on the same ray: the near one dominates
        means = jnp.asarray([[10.0, 0.0, -1.0], [40.0, 0.0, -4.0]])
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        scales = jnp.full((2, 3), 1.0)
        ops = jnp.asarray([0.95, 0.95])
        feats = jnp.asarray([[1.0], [0.0]])  # near=1, far=0
        out = rasterize(means, quats, scales, ops, feats, GEOM, cfg=CFG)
        alpha = np.asarray(out["alpha"])
        iv, iu = np.unravel_index(alpha.argmax(), alpha.shape)
        val = np.asarray(out["feature"])[iv, iu, 0] / alpha[iv, iu]
        assert val > 0.8, f"near gaussian must dominate, got {val}"

    def test_azimuth_wrap(self):
        """A gaussian at the +-pi seam spreads across both image borders."""
        means = jnp.asarray([[-20.0, 0.001, -2.0]])  # yaw ~ +-pi
        out = rasterize(means, jnp.asarray([[1.0, 0, 0, 0]]),
                        jnp.full((1, 3), 2.0), jnp.asarray([0.9]),
                        jnp.asarray([[1.0]]), GEOM, cfg=CFG)
        alpha = np.asarray(out["alpha"])
        row = alpha[np.unravel_index(alpha.argmax(), alpha.shape)[0]]
        assert row[0] > 0.01 and row[-1] > 0.01  # both borders lit

    def test_masked_gaussians_invisible(self, rng):
        m, q, s, o, f = make_gaussians(rng, 32)
        mask = np.zeros(32, bool)
        out = rasterize(jnp.asarray(m), jnp.asarray(q), jnp.asarray(s),
                        jnp.asarray(o), jnp.asarray(f), GEOM,
                        mask=jnp.asarray(mask), cfg=CFG)
        assert np.asarray(out["alpha"]).max() == 0.0

    def test_gradients_flow(self, rng):
        m, q, s, o, f = make_gaussians(rng, 32)

        def loss(means, scales, ops):
            out = rasterize(means, jnp.asarray(q), scales, ops,
                            jnp.asarray(f), GEOM, cfg=CFG)
            return jnp.sum(out["feature"] ** 2) + jnp.sum(out["depth"])

        g = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(m), jnp.asarray(s),
                                              jnp.asarray(o))
        for gi in g:
            arr = np.asarray(gi)
            assert np.isfinite(arr).all()
            assert np.abs(arr).sum() > 0

    def test_render_range_image_contract(self, rng):
        m, q, s, o, f = make_gaussians(rng, 128)
        out = render_range_image(jnp.asarray(m), jnp.asarray(q),
                                 jnp.asarray(s), jnp.asarray(o),
                                 jnp.asarray(f[:, 0]), GEOM, cfg=CFG)
        assert out["range"].shape == GEOM.size
        assert out["raydrop"].shape == GEOM.size
        r = np.asarray(out["range"])
        a = np.asarray(out["alpha"])
        hit = a > 0.5
        assert hit.any()
        assert r[hit].min() > 1.0 and r[hit].max() < 56.0
