"""Banded rasterizer equivalence vs the dense scan rasterizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.ops.gaussian_raster import RasterConfig, rasterize
from lidar_layout_tpu.ops.gaussian_raster_tiled import (BandedConfig,
                                                        rasterize_banded)
from lidar_layout_tpu.ops.lidar import LidarGeometry

GEOM = LidarGeometry(size=(32, 128), fov=(3.0, -25.0))


def gaussians(rng, n=200):
    d = rng.uniform(5, 40, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(GEOM.fov_down + 0.05, GEOM.fov_up - 0.01, n)
    means = np.stack([np.cos(yaw) * np.cos(pitch) * d,
                      -np.sin(yaw) * np.cos(pitch) * d,
                      np.sin(pitch) * d], -1).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    quats[:, 0] += 3.0
    scales = rng.uniform(0.2, 0.6, (n, 3)).astype(np.float32)
    ops = rng.uniform(0.3, 0.95, n).astype(np.float32)
    feats = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, scales, ops, feats))


class TestBandedEquivalence:
    def test_matches_dense(self, rng):
        m, q, s, o, f = gaussians(rng)
        dense = rasterize(m, q, s, o, f, GEOM, cfg=RasterConfig(chunk=64))
        banded = rasterize_banded(
            m, q, s, o, f, GEOM,
            cfg=BandedConfig(band_w=16, capacity=256, max_span=7, chunk=64))
        for key in ("alpha", "depth"):
            a = np.asarray(dense[key])
            b = np.asarray(banded[key])
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(banded["feature"]),
                                   np.asarray(dense["feature"]),
                                   rtol=5e-3, atol=5e-3)

    def test_mask_and_gradients(self, rng):
        m, q, s, o, f = gaussians(rng, 64)
        mask = jnp.asarray([True] * 32 + [False] * 32)
        out = rasterize_banded(m, q, s, o, f, GEOM, mask=mask,
                               cfg=BandedConfig(band_w=16, capacity=128,
                                                chunk=32))
        assert np.isfinite(np.asarray(out["alpha"])).all()

        def loss(mm, ss, oo):
            r = rasterize_banded(mm, q, ss, oo, f, GEOM, mask=mask,
                                 cfg=BandedConfig(band_w=16, capacity=128,
                                                  chunk=32))
            return jnp.sum(r["feature"] ** 2) + jnp.sum(r["depth"])

        g = jax.grad(loss, argnums=(0, 1, 2))(m, s, o)
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        # masked gaussians receive no gradient
        assert np.abs(np.asarray(g[0])[32:]).max() == 0

    def test_wrap_seam(self):
        means = jnp.asarray([[-20.0, 0.001, -2.0]])  # at the +-pi seam
        out = rasterize_banded(
            means, jnp.asarray([[1.0, 0, 0, 0]]), jnp.full((1, 3), 2.0),
            jnp.asarray([0.9]), jnp.asarray([[1.0]]), GEOM,
            cfg=BandedConfig(band_w=16, capacity=64, max_span=5, chunk=32))
        alpha = np.asarray(out["alpha"])
        row = alpha[np.unravel_index(alpha.argmax(), alpha.shape)[0]]
        assert row[0] > 0.01 and row[-1] > 0.01


class TestOverflowReporting:
    """No silent caps: rasterize_banded reports dropped band entries."""

    def test_zero_overflow_at_sufficient_capacity(self):
        rng = np.random.default_rng(3)
        out = rasterize_banded(*gaussians(rng, 100), GEOM,
                               cfg=BandedConfig(band_w=16, capacity=256,
                                                max_span=7, chunk=64))
        assert int(out["overflow"]) == 0

    def test_overflow_counted_when_capacity_too_small(self):
        rng = np.random.default_rng(4)
        # 400 gaussians, 8 bands, capacity 8: must drop most entries
        out = rasterize_banded(*gaussians(rng, 400), GEOM,
                               cfg=BandedConfig(band_w=16, capacity=8,
                                                max_span=5, chunk=8))
        assert int(out["overflow"]) > 100
