"""Tests for the parity-fill components: ldm variant, KL loss, clustering,
transforms, misc."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.data.transforms import build_pipeline
from lidar_layout_tpu.losses.contperceptual import (KLLossConfig,
                                                    kl_autoencoder_loss)
from lidar_layout_tpu.losses.geometric import GeoConverter
from lidar_layout_tpu.models.autoencoder import (AEConfig, AutoencoderKL,
                                                 Encoder)
from lidar_layout_tpu.ops.cluster import cluster_points
from lidar_layout_tpu.ops.lidar import LidarGeometry


class TestLdmVariant:
    def test_non_circular_encoder_does_not_wrap(self):
        cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((2, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1, circular=False)
        enc = Encoder(cfg)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 16, 32, 1)), jnp.float32)
        params = enc.init(jax.random.key(0), x)
        z1 = enc.apply(params, x)
        z2 = enc.apply(params, jnp.roll(x, 8, axis=2))
        # plain convs are NOT wrap-equivariant: rolled output must differ
        diff = float(jnp.abs(jnp.roll(z1, 4, axis=2) - z2).max())
        assert diff > 1e-4


class TestKLLoss:
    def test_loss_components(self, rng):
        cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1, double_z=True)
        m = AutoencoderKL(cfg, embed_dim=4)
        x = jnp.asarray(rng.standard_normal((2, 16, 64, 1)), jnp.float32)
        params = m.init(jax.random.key(0), x, rng=jax.random.key(1))
        dec, post = m.apply(params, x, rng=jax.random.key(2))
        geo = GeoConverter(LidarGeometry(size=(16, 64)), curve_length=1)
        loss, logs = kl_autoencoder_loss(KLLossConfig(), geo, x, dec, post,
                                         jnp.zeros(()))
        assert np.isfinite(float(loss))
        assert logs["kl_loss"] > 0


class TestClustering:
    def test_two_separated_clusters(self):
        rng = np.random.default_rng(0)
        c1 = rng.normal(0, 0.2, (100, 3))
        c2 = rng.normal(10, 0.2, (100, 3))
        pts = jnp.asarray(np.vstack([c1, c2]), jnp.float32)
        mask = jnp.ones(200, bool)
        plabels, _ = cluster_points(pts, mask, voxel_size=0.5, capacity=512)
        p = np.asarray(plabels)
        # each cluster is one component; the two differ
        assert len(np.unique(p[:100])) == 1
        assert len(np.unique(p[100:])) == 1
        assert p[0] != p[150]

    def test_respects_mask(self):
        pts = jnp.asarray(np.random.default_rng(1)
                          .standard_normal((64, 3)), jnp.float32)
        mask = jnp.asarray([True] * 32 + [False] * 32)
        plabels, _ = cluster_points(pts, mask, capacity=128)
        assert (np.asarray(plabels)[32:] == 128).all()


class TestTransforms:
    def test_pipeline(self):
        rng = np.random.default_rng(0)
        coord = rng.uniform(-60, 60, (5000, 3)).astype(np.float32)
        data = {"coord": coord, "raw_coord": coord}
        pipe = build_pipeline([
            {"type": "FiltPoint"},
            {"type": "GridSample", "grid_size": 0.5},
            {"type": "CoordConvert"},
            {"type": "Collect", "keys": ["coord", "origin"]},
        ])
        out = pipe(data)
        assert set(out) == {"coord", "origin"}
        assert len(out["coord"]) < len(coord)
        assert out["coord"].min() >= 0
