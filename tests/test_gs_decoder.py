"""Dense decoder (PT-v3 -> surfels -> rendered range) end-to-end tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.models.gs_decoder import (DenseDecoder, GSDecoder,
                                                GSDecoderConfig, gs_loss,
                                                render_surfels)
from lidar_layout_tpu.models.ptv3 import PTv3Config
from lidar_layout_tpu.ops.gaussian_raster import RasterConfig
from lidar_layout_tpu.ops.lidar import LidarGeometry

GEOM = LidarGeometry(size=(16, 64), fov=(3.0, -25.0))
BB = PTv3Config(in_channels=4, patch_size=32, enc_depths=(1, 1),
                enc_channels=(16, 32), enc_heads=(2, 4), dec_depths=(1,),
                dec_channels=(16,), dec_heads=(2,), bits=8)
RC = RasterConfig(chunk=64)


def scene(rng, n=128):
    d = rng.uniform(5, 30, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(GEOM.fov_down + 0.05, GEOM.fov_up - 0.01, n)
    pts = np.stack([np.cos(yaw) * np.cos(pitch) * d,
                    -np.sin(yaw) * np.cos(pitch) * d,
                    np.sin(pitch) * d], -1).astype(np.float32)
    feats = np.concatenate([pts, rng.standard_normal((n, 1))], -1).astype(np.float32)
    return pts, feats, np.ones(n, bool)


class TestGSDecoder:
    def test_surfel_shapes(self, rng):
        pts, feats, mask = scene(rng)
        dec = GSDecoder(GSDecoderConfig(feat_dim=16, n_offsets=4))
        f16 = jnp.asarray(feats[:, :4] @ np.ones((4, 16), np.float32))
        params = dec.init(jax.random.key(0), jnp.asarray(pts), f16,
                          jnp.asarray(mask))
        s = dec.apply(params, jnp.asarray(pts), f16, jnp.asarray(mask))
        n = len(pts) * 4
        assert s["means"].shape == (n, 3)
        assert s["scales"].shape == (n, 3)
        assert np.asarray(s["scales"]).min() > 0
        assert s["quats"].shape == (n, 4)
        # anchors stay near their parent points (offset_scale bound)
        d = np.linalg.norm(np.asarray(s["means"]).reshape(-1, 4, 3)
                           - pts[:, None], axis=-1)
        assert d.max() <= np.sqrt(3) * 1.0 + 1e-5

    def test_dense_decoder_forward_and_render(self, rng):
        pts, feats, mask = scene(rng)
        model = DenseDecoder(BB, GSDecoderConfig(feat_dim=16, n_offsets=2))
        params = model.init(jax.random.key(0), jnp.asarray(pts),
                            jnp.asarray(feats), jnp.asarray(mask))
        surfels = model.apply(params, jnp.asarray(pts), jnp.asarray(feats),
                              jnp.asarray(mask))
        render = render_surfels(surfels, GEOM, RC)
        assert render["pred_range"].shape == GEOM.size
        assert np.isfinite(np.asarray(render["pred_range"])).all()

    def test_training_improves_range(self, rng):
        """Few steps of surfel optimization should reduce range error against a
        GT projection of the same cloud."""
        from lidar_layout_tpu.ops.lidar import pcd2range
        pts, feats, mask = scene(rng, 256)
        gt_range, _ = pcd2range(jnp.asarray(pts), GEOM)
        gt_mask = np.asarray(gt_range) > 0
        gt = jnp.where(jnp.asarray(gt_mask), gt_range, 0.0)

        model = DenseDecoder(BB, GSDecoderConfig(feat_dim=16, n_offsets=2))
        params = model.init(jax.random.key(0), jnp.asarray(pts),
                            jnp.asarray(feats), jnp.asarray(mask))
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        def loss_fn(p):
            surfels = model.apply(p, jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.asarray(mask))
            render = render_surfels(surfels, GEOM, RC)
            return gs_loss(render, gt, jnp.asarray(gt_mask))[0]

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        l0 = float(loss_fn(params))
        for _ in range(30):
            params, opt, l = step(params, opt)
        assert float(l) < l0
        assert np.isfinite(float(l))
