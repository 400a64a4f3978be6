"""R2DM, VQModel_Gaus, object VQ-AE tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.losses.geometric import GeoConverter
from lidar_layout_tpu.models.autoencoder import AEConfig
from lidar_layout_tpu.models.autoencoder_gaus import (VQModelGaus, s2_loss,
                                                      render_range_from_gaussians)
from lidar_layout_tpu.models.object_ae import (ObjectAEConfig, VQModelObject,
                                               object_ae_loss)
from lidar_layout_tpu.models.r2dm import (EfficientUNet, R2DMConfig,
                                          R2DMDiffusion, coord_encoding)
from lidar_layout_tpu.ops.gaussian_raster import RasterConfig
from lidar_layout_tpu.ops.lidar import LidarGeometry

GEOM = LidarGeometry(size=(16, 64), fov=(3.0, -25.0))


class TestR2DM:
    def test_coord_encoding_wraps(self):
        enc = np.asarray(coord_encoding(8, 32, 2))
        # azimuth features at column 0 and column W continue smoothly (wrap)
        assert enc.shape == (8, 32, 8)
        assert np.isfinite(enc).all()

    def test_sh_encoding_and_attention(self):
        """Reference-default coords_encoding='spherical_harmonics' (25 chans,
        levels=5) + deep-level self-attention change the computation."""
        from lidar_layout_tpu.models.r2dm import sh_coord_encoding
        enc = np.asarray(sh_coord_encoding(8, 16, 5))
        assert enc.shape == (8, 16, 25)
        assert np.isfinite(enc).all()
        # first basis fn is the constant Y00
        assert np.allclose(enc[..., 0], enc[0, 0, 0])
        assert enc[..., 1:].std() > 0

        cfg = R2DMConfig(image_size=(8, 32), base_channels=8,
                         channel_mult=(1, 2), num_res_blocks=(1, 2),
                         timesteps=8, coords_encoding="spherical_harmonics",
                         attn_levels=(1,), attn_num_heads=2)
        model = R2DMDiffusion(cfg)
        params = model.init(jax.random.key(0))
        names = str(jax.tree_util.tree_structure(params))
        assert "down_1_attn" in names and "up_1_attn" in names
        x = jnp.zeros((1, 8, 32, 2))
        out = model.apply_model(params, x, jnp.zeros((1,), jnp.int32))
        assert out.shape == x.shape

    def test_train_loss(self):
        cfg = R2DMConfig(image_size=(16, 64), base_channels=16,
                         channel_mult=(1, 2), num_res_blocks=1, timesteps=32,
                         coord_bands=2)
        model = R2DMDiffusion(cfg)
        params = model.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64, 2)),
                        jnp.float32)
        loss, _ = model.p_losses(params, jax.random.key(1), x)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: model.p_losses(p, jax.random.key(2), x)[0])(params)
        assert sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)) > 0


class TestVQModelGaus:
    def test_decode_gaussians_and_render(self):
        cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1)
        model = VQModelGaus(cfg, n_embed=64, embed_dim=4)
        x = jnp.asarray(np.clip(np.random.default_rng(0)
                                .standard_normal((1, 16, 64, 1)), -1, 1) * 0.3,
                        jnp.float32)
        params = model.init(jax.random.key(0), x)
        quant, qloss, _ = model.apply(params, x, method=VQModelGaus.encode)
        dec, gaus = model.apply(params, quant,
                                method=VQModelGaus.decode_gaussians)
        assert dec.shape == (1, 16, 64, 1)
        assert gaus["rot"].shape == (1, 16, 64, 4)
        # SH payload: 4 channels x 16 coeffs (deg 3), model_lidm.py:521-530
        assert gaus["sh"].shape == (1, 16, 64, 4, 16)
        out = render_range_from_gaussians(dec, gaus, GEOM,
                                          RasterConfig(chunk=128))
        assert out["rendered_range"].shape == (1, 16, 64)
        assert np.isfinite(np.asarray(out["rendered_range"])).all()
        assert out["rendered_intensity"].shape == (1, 16, 64)
        assert out["rendered_raydrop"].shape == (1, 16, 64)
        assert np.isfinite(np.asarray(out["rendered_feat"])).all()

        geo = GeoConverter(GEOM, curve_length=1)
        from lidar_layout_tpu.ops.lidar import depth_to_model
        rend_model = depth_to_model(out["rendered_range"], GEOM)[..., None]
        loss, logs = s2_loss(geo, x, rend_model)
        assert np.isfinite(float(loss))


class TestObjectAE:
    def test_reconstruction_trains(self):
        cfg = ObjectAEConfig(num_points=128, num_grids=144, cdw_dim=256,
                             num_neighbors=8)
        model = VQModelObject(cfg)
        pts = jnp.asarray(np.random.default_rng(0)
                          .uniform(-1, 1, (128, 3)), jnp.float32)
        params = model.init(jax.random.key(0), pts)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p):
            rec, q, _ = model.apply(p, pts)
            return object_ae_loss(rec, pts, q)[0]

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        l0 = float(loss_fn(params))
        for _ in range(80):
            params, opt, l = step(params, opt)
        # the full-depth G2SD needs more steps than the round-1 toy AE to
        # halve; 80 Adam steps reliably cut chamfer by >35%
        assert float(l) < 0.65 * l0


class TestR2DMSampling:
    """R2DM satisfies the generic sampler contract (eps parameterization)."""

    def test_ddim_and_plms_sample_finite(self):
        cfg = R2DMConfig(image_size=(8, 32), base_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1, timesteps=32,
                         coord_bands=2)
        model = R2DMDiffusion(cfg)
        params = model.init(jax.random.key(0))
        from lidar_layout_tpu.models.samplers import ddim_sample, plms_sample
        x = ddim_sample(model, params, jax.random.key(1), (2, 8, 32, 2),
                        steps=8)
        assert x.shape == (2, 8, 32, 2)
        assert np.isfinite(np.asarray(x)).all()
        y = plms_sample(model, params, jax.random.key(2), (2, 8, 32, 2),
                        steps=8)
        assert np.isfinite(np.asarray(y)).all()
