"""Per-family trainer dispatch (train/build.py): every registered model
family must get a working (state, step, val_step) from build_family_trainer —
previously only VQModel / LatentDiffusion could train from train_lidm.py and
the gaus/object/cube/KL/R2DM configs crashed in the generic branch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.autoencoder import AEConfig
from lidar_layout_tpu.ops.lidar import LidarGeometry
from lidar_layout_tpu.train.build import build_family_trainer

GEOM = LidarGeometry(size=(16, 64), fov=(10.0, -30.0))


def _params_change(a, b):
    return any(float(jnp.abs(x - y).sum()) > 0
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _img_batch(rng, b=2, ch=1):
    x = np.clip(rng.standard_normal((b, *GEOM.size, ch)), -1, 1).astype(
        np.float32)
    return {"image": jnp.asarray(x),
            "mask": jnp.asarray((x[..., :1] > -0.9).astype(np.float32))}


class TestKLFamily:
    def test_step_and_val(self):
        from lidar_layout_tpu.models.autoencoder import AutoencoderKL
        cfg = AEConfig(ch=8, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1, double_z=True)
        model = AutoencoderKL(cfg, embed_dim=4)
        ft = build_family_trainer(model, {"target": "autoencoder_kl",
                                          "params": {}},
                                  seed=0, lr=1e-3, accumulate=1, geom=GEOM)
        batch = _img_batch(np.random.default_rng(0))
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["total_loss"]))
        assert np.isfinite(float(logs["kl_loss"]))
        assert _params_change(ft.state.params_g, s2.params_g)
        v = ft.val_step(s2, batch, jax.random.key(2))
        assert np.isfinite(float(v["rec_loss"]))
        assert ft.monitor == "val/rec_loss"


class TestGausFamily:
    def test_step_has_s2_terms(self):
        from lidar_layout_tpu.models.autoencoder_gaus import VQModelGaus
        cfg = AEConfig(ch=8, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1)
        model = VQModelGaus(cfg, n_embed=32, embed_dim=4)
        ft = build_family_trainer(model, {"target": "vq_model_gaus",
                                          "params": {}},
                                  seed=0, lr=1e-3, accumulate=1, geom=GEOM)
        batch = _img_batch(np.random.default_rng(1))
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        # the rendered-range forward_s2 terms must be in the generator loss
        assert "s2_loss" in logs and np.isfinite(float(logs["s2_loss"]))
        assert np.isfinite(float(logs["total_loss"]))
        assert _params_change(ft.state.params_g, s2.params_g)


class TestR2DMFamily:
    def test_step_and_val(self):
        from lidar_layout_tpu.models.r2dm import R2DMConfig, R2DMDiffusion
        model = R2DMDiffusion(R2DMConfig(
            image_size=GEOM.size, channels=2, timesteps=16,
            base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
            attn_levels=(1,), attn_num_heads=2))
        ft = build_family_trainer(model, {"target": "r2dm"}, seed=0, lr=1e-3,
                                  accumulate=1, geom=GEOM)
        batch = {"image": jnp.zeros((2, *GEOM.size, 2))}
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["loss"]))
        assert _params_change(ft.state.params, s2.params)
        v = ft.val_step(s2, batch, jax.random.key(2))
        assert np.isfinite(float(v["loss_simple_ema"]))


class TestObjectFamily:
    def test_step(self):
        from lidar_layout_tpu.models.object_ae import (ObjectAEConfig,
                                                       VQModelObject)
        model = VQModelObject(ObjectAEConfig(num_points=64, num_grids=64,
                                             cdw_dim=64, num_neighbors=4))
        ft = build_family_trainer(model, {"target": "vq_model_object"},
                                  seed=0, lr=1e-3, accumulate=1, geom=GEOM)
        batch = {"fg_points": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 64, 3)), jnp.float32)}
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["rec_loss"]))
        assert _params_change(ft.state.params, s2.params)


def _cloud_batch(rng, b=2, n=256):
    return {"points": jnp.asarray(rng.uniform(0, 10, (b, n, 3)), jnp.float32),
            "feats": jnp.asarray(rng.standard_normal((b, n, 4)), jnp.float32),
            "mask": jnp.asarray(np.ones((b, n), bool))}


class TestCubeFamilies:
    def _vae(self):
        from lidar_layout_tpu.models.sparse_vae import (SparseVAE,
                                                        SparseVAEConfig)
        return SparseVAE(SparseVAEConfig(base_capacity=128,
                                         channels=(8, 16, 32)))

    def test_cube_ae_step(self):
        model = self._vae()
        ft = build_family_trainer(model, {"target": "cube_ae"}, seed=0,
                                  lr=1e-3, accumulate=1, geom=GEOM)
        batch = _cloud_batch(np.random.default_rng(0))
        assert ft.state is None
        ft.state = ft.make_state(batch)
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["loss"]))
        assert _params_change(ft.state.params, s2.params)

    def test_cube_diffusion_step(self):
        # registry-built, exactly as train_lidm constructs it: the diffusion
        # latent_dim follows the first stage's cut_ratio
        from lidar_layout_tpu.config import instantiate_from_config
        mc = {"target": "cube_latent_diffusion",
              "params": {
                  "timesteps": 16,
                  "unet_config": {"params": {"model_channels": 8,
                                             "num_res_blocks": 1,
                                             "num_heads": 2}},
                  "first_stage_config": {
                      "target": "cube_ae",
                      "params": {"base_capacity": 128,
                                 "unetconfig": {"params": {"f_maps": 8}}}}}}
        model = instantiate_from_config(mc)
        ft = build_family_trainer(model, mc, seed=0, lr=1e-3, accumulate=1,
                                  geom=GEOM)
        batch = _cloud_batch(np.random.default_rng(1))
        ft.state = ft.make_state(batch)
        s2, logs = ft.step(ft.state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["loss"]))
        assert _params_change(ft.state.params["diffusion"],
                              s2.params["diffusion"])
        # the frozen first stage must NOT move
        assert not _params_change(ft.state.params["first_stage"],
                                  s2.params["first_stage"])


class TestRoutingErrors:
    def test_layout_diffusion_points_to_its_script(self):
        class Fake:
            pass
        with pytest.raises(NotImplementedError, match="train_layout"):
            build_family_trainer(Fake(), {"target": "layout_diffusion"},
                                 seed=0, lr=1e-3, accumulate=1, geom=GEOM)
