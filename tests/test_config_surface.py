"""Every translated reference config must instantiate, and every model family
must run a tiny-shape train + sample step when built through the registry.

Parity: the reference's config-driven workflow (misc_utils.py:118-133 +
configs/ tree of 19 files). VERDICT r1 item #3.
"""
import copy
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.config import instantiate_from_config, load_yaml

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(HERE, "configs", "**", "*.yaml"),
                         recursive=True)
    if os.sep + "tests" + os.sep not in p)


def _prep(model_cfg):
    cfg = copy.deepcopy(model_cfg)
    if cfg.get("target") == "layout_diffusion":
        cfg.setdefault("params", {})["vocab"] = {"num_objs": 32,
                                                 "num_preds": 16}
    return cfg


class TestAllConfigsInstantiate:
    @pytest.mark.parametrize("path", ALL_CONFIGS,
                             ids=[os.path.relpath(p, HERE) for p in ALL_CONFIGS])
    def test_instantiate(self, path):
        cfg = load_yaml(path)
        model = instantiate_from_config(_prep(cfg["model"]))
        assert model is not None

    def test_translation_complete(self):
        # every reference yaml family has a translated counterpart
        names = {os.path.basename(p) for p in ALL_CONFIGS}
        expected = {
            "autoencoder_c2_p4.yaml", "autoencoder_c2_p4_gaus.yaml",
            "autoencoder_cube.yaml", "range_flow.yaml", "g2sd_32.yaml",
            "layout_nusc.yaml", "uncond_c2_p4.yaml", "layout_cond_c2_p4.yaml",
            "range_256x8.yaml", "range_uncond_diffusion_64x4.yaml",
            "voxel_1024.yaml", "voxel_1024_pt.yaml",
            "voxel_uncond_diffusion_256.yaml", "r2dm_diffusion.yaml",
            "gaus_10cm.yaml", "ptv3.yaml"}
        missing = expected - names
        assert not missing, f"untranslated configs: {missing}"


def shrink_ae(dd):
    dd = dict(dd)
    dd.update(ch=8, num_res_blocks=1)
    return dd


class TestTinyTrainAndSample:
    """One tiny-shape train step + (where meaningful) sample step per family,
    built through the registry with widths shrunk mechanically."""

    def test_vq_model_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/autoencoder/nuscenes/autoencoder_c2_p4.yaml"))
        p = cfg["model"]["params"]
        p["ddconfig"] = shrink_ae(p["ddconfig"])
        model = instantiate_from_config(cfg["model"])
        from lidar_layout_tpu.losses.discriminator import \
            LiDARNLayerDiscriminator
        from lidar_layout_tpu.losses.geometric import GeoConverter
        from lidar_layout_tpu.ops.lidar import LidarGeometry
        from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                       make_ae_optimizers,
                                                       make_ae_train_step)
        loss_cfg = instantiate_from_config(p["lossconfig"])
        geom = LidarGeometry(size=(16, 64), fov=(10, -30))
        geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
        disc = LiDARNLayerDiscriminator(n_layers=1)
        tx_g, tx_d = make_ae_optimizers(1e-4, 1e-4)
        state = create_ae_state(model, disc, jax.random.key(0), (16, 64, 1),
                                tx_g, tx_d, loss_cfg, geo)
        step = make_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d)
        batch = {"image": jnp.zeros((2, 16, 64, 1))}
        state, logs = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["total_loss"]))

    def test_latent_diffusion_uncond(self):
        cfg = load_yaml(os.path.join(
            HERE,
            "configs/ours/nuscenes/coarse_range/range_uncond_diffusion_64x4.yaml"))
        p = cfg["model"]["params"]
        p["timesteps"] = 32
        p["unet_config"]["params"].update(model_channels=16,
                                          num_res_blocks=1,
                                          channel_mult=[1, 2],
                                          attention_resolutions=[2],
                                          num_head_channels=8)
        p["first_stage_config"]["params"]["ddconfig"] = shrink_ae(
            p["first_stage_config"]["params"]["ddconfig"])
        p["image_size"] = [4, 16]
        model = instantiate_from_config(cfg["model"])
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, make_train_step)
        params = model.init(jax.random.key(0), image_shape=(16, 64, 1))
        tx = make_optimizer(1e-4)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        state, logs = step(state, {"image": jnp.zeros((2, 16, 64, 1))},
                           jax.random.key(1))
        assert np.isfinite(float(logs["loss"]))
        from lidar_layout_tpu.models.samplers import ddim_sample
        z = ddim_sample(model, state.params, jax.random.key(2),
                        (2, *model.cfg.latent_shape), steps=4)
        assert np.isfinite(np.asarray(z)).all()

    def test_latent_diffusion_layout_cond(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/lidar_diffusion/nuscenes/layout_cond_c2_p4.yaml"))
        p = cfg["model"]["params"]
        p["timesteps"] = 32
        p["image_size"] = [4, 8]   # (16, 64) image through c2_p4 strides
        p["unet_config"]["params"].update(
            model_channels=16, num_res_blocks=1, channel_mult=[1, 2],
            attention_ds=[1, 2], encoder_channels=32, num_head_channels=8,
            image_size=[4, 8])
        p["cond_stage_config"]["params"].update(
            hidden_dim=32, output_dim=64, num_layers=1, num_heads=4,
            feature_map_size=[4, 8], resolution_to_attention=[4, 2])
        p["first_stage_config"]["params"]["ddconfig"] = shrink_ae(
            p["first_stage_config"]["params"]["ddconfig"])
        model = instantiate_from_config(cfg["model"])

        rng = np.random.default_rng(0)
        layout = np.concatenate([
            rng.uniform(-1, 1, (2, 13, 8)), rng.uniform(0, 1, (2, 13, 4)),
            rng.integers(0, 9, (2, 13, 1)).astype(float)], -1)
        layout = jnp.asarray(layout, jnp.float32)
        params = model.init(jax.random.key(0), image_shape=(16, 64, 1),
                            cond_example=layout)
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, make_train_step)
        tx = make_optimizer(1e-4)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        batch = {"image": jnp.zeros((2, 16, 64, 1)), "cond": layout}
        state, logs = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(logs["loss"]))
        # conditioning reaches the loss: different layouts -> different loss
        batch2 = {"image": batch["image"],
                  "cond": jnp.asarray(np.concatenate([
                      rng.uniform(-1, 1, (2, 13, 8)),
                      rng.uniform(0, 1, (2, 13, 4)),
                      rng.integers(0, 9, (2, 13, 1)).astype(float)], -1),
                      jnp.float32)}
        _, l2 = step(state, batch2, jax.random.key(1))
        assert float(logs["loss"]) != float(l2["loss"])

    def test_layout_diffusion_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/layout_diffusion/nuscenes/layout_nusc.yaml"))
        p = cfg["model"]["params"]
        p["timesteps"] = 32
        p["vocab"] = {"num_objs": 32, "num_preds": 16}
        p["unet_config"]["params"].update(model_channels=32, num_res_blocks=1,
                                          channel_mult=[1, 1],
                                          attention_resolutions=[1],
                                          concat_dim=64, crossattn_dim=64)
        p["cond_stage_config"]["params"]["embedding_dim"] = 16
        model = instantiate_from_config(cfg["model"])
        from lidar_layout_tpu.data.layout_synthetic import \
            synthetic_graph_batch
        g = {k: jnp.asarray(v) for k, v in
             synthetic_graph_batch(np.random.default_rng(0)).items()}
        params = model.init(jax.random.key(0), g)
        loss, _ = model.p_losses(params, jax.random.key(1), g)
        assert np.isfinite(float(loss))

    def test_cube_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/ours/nuscenes/refine_voxel/voxel_1024.yaml"))
        p = cfg["model"]["params"]
        p["base_capacity"] = 256
        p["unetconfig"]["params"]["f_maps"] = 8
        vae = instantiate_from_config(cfg["model"])
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 10, (400, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((400, 4)), jnp.float32)
        mask = jnp.ones(400, bool)
        vp = vae.init(jax.random.key(0), pts, feats, mask, jax.random.key(1))
        out = vae.apply(vp, pts, feats, mask, jax.random.key(2))
        from lidar_layout_tpu.models.sparse_vae import struct_loss
        loss, _ = struct_loss(out, kl_weight=vae.cfg.kl_weight)
        assert np.isfinite(float(loss))

        dcfg = load_yaml(os.path.join(
            HERE,
            "configs/ours/nuscenes/refine_voxel/voxel_uncond_diffusion_256.yaml"))
        dp_ = dcfg["model"]["params"]
        dp_["timesteps"] = 32
        dp_["first_stage_config"]["params"]["base_capacity"] = 256
        dp_["first_stage_config"]["params"]["unetconfig"]["params"]["f_maps"] = 8
        dp_["unet_config"]["params"].update(model_channels=16, num_heads=2,
                                            num_res_blocks=1)
        diff = instantiate_from_config(dcfg["model"])
        grid, z0 = out["latent_grid"], out["latent"]
        assert z0.shape[-1] == diff.cfg.latent_dim, \
            "diffusion latent_dim must follow the first-stage cut_ratio"
        dparams = diff.init(jax.random.key(3), grid)
        loss, _ = diff.p_losses(dparams, jax.random.key(4), grid, z0)
        assert np.isfinite(float(loss))
        z = diff.ddim_sample(dparams, jax.random.key(5), grid, steps=2)
        assert z.shape == z0.shape

    def test_r2dm_family(self):
        cfg = load_yaml(os.path.join(HERE, "configs/r2dm/r2dm_diffusion.yaml"))
        p = cfg["model"]["params"]
        p["timesteps"] = 32
        p["image_size"] = [8, 32]
        p["unet_config"]["params"].update(base_channels=8,
                                          channel_multiplier=[1, 2],
                                          num_residual_blocks=[1, 1],
                                          resolution=[8, 32])
        model = instantiate_from_config(cfg["model"])
        x = jnp.zeros((2, 8, 32, 2))
        params = model.init(jax.random.key(0))
        loss, _ = model.p_losses(params, jax.random.key(1), x)
        assert np.isfinite(float(loss))

    def test_object_ae_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/autoencoder/nuscenes_objects/g2sd_32.yaml"))
        p = cfg["model"]["params"]
        p.update(embed_dim=32, n_embed=64, num_points=64)
        p["modelconfig"]["params"]["num_grids"] = 16  # lattice needs a square
        model = instantiate_from_config(cfg["model"])
        pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 3)),
                          jnp.float32)
        params = model.init(jax.random.key(0), pts)
        rec, qloss, _ = model.apply(params, pts)
        from lidar_layout_tpu.models.object_ae import object_ae_loss
        loss, _ = object_ae_loss(rec, pts, qloss)
        assert np.isfinite(float(loss))

    def test_dense_decoder_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/ours/nuscenes/dense_decoder/gaus_10cm.yaml"))
        p = cfg["model"]["params"]
        p["backbone"]["params"].update(
            enc_depths=[1, 1], enc_channels=[8, 16], enc_num_head=[2, 2],
            enc_patch_size=[32, 32], dec_depths=[1], dec_channels=[8],
            dec_num_head=[2], drop_path=0.0)
        p["head"]["params"]["feat_dim"] = 8
        p["backbone_out_channels"] = 8
        model = instantiate_from_config(cfg["model"])
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 5, (128, 3)), jnp.float32)
        feats = pts
        mask = jnp.ones(128, bool)
        params = model.init(jax.random.key(0), pts, feats, mask)
        out = model.apply(params, pts, feats, mask)
        assert all(np.isfinite(np.asarray(v)).all() for v in out.values())

    def test_ptv3_segmentor_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/ours/nuscenes/dense_decoder/ptv3.yaml"))
        p = cfg["model"]["params"]
        p["backbone"]["params"].update(
            in_channels=3, enc_depths=[1, 1], enc_channels=[8, 16],
            enc_num_head=[2, 2], enc_patch_size=[32, 32], dec_depths=[1],
            dec_channels=[8], dec_num_head=[2], drop_path=0.0)
        p["backbone_out_channels"] = 8
        model = instantiate_from_config(cfg["model"])
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 5, (128, 3)), jnp.float32)
        mask = jnp.ones(128, bool)
        params = model.init(jax.random.key(0), pts, pts, mask)
        logits = model.apply(params, pts, pts, mask)
        assert logits.shape == (128, 16)
        assert np.isfinite(np.asarray(logits)).all()

    def test_gaus_ae_family(self):
        cfg = load_yaml(os.path.join(
            HERE, "configs/autoencoder/nuscenes/autoencoder_c2_p4_gaus.yaml"))
        p = cfg["model"]["params"]
        p["ddconfig"] = shrink_ae(p["ddconfig"])
        model = instantiate_from_config(cfg["model"])
        x = jnp.zeros((1, 16, 64, 1))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert len(out) >= 3  # dec, qloss, ind (+ gaussians)


def test_apply_dotlist_overrides():
    """CLI dotlist merge (main.py:537-539): typed YAML values, deep paths."""
    from lidar_layout_tpu.config import apply_dotlist

    cfg = {"model": {"base_learning_rate": 1e-4,
                     "params": {"timesteps": 64}}}
    apply_dotlist(cfg, ["model.base_learning_rate=2e-3",
                        "model.params.timesteps=128",
                        "model.params.channel_mult=[1,2,4]",
                        "data.params.batch_size=8",
                        "model.params.use_ema=true"])
    assert cfg["model"]["base_learning_rate"] == 2e-3
    assert cfg["model"]["params"]["timesteps"] == 128
    assert cfg["model"]["params"]["channel_mult"] == [1, 2, 4]
    assert cfg["data"]["params"]["batch_size"] == 8  # created path
    assert cfg["model"]["params"]["use_ema"] is True

    import pytest
    with pytest.raises(ValueError):
        apply_dotlist(cfg, ["notakeyvalue"])
