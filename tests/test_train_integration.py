"""Integration-parity features from VERDICT r1 #6/#10: split-input fold/unfold
wired into LatentDiffusion, scale_by_std calibration, validation loop +
monitored top-k checkpointing, LR schedule, and gradient accumulation.

Reference: ddpm.py:540-553 (scale_by_std), :608-658/911-992 (split input),
:882-895 (validation_step), main.py:596-617 (ModelCheckpoint), :712-722
(accumulate_grad_batches + LambdaLR).
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.autoencoder import AEConfig
from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                               LatentDiffusion,
                                               apply_scale_by_std)
from lidar_layout_tpu.models.unet import UNetConfig
from lidar_layout_tpu.ops.foldunfold import patched_apply_scaled

pytestmark = pytest.mark.slow  # heavy e2e/kernel file; default run skips (pytest.ini), CI/--runslow includes


TINY_AE = AEConfig(ch=16, ch_mult=(1, 2, 2, 4),
                   strides=((1, 2), (2, 2), (2, 2)), z_channels=8, out_ch=2,
                   num_res_blocks=1)
TINY_UNET = UNetConfig(in_channels=8, model_channels=32, out_channels=8,
                       num_res_blocks=1, attention_resolutions=(2,),
                       channel_mult=(1, 2), num_head_channels=8)


def _tiny_model(**cfg_kw):
    cfg = DiffusionConfig(timesteps=32, latent_shape=(4, 16, 8), **cfg_kw)
    model = LatentDiffusion(cfg, TINY_UNET, first_stage_cfg=TINY_AE,
                            n_embed=128, embed_dim=8, use_mask=True)
    params = model.init(jax.random.key(0), image_shape=(16, 128, 1))
    return model, params


class TestSplitInput:
    def test_patched_apply_scaled_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 32, 3)),
                        jnp.float32)
        out = patched_apply_scaled(lambda t: t, x, (8, 16), (8, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_patched_apply_scaled_downsample(self):
        # fn = 2x2 mean-pool: canvas is half size, values match direct pooling
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 32, 2)),
                        jnp.float32)

        def pool(t):
            b, h, w, c = t.shape
            return t.reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))

        out = patched_apply_scaled(pool, x, (8, 16), (8, 8), scale=(0.5, 0.5))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pool(x)),
                                   atol=1e-5)

    def test_apply_model_patched_matches_plain_on_wide_latent(self):
        """The denoiser patched over a 2x-wide latent must run and agree with
        the plain U-Net on the patch interiors (borders are blended)."""
        model, params = _tiny_model(split_ks=(4, 16), split_stride=(4, 8))
        z = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 32, 8)),
                        jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        out = model.apply_model(params, z, t)
        assert out.shape == z.shape
        assert np.isfinite(np.asarray(out)).all()
        # training-size latents take the plain path (no patching)
        z0 = z[:, :, :16]
        plain = model.apply_model(params, z0, t)
        assert plain.shape == z0.shape

    def test_encode_decode_patched_shapes(self):
        model, params = _tiny_model(split_ks=(4, 16), split_stride=(4, 8))
        x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 16, 256, 1)),
                        jnp.float32)  # 2x wider than the 128-wide train size
        z = model.encode_first_stage(params, x)
        assert z.shape == (1, 4, 32, 8)
        dec = model.decode_first_stage(params, z)
        # use_mask=True decode applies raydrop -> 1 channel (autoencoder.py
        # apply_raydrop), same as the plain path
        assert dec.shape == (1, 16, 256, 1)
        assert np.isfinite(np.asarray(dec)).all()


class TestScaleByStd:
    def test_calibration_sets_factor(self):
        model, params = _tiny_model(scale_by_std=True)
        assert model.cfg.scale_factor == 1.0
        x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16, 128, 1)),
                        jnp.float32)
        s = apply_scale_by_std(model, params, x)
        assert model.cfg.scale_factor == s and s != 1.0
        z = model.encode_first_stage(params, x)
        # after calibration the latents are ~unit std
        assert abs(float(jnp.std(z)) - 1.0) < 0.2
        # second call is a no-op (only calibrates from the default 1.0)
        assert apply_scale_by_std(model, params, x) == s


class TestValidationAndBestCkpt:
    def test_val_hook_and_topk(self, tmp_path):
        from lidar_layout_tpu.train.trainer import (BestCheckpointSaver,
                                                    Trainer, ValidationHook)

        def step_fn(state, batch, rng):
            return {"w": state["w"] - 0.1}, {"loss": jnp.asarray(1.0)}

        def val_fn(state, batch, rng):
            return {"loss_simple": jnp.abs(state["w"]).sum()}

        def batches():
            while True:
                yield {"x": np.zeros(1, np.float32)}

        val_batch = [{"x": np.zeros(1, np.float32)}]
        tr = Trainer(step_fn, {"w": jnp.ones(2)}, batches(),
                     workdir=str(tmp_path), max_steps=6,
                     hooks=[ValidationHook(val_fn, lambda: iter(val_batch),
                                           every_steps=2),
                            BestCheckpointSaver(monitor="val/loss_simple",
                                                top_k=2)])
        tr.train()
        best_dir = os.path.join(str(tmp_path), "ckpt_best")
        steps = sorted(int(d) for d in os.listdir(best_dir) if d.isdigit())
        assert len(steps) <= 2 and steps  # top-k retention
        assert steps[-1] == 6  # loss decreases => the last step is among best

    def test_val_metrics_logged(self, tmp_path):
        from lidar_layout_tpu.train.trainer import (InformationWriter,
                                                    Trainer, ValidationHook)

        def step_fn(state, batch, rng):
            return state, {"loss": jnp.asarray(0.5)}

        def val_fn(state, batch, rng):
            return {"loss_simple_ema": jnp.asarray(0.25)}

        def batches():
            while True:
                yield {}

        tr = Trainer(step_fn, {}, batches(), workdir=str(tmp_path),
                     max_steps=4,
                     hooks=[ValidationHook(val_fn, lambda: iter([{}]),
                                           every_steps=2),
                            InformationWriter(log_every=1)])
        tr.train()
        lines = [json.loads(l) for l in
                 open(os.path.join(str(tmp_path), "metrics.jsonl"))]
        assert any("val/loss_simple_ema" in l for l in lines)


class TestGradAccumulation:
    def test_multisteps_updates_every_k(self):
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, make_train_step)

        model, params = _tiny_model()
        tx = make_optimizer(1e-3, accumulate=2)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        batch = {"image": jnp.zeros((2, 16, 128, 1)) + 0.1}
        p0 = state.params["unet"]
        state, _ = step(state, batch, jax.random.key(0))
        # first micro-step: gradients accumulated, params unchanged
        d1 = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p0,
                         state.params["unet"]))
        assert d1 == 0.0
        state, _ = step(state, batch, jax.random.key(1))
        d2 = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p0,
                         state.params["unet"]))
        assert d2 > 0.0

    def test_schedule_traceable(self):
        from lidar_layout_tpu.train.lr_schedule import \
            lambda_warmup_cosine_optax

        sched = lambda_warmup_cosine_optax(1e-4, warm_up_steps=10, lr_min=0.1,
                                           lr_max=1.0, lr_start=0.01,
                                           max_decay_steps=100)
        lrs = jax.jit(jax.vmap(sched))(jnp.arange(120))
        lrs = np.asarray(lrs)
        assert lrs[0] == pytest.approx(1e-4 * 0.01)
        assert lrs[10] == pytest.approx(1e-4 * 1.0)
        assert lrs[-1] == pytest.approx(1e-4 * 0.1, rel=1e-3)
        assert (np.diff(lrs[:10]) > 0).all()       # warmup rises
        assert (np.diff(lrs[11:100]) <= 1e-12).all()  # cosine decays


class TestLogImages:
    def test_full_suite_shapes(self):
        from lidar_layout_tpu.train.sample_logger import lidm_log_images

        model, params = _tiny_model()
        batch = {"image": np.random.default_rng(0).normal(
            size=(2, 16, 128, 1)).astype(np.float32) * 0.1}
        out = lidm_log_images(model, params, batch, jax.random.key(0),
                              n_row=2, sample_steps=4)
        for key in ("inputs", "reconstruction", "diffusion_row", "samples",
                    "samples_inpainting", "samples_outpainting"):
            assert key in out, key
            assert np.isfinite(np.asarray(out[key])).all(), key
        assert out["samples"].shape == (2, 16, 128, 1)
        assert out["diffusion_row"].shape[1] == 4 * 16  # 4 stacked rows


class TestTrainScriptSmoke:
    def test_train_lidm_tiny_config(self, tmp_path):
        """Drive the full script path: val loop + best ckpt + sample logger."""
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.join(root, "scripts", "train_lidm.py"),
             "-b", os.path.join(root, "configs", "tests", "tiny_uncond.yaml"),
             "-t", "--synthetic", "--cpu", "--steps", "4",
             "--workdir", str(tmp_path)],
            capture_output=True, text=True, env=env, timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert os.path.isdir(os.path.join(str(tmp_path), "ckpt_best"))
        lines = [json.loads(l) for l in
                 open(os.path.join(str(tmp_path), "metrics.jsonl"))]
        assert any("val/loss_simple_ema" in l for l in lines)


class TestMelkAndFirstStageInjection:
    def test_melk_on_exception(self, tmp_path):
        """Any training exception saves ckpt_interrupt before re-raising
        (main.py:729-754 melk)."""
        from lidar_layout_tpu.train.trainer import Trainer

        def step_fn(state, batch, rng):
            if batch["i"] >= 2:
                raise RuntimeError("boom")
            return state, {"loss": jnp.asarray(1.0)}

        def batches():
            i = 0
            while True:
                yield {"i": i}
                i += 1

        tr = Trainer(step_fn, {"w": jnp.ones(2)}, batches(),
                     workdir=str(tmp_path), max_steps=10, hooks=[])
        with pytest.raises(RuntimeError):
            tr.train()
        assert os.path.isdir(os.path.join(str(tmp_path), "ckpt_interrupt"))

    def test_sigusr1_saves_and_continues(self, tmp_path):
        """SIGUSR1 mid-run checkpoints without stopping training."""
        import signal

        from lidar_layout_tpu.train.trainer import Trainer

        def step_fn(state, batch, rng):
            if batch["i"] == 2:
                os.kill(os.getpid(), signal.SIGUSR1)
            return state, {"loss": jnp.asarray(1.0)}

        def batches():
            i = 0
            while True:
                yield {"i": i}
                i += 1

        tr = Trainer(step_fn, {"w": jnp.ones(2)}, batches(),
                     workdir=str(tmp_path), max_steps=6, hooks=[])
        tr.train()
        assert tr.global_step == 6  # ran to completion
        assert os.path.isdir(os.path.join(str(tmp_path), "ckpt_interrupt"))

    def test_first_stage_ckpt_path_injection(self, tmp_path):
        """configs' first_stage_config.params.ckpt_path loads trained AE
        weights into params['first_stage'] (uncond_c2_p4.yaml:33)."""
        from lidar_layout_tpu.train.checkpoint import (load_first_stage_params,
                                                       save_checkpoint)

        model, params = _tiny_model()
        # fake "trained" AE: shift every param; save as an AE-run checkpoint
        trained_fs = jax.tree.map(lambda x: x + 1.0, params["first_stage"])

        class FakeAEState:  # mimics AETrainState field layout for StandardSave
            pass

        save_checkpoint(os.path.join(str(tmp_path), "ckpt"), 5,
                        {"params_g": trained_fs, "step": 5})
        loaded = load_first_stage_params(str(tmp_path),
                                         params["first_stage"])
        leaves0 = jax.tree_util.tree_leaves(trained_fs)
        leaves1 = jax.tree_util.tree_leaves(loaded)
        for a, b in zip(leaves0, leaves1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_first_stage_injection_rejects_mismatch(self, tmp_path):
        from lidar_layout_tpu.train.checkpoint import (load_first_stage_params,
                                                       save_checkpoint)

        model, params = _tiny_model()
        save_checkpoint(os.path.join(str(tmp_path), "ckpt"), 1,
                        {"params_g": {"not": {"matching": np.zeros(3)}}})
        with pytest.raises((ValueError, KeyError)):
            load_first_stage_params(str(tmp_path), params["first_stage"])


class TestPerceptualWiring:
    def test_perceptual_term_changes_ae_loss(self):
        """perceptual_factor>0 + perceptual_fn flows into the generator NLL
        (vqperceptual.py perceptual_weight path)."""
        import jax

        from lidar_layout_tpu.losses.geometric import GeoConverter
        from lidar_layout_tpu.losses.vq_loss import (VQLossConfig,
                                                     reconstruction_nll)
        from lidar_layout_tpu.ops.lidar import LidarGeometry

        geom = LidarGeometry(size=(16, 64), fov=(3, -25))
        geo = GeoConverter(geom, curve_length=1)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 64, 1)), jnp.float32)
        rec = jnp.asarray(rng.normal(size=(2, 16, 64, 2)), jnp.float32)
        mask = jnp.ones((2, 16, 64, 1), jnp.float32)

        stub = lambda a, b: jnp.mean((a - b) ** 2)
        cfg0 = VQLossConfig(mask_factor=1.0, geo_factor=0.0, curve_length=1)
        cfg1 = dataclasses.replace(cfg0, perceptual_factor=2.0)
        nll0, logs0 = reconstruction_nll(cfg0, geo, x, rec, mask,
                                         perceptual_fn=stub)
        nll1, logs1 = reconstruction_nll(cfg1, geo, x, rec, mask,
                                         perceptual_fn=stub)
        assert float(logs0["perceptual_loss"]) == 0.0
        assert float(logs1["perceptual_loss"]) > 0.0
        assert float(nll1) != float(nll0)
