"""Training-step and sampler tests: loss decreases, samplers run, DP sharding works."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.losses.geometric import GeoConverter
from lidar_layout_tpu.losses.vq_loss import VQLossConfig
from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
from lidar_layout_tpu.models.autoencoder import AEConfig, VQModel
from lidar_layout_tpu.models.diffusion import DiffusionConfig, LatentDiffusion
from lidar_layout_tpu.models.samplers import (ddim_sample, ddpm_sample,
                                              dpm_solver_sample, plms_sample)
from lidar_layout_tpu.models.unet import UNetConfig
from lidar_layout_tpu.ops.lidar import LidarGeometry
from lidar_layout_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                               make_ae_optimizers,
                                               make_ae_train_step)
from lidar_layout_tpu.train.diffusion_trainer import (create_train_state,

                                                      make_optimizer,
                                                      make_train_step)

pytestmark = pytest.mark.slow  # heavy e2e/kernel file; default run skips (pytest.ini), CI/--runslow includes

GEOM = LidarGeometry(size=(16, 64))
UNET_CFG = UNetConfig(in_channels=2, model_channels=32, out_channels=2,
                      num_res_blocks=1, attention_resolutions=(2,),
                      channel_mult=(1, 2), num_head_channels=8)
DIFF_CFG = DiffusionConfig(timesteps=64, latent_shape=(8, 16, 2))


def _pixel_diffusion():
    return LatentDiffusion(DIFF_CFG, UNET_CFG, first_stage_cfg=None)


class TestDiffusionTraining:
    def test_loss_decreases(self):
        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)

        rng = np.random.default_rng(0)
        batch = {"image": jnp.asarray(
            rng.standard_normal((4, 8, 16, 2)), jnp.float32)}
        losses = []
        key = jax.random.key(1)
        for i in range(30):
            key, sub = jax.random.split(key)
            state, logs = step(state, batch, sub)
            losses.append(float(logs["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert int(state.step) == 30
        assert np.isfinite(losses).all()

    def test_ema_tracks(self):
        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        batch = {"image": jnp.ones((2, 8, 16, 2))}
        state2, _ = step(state, batch, jax.random.key(2))
        # ema moved toward the new params but is not equal to them
        diffs = jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()),
                             state2.ema.params, {"unet": state2.params["unet"]})
        assert max(jax.tree.leaves(diffs)) > 0

    def test_data_parallel_step_matches_single(self):
        """Same batch, 8-device dp mesh vs single device: identical loss."""
        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        batch = {"image": jnp.asarray(
            np.random.default_rng(3).standard_normal((8, 8, 16, 2)), jnp.float32)}
        key = jax.random.key(4)

        _, logs_single = step(state, batch, key)

        mesh = make_mesh()
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        _, logs_dp = step(state_r, batch_s, key)
        assert float(logs_dp["loss"]) == pytest.approx(
            float(logs_single["loss"]), rel=1e-5)


class TestSamplers:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        return model, params

    def test_ddim_shapes_finite(self, model_and_params):
        model, params = model_and_params
        out = ddim_sample(model, params, jax.random.key(1), (2, 8, 16, 2),
                          steps=8)
        assert out.shape == (2, 8, 16, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_deterministic_eta0(self, model_and_params):
        model, params = model_and_params
        a = ddim_sample(model, params, jax.random.key(5), (1, 8, 16, 2), steps=8)
        b = ddim_sample(model, params, jax.random.key(5), (1, 8, 16, 2), steps=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ddpm_ancestral(self, model_and_params):
        model, params = model_and_params
        out = ddpm_sample(model, params, jax.random.key(2), (1, 8, 16, 2))
        assert np.isfinite(np.asarray(out)).all()

    def test_plms(self, model_and_params):
        model, params = model_and_params
        out = plms_sample(model, params, jax.random.key(3), (1, 8, 16, 2), steps=8)
        assert out.shape == (1, 8, 16, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_dpm_solver_shapes_finite_deterministic(self, model_and_params):
        model, params = model_and_params
        a = dpm_solver_sample(model, params, jax.random.key(7), (2, 8, 16, 2),
                              steps=8)
        b = dpm_solver_sample(model, params, jax.random.key(7), (2, 8, 16, 2),
                              steps=8)
        assert a.shape == (2, 8, 16, 2)
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @staticmethod
    def _lambda_linear_mock(model, c0, c1):
        """Mock whose x0-prediction is c0 + c1*lambda(t): the probability-flow
        ODE then has the closed form (variation of constants)
          z(lam1) = sigma1 * (z0/sigma0 + F(lam1) - F(lam0)),
          F(lam)  = e^lam * (c0 + c1*(lam - 1)),
        so solver error can be measured against the exact solution on the
        solver's OWN timestep grid (no t_max-reinterpretation confound)."""
        sched = model.schedule
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        alpha_np, sigma_np = np.sqrt(acp), np.sqrt(1.0 - acp)
        lam_np = 0.5 * np.log(acp / (1.0 - acp))
        alpha = jnp.asarray(alpha_np, jnp.float32)
        sigma = jnp.asarray(sigma_np, jnp.float32)
        lam = jnp.asarray(lam_np, jnp.float32)

        class _Mock:
            schedule = sched
            cfg = model.cfg

            def apply_model(self, params, x, t, cond):
                a = alpha[t][:, None, None, None]
                s = sigma[t][:, None, None, None]
                x0p = c0 + c1 * lam[t][:, None, None, None]
                return (x - a * x0p) / s

            def eps_from_model_out(self, img, t, out):
                return out

        def analytic_final(z_init, t_start):
            def big_f(l):
                return np.exp(l) * (c0 + c1 * (l - 1.0))
            l0, l1 = lam_np[t_start], lam_np[0]
            return sigma_np[0] * (np.asarray(z_init, np.float64)
                                  / sigma_np[t_start]
                                  + big_f(l1) - big_f(l0))

        return _Mock(), analytic_final

    def _solver_errors(self, model, c0, c1, steps, key=11):
        from lidar_layout_tpu.models.schedules import DDIMSchedule
        mock, analytic_final = self._lambda_linear_mock(model, c0, c1)
        t_start = int(DDIMSchedule.create(model.schedule, steps)
                      .timesteps[-1])
        _, r_init = jax.random.split(jax.random.key(key))
        z_init = jax.random.normal(r_init, (1, 8, 16, 2), jnp.float32)
        exact = analytic_final(z_init, t_start)
        fast = dpm_solver_sample(mock, None, jax.random.key(key),
                                 (1, 8, 16, 2), steps=steps)
        base = ddim_sample(mock, None, jax.random.key(key), (1, 8, 16, 2),
                           steps=steps)
        err = lambda x: float(np.abs(np.asarray(x, np.float64) - exact).mean())
        return err(fast), err(base)

    def test_dpm_solver_exact_for_constant_x0(self, model_and_params):
        """Constant x0-prediction makes the ODE linear with constant drive;
        both DDIM(eta=0) and DPM-Solver++ integrate it exactly — so a 10-step
        run must hit the analytic solution to float32 accuracy."""
        model, _ = model_and_params
        err_dpm, err_ddim = self._solver_errors(model, c0=0.37, c1=0.0,
                                                steps=10)
        assert err_dpm < 1e-4
        assert err_ddim < 1e-4

    def test_dpm_solver_beats_ddim_at_equal_steps(self, model_and_params):
        """With an x0-prediction that varies along the trajectory (linear in
        lambda), first-order DDIM has O(h^2) local error while the 2M
        multistep is exact for linear-in-lambda — 8-step DPM must land much
        closer to the analytic solution."""
        model, _ = model_and_params
        err_dpm, err_ddim = self._solver_errors(model, c0=0.3, c1=0.2,
                                                steps=8)
        assert err_dpm < 0.3 * err_ddim, (err_dpm, err_ddim)

    def test_ddim_inpainting_keeps_masked_region(self, model_and_params):
        model, params = model_and_params
        x0 = jnp.zeros((1, 8, 16, 2))
        mask = jnp.ones((1, 8, 16, 2))  # keep everything on the forward traj
        out = ddim_sample(model, params, jax.random.key(6), (1, 8, 16, 2),
                          steps=8, mask=mask, x0=x0)
        # with mask=1 everywhere, output = x0 trajectory end (approx x0 at t->0)
        assert float(jnp.abs(out).mean()) < 1.0


class TestAETraining:
    def test_ae_adversarial_step(self):
        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                          out_ch=2, num_res_blocks=1)
        model = VQModel(ae_cfg, n_embed=64, embed_dim=4, use_mask=True)
        disc = LiDARNLayerDiscriminator(ndf=16, n_layers=2)
        loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0, disc_start=10**9,
                                disc_gate="until", curve_length=1)
        geo = GeoConverter(GEOM, curve_length=1)
        tx_g, tx_d = make_ae_optimizers(1e-3, 1e-3)
        state = create_ae_state(model, disc, jax.random.key(0), (16, 64, 1),
                                tx_g, tx_d, loss_cfg, geo)
        step = make_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d)

        rng = np.random.default_rng(0)
        img = np.clip(rng.standard_normal((2, 16, 64, 1)) * 0.3, -1, 1)
        batch = {"image": jnp.asarray(img, jnp.float32),
                 "mask": jnp.ones((2, 16, 64, 1))}
        losses = []
        for i in range(10):
            state, logs = step(state, batch, jax.random.key(i))
            losses.append(float(logs["rec_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # reconstruction improves
        assert float(logs["d_weight"]) >= 0


class TestCFGSampling:
    def test_cfg_path_runs_and_differs(self):
        """Classifier-free guidance: doubled-batch eval, scale changes output."""
        from lidar_layout_tpu.encoders.modules import ClassEmbedder
        from lidar_layout_tpu.models.unet import UNetConfig

        cfg = DiffusionConfig(timesteps=32, latent_shape=(8, 16, 2),
                              conditioning_key="crossattn")
        ucfg = UNetConfig(in_channels=2, model_channels=32, out_channels=2,
                          num_res_blocks=1, attention_resolutions=(1,),
                          channel_mult=(1, 2), num_head_channels=8,
                          use_spatial_transformer=True, context_dim=16)

        class TokenCond(ClassEmbedder):
            pass

        cond_stage = TokenCond(embed_dim=16, n_classes=4)
        model = LatentDiffusion(cfg, ucfg, first_stage_cfg=None,
                                cond_stage=cond_stage)
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2),
                            cond_example=jnp.asarray([[1, 2]]))

        c = model.get_learned_conditioning(params, jnp.asarray([[1, 2]]))
        uc = model.get_learned_conditioning(params, jnp.asarray([[0, 0]]))
        kwargs = dict(steps=4, cond={"c_crossattn": c},
                      uncond={"c_crossattn": uc})
        a = ddim_sample(model, params, jax.random.key(1), (1, 8, 16, 2),
                        cfg_scale=1.0, **kwargs)
        b = ddim_sample(model, params, jax.random.key(1), (1, 8, 16, 2),
                        cfg_scale=5.0, **kwargs)
        assert np.isfinite(np.asarray(a)).all()
        assert np.isfinite(np.asarray(b)).all()


class TestChunkedTraining:
    """Scan-chunked drivers: K optimizer steps per dispatch must match K
    sequential single-dispatch steps bit-for-bit given the same rng scheme."""

    def test_chunked_diffusion_matches_sequential(self):
        from lidar_layout_tpu.train.diffusion_trainer import (
            make_chunked_train_step)

        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)

        pool = jnp.asarray(
            np.random.default_rng(0).standard_normal((16, 8, 16, 2)),
            jnp.float32)

        def batch_fn(rng):
            idx = jax.random.randint(rng, (4,), 0, pool.shape[0])
            return {"image": jnp.take(pool, idx, axis=0)}

        k = 3
        rng = jax.random.key(7)

        # sequential reference: replicate chunk_steps' rng derivation
        state_a = create_train_state(model, params, tx)
        step = make_train_step(model, tx)
        for i in range(k):
            r = jax.random.fold_in(rng, i)
            r_batch, r_step = jax.random.split(r)
            state_a, logs_a = step(state_a, batch_fn(r_batch), r_step)

        state_b = create_train_state(model, params, tx)
        chunked = make_chunked_train_step(model, tx, batch_fn, k,
                                          donate=False)
        state_b, logs_b = chunked(state_b, rng)

        assert int(state_b.step) == k
        np.testing.assert_allclose(float(logs_b["loss"]),
                                   float(logs_a["loss"]), rtol=1e-5)
        da = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state_a.params["unet"], state_b.params["unet"]))
        assert max(da) < 1e-5

    def test_chunked_data_arg_matches_closure(self):
        """Pools passed via the jit ``data`` argument must be bit-identical
        to the closed-over-pool path (the data arg exists because closures
        bake the pool into the HLO as a literal constant — PERF.md pitfall 6,
        HTTP 413 on remote compile for >~0.5 GB pools)."""
        from lidar_layout_tpu.train.diffusion_trainer import (
            make_chunked_train_step)

        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)
        pool = jnp.asarray(
            np.random.default_rng(0).standard_normal((16, 8, 16, 2)),
            jnp.float32)

        def batch_closure(rng):
            idx = jax.random.randint(rng, (4,), 0, pool.shape[0])
            return {"image": jnp.take(pool, idx, axis=0)}

        def batch_data(rng, data):
            idx = jax.random.randint(rng, (4,), 0, data.shape[0])
            return {"image": jnp.take(data, idx, axis=0)}

        rng = jax.random.key(7)
        state_a = create_train_state(model, params, tx)
        state_a, logs_a = make_chunked_train_step(
            model, tx, batch_closure, 3)(state_a, rng)
        state_b = create_train_state(model, params, tx)
        state_b, logs_b = make_chunked_train_step(
            model, tx, batch_data, 3)(state_b, rng, pool)

        assert float(logs_a["loss"]) == float(logs_b["loss"])
        da = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state_a.params["unet"], state_b.params["unet"]))
        assert max(da) == 0.0

    def test_chunked_step_on_dp_mesh_matches_single(self):
        """The production multi-chip path: scan-chunked training with the
        state replicated over the 8-device dp mesh and the device-resident
        pool sharded — same loss as the unsharded run (batches are built
        on-device from the same rng stream)."""
        from lidar_layout_tpu.train.diffusion_trainer import (
            make_chunked_train_step)

        model = _pixel_diffusion()
        params = model.init(jax.random.key(0), image_shape=(8, 16, 2))
        tx = make_optimizer(1e-3)
        pool = jnp.asarray(
            np.random.default_rng(0).standard_normal((16, 8, 16, 2)),
            jnp.float32)

        def batch_fn(rng, data):
            idx = jax.random.randint(rng, (8,), 0, data.shape[0])
            return {"image": jnp.take(data, idx, axis=0)}

        rng = jax.random.key(7)
        step = make_chunked_train_step(model, tx, batch_fn, 2)

        state_a = create_train_state(model, params, tx)
        _, logs_single = step(state_a, rng, pool)

        mesh = make_mesh()
        state_b = replicate(create_train_state(model, params, tx), mesh)
        pool_r = replicate({"pool": pool}, mesh)["pool"]
        _, logs_dp = step(state_b, rng, pool_r)
        assert float(logs_dp["loss"]) == pytest.approx(
            float(logs_single["loss"]), rel=1e-5)

    def test_chunked_ae_step_runs(self):
        from lidar_layout_tpu.train.ae_trainer import (
            make_chunked_ae_train_step)

        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),),
                          z_channels=4, out_ch=2, num_res_blocks=1)
        model = VQModel(ae_cfg, n_embed=64, embed_dim=4, use_mask=True)
        disc = LiDARNLayerDiscriminator(ndf=16, n_layers=2)
        loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0,
                                disc_start=10**9, disc_gate="until",
                                curve_length=1)
        geo = GeoConverter(GEOM, curve_length=1)
        tx_g, tx_d = make_ae_optimizers(1e-3, 1e-3)
        state = create_ae_state(model, disc, jax.random.key(0), (16, 64, 1),
                                tx_g, tx_d, loss_cfg, geo)

        img = jnp.asarray(np.clip(
            np.random.default_rng(0).standard_normal((8, 16, 64, 1)) * 0.3,
            -1, 1), jnp.float32)

        def batch_fn(rng):
            idx = jax.random.randint(rng, (2,), 0, img.shape[0])
            return {"image": jnp.take(img, idx, axis=0),
                    "mask": jnp.ones((2, 16, 64, 1))}

        chunked = make_chunked_ae_train_step(model, disc, loss_cfg, geo,
                                             tx_g, tx_d, batch_fn, 4,
                                             donate=False)
        state, logs = chunked(state, jax.random.key(1))
        assert int(state.step) == 4
        assert np.isfinite(float(logs["rec_loss"]))
        assert np.isfinite(float(logs["disc_loss"]))


class TestConcatConditioning:
    def test_init_matches_apply_for_bare_concat(self):
        """conditioning_key='concat' with a bare-array cond-stage output
        (map2lidar: SpatialRescaler'd one-hot map): init must create the
        U-Net with in_channels = z + map channels, exactly what apply_model
        concatenates (regression: init used to route the bare array to
        context, so the first conv was created 4 channels short)."""
        from lidar_layout_tpu.encoders.modules import SpatialRescaler
        from lidar_layout_tpu.models.unet import UNetConfig

        n_sem = 4
        cfg = DiffusionConfig(timesteps=32, latent_shape=(4, 8, 2),
                              conditioning_key="concat")
        ucfg = UNetConfig(in_channels=2 + n_sem, model_channels=16,
                          out_channels=2, num_res_blocks=1,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          num_head_channels=8)
        cond_stage = SpatialRescaler(n_stages=1, wh_factors=(0.25, 0.25))
        model = LatentDiffusion(cfg, ucfg, first_stage_cfg=None,
                                cond_stage=cond_stage)
        cond_ex = jnp.zeros((1, 16, 32, n_sem))
        params = model.init(jax.random.key(0), image_shape=(4, 8, 2),
                            cond_example=cond_ex)
        kernel = params["unet"]["params"]["conv_in"]["conv"]["kernel"]
        assert kernel.shape[2] == 2 + n_sem

        c = model.get_learned_conditioning(params, jnp.ones((3, 16, 32, n_sem)))
        z = jnp.zeros((3, 4, 8, 2))
        t = jnp.zeros((3,), jnp.int32)
        out = model.apply_model(params, z, t, c)
        assert out.shape == z.shape
        assert np.isfinite(np.asarray(out)).all()

        # a training step runs through batch['cond']
        loss, _ = model.training_loss(
            params, jax.random.key(1),
            {"image": jnp.zeros((2, 4, 8, 2)),
             "cond": jnp.ones((2, 16, 32, n_sem))})
        assert np.isfinite(float(loss))
