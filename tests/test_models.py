"""Shape/finiteness/behavior tests for autoencoders, U-Net, schedules, samplers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.models.autoencoder import (AEConfig, AutoencoderKL,
                                                 VQModel, VQModelInterface,
                                                 apply_raydrop)
from lidar_layout_tpu.models.schedules import (DDIMSchedule, DiffusionSchedule,
                                               make_beta_schedule, q_sample)
from lidar_layout_tpu.models.unet import UNetConfig, UNetModel

# small configs for CPU testing
AE_CFG = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                  out_ch=2, num_res_blocks=1)
UNET_CFG = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                      num_res_blocks=1, attention_resolutions=(1,),
                      channel_mult=(1, 2), num_head_channels=8)


class TestSchedules:
    def test_linear_beta_schedule_golden(self):
        """Golden values from the reference formula (basic.py:149-151):
        betas = linspace(sqrt(b0), sqrt(b1), N)**2."""
        b = make_beta_schedule("linear", 1024, 0.0015, 0.0195)
        assert b[0] == pytest.approx(0.0015)
        assert b[-1] == pytest.approx(0.0195)
        mid = (np.sqrt(0.0015) + (np.sqrt(0.0195) - np.sqrt(0.0015)) * 511 / 1023) ** 2
        assert b[511] == pytest.approx(mid)

    def test_schedule_buffers_consistent(self):
        s = DiffusionSchedule.create(128, "linear", 0.0015, 0.0195)
        np.testing.assert_allclose(s.alphas_cumprod,
                                   np.cumprod(1 - s.betas), rtol=1e-12)
        assert s.lvlb_weights[0] == s.lvlb_weights[1]
        assert np.all(np.isfinite(s.lvlb_weights))
        # q_sample at t=0 is nearly the input
        x = jnp.ones((2, 4, 4, 1))
        noised = q_sample(s, x, jnp.zeros((2,), jnp.int32), jnp.zeros_like(x))
        np.testing.assert_allclose(np.asarray(noised), np.sqrt(1 - s.betas[0]),
                                   rtol=1e-6)

    def test_ddim_schedule_uniform(self):
        s = DiffusionSchedule.create(1024, "linear", 0.0015, 0.0195)
        d = DDIMSchedule.create(s, 50, eta=0.0)
        # reference quirk (basic.py:174-181): range(0, 1024, 1024//50) gives 52
        # entries; the reference's own shape assert is commented out
        assert len(d.timesteps) == 52
        assert d.timesteps[0] == 1
        np.testing.assert_allclose(d.sigmas, 0.0)
        # eta=1 reproduces the DDPM posterior sigma
        d1 = DDIMSchedule.create(s, 50, eta=1.0)
        assert np.all(d1.sigmas[1:] > 0)


class TestAutoencoder:
    @pytest.fixture(scope="class")
    def vq(self):
        m = VQModel(AE_CFG, n_embed=128, embed_dim=4, use_mask=True)
        x = jnp.zeros((2, 16, 64, 1))
        params = m.init(jax.random.key(0), x)
        return m, params

    def test_shapes(self, vq):
        m, params = vq
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64, 1)),
                        jnp.float32)
        dec, qloss, ind = m.apply(params, x)
        assert dec.shape == (2, 16, 64, 2)
        assert ind.shape == (2, 16, 32)
        assert np.isfinite(float(qloss))

    def test_raydrop_semantics(self):
        dec = jnp.asarray([[[[0.5, -1.0], [0.3, 1.0]]]])
        out = apply_raydrop(dec)
        np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], [-1.0, 0.3])

    def test_vq_straight_through_grads(self, vq):
        m, params = vq
        x = jnp.ones((1, 16, 64, 1))

        def loss(p):
            dec, qloss, _ = m.apply(p, x)
            return jnp.mean(dec**2) + qloss

        g = jax.grad(loss)(params)
        gnorm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
        assert gnorm > 0
        # encoder must receive gradient through the straight-through estimator
        enc_g = sum(float(jnp.abs(v).sum())
                    for v in jax.tree.leaves(g["params"]["encoder"]))
        assert enc_g > 0

    def test_kl_ae(self):
        cfg = AEConfig(ch=16, ch_mult=(1, 2), strides=((1, 2),), z_channels=4,
                       out_ch=1, num_res_blocks=1, double_z=True)
        m = AutoencoderKL(cfg, embed_dim=4)
        x = jnp.zeros((2, 16, 64, 1))
        params = m.init(jax.random.key(0), x, rng=jax.random.key(1))
        dec, post = m.apply(params, x, rng=jax.random.key(2))
        assert dec.shape == (2, 16, 64, 1)
        assert post.kl().shape == (2,)

    def test_circular_encoder_wraps(self):
        """Azimuth wrap-equivariance: rolling the input along W rolls the encoder
        latent. Holds exactly for the encoder path (circular convs + GroupNorm);
        the decoder's align_corners bilinear upsample is aperiodic (as in the
        reference), so the full AE is only approximately equivariant."""
        from lidar_layout_tpu.models.autoencoder import Encoder
        enc = Encoder(AE_CFG)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 64, 1)),
                        jnp.float32)
        params = enc.init(jax.random.key(0), x)
        z1 = enc.apply(params, x)
        shift = 8  # multiple of the total W-stride (2) -> latent shifts by 4
        z2 = enc.apply(params, jnp.roll(x, shift, axis=2))
        np.testing.assert_allclose(np.asarray(jnp.roll(z1, shift // 2, axis=2)),
                                   np.asarray(z2), rtol=1e-4, atol=1e-4)

    def test_circular_conv_exact_equivariance(self):
        from lidar_layout_tpu.nn.conv import CircularConv
        conv = CircularConv(4, (3, 3), (1, 1), (1, 1, 1, 1))
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 32, 2)),
                        jnp.float32)
        params = conv.init(jax.random.key(0), x)
        y1 = conv.apply(params, x)
        y2 = conv.apply(params, jnp.roll(x, 5, axis=2))
        np.testing.assert_allclose(np.asarray(jnp.roll(y1, 5, axis=2)),
                                   np.asarray(y2), rtol=1e-5, atol=1e-5)


def _perturb(params, scale=0.01, seed=42):
    """Nudge params off the zero-init point so residual branches are live."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    return jax.tree.unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])


class TestUNet:
    @pytest.fixture(scope="class")
    def unet(self):
        m = UNetModel(UNET_CFG)
        z = jnp.zeros((2, 8, 16, 4))
        t = jnp.zeros((2,), jnp.int32)
        params = m.init(jax.random.key(0), z, t)
        return m, params

    def test_output_shape(self, unet):
        m, params = unet
        z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 16, 4)),
                        jnp.float32)
        out = m.apply(params, z, jnp.asarray([0, 512]))
        assert out.shape == z.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_zero_init_identity(self, unet):
        """guided-diffusion zero_module parity: the U-Net outputs exactly 0 at
        init (zero-init out convs), so diffusion training starts stable."""
        m, params = unet
        z = jnp.ones((1, 8, 16, 4))
        assert float(jnp.abs(m.apply(params, z, jnp.asarray([1]))).max()) == 0.0

    def test_timestep_sensitivity(self, unet):
        m, params = unet
        params = _perturb(params)
        z = jnp.ones((1, 8, 16, 4))
        o1 = m.apply(params, z, jnp.asarray([1]))
        o2 = m.apply(params, z, jnp.asarray([1000]))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_cross_attention_variant(self):
        cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                         num_res_blocks=1, attention_resolutions=(1,),
                         channel_mult=(1, 2), num_head_channels=8,
                         use_spatial_transformer=True, context_dim=16)
        m = UNetModel(cfg)
        z = jnp.zeros((2, 8, 16, 4))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, 5, 16))
        params = m.init(jax.random.key(0), z, t, context=ctx)
        out = m.apply(params, z, t, context=ctx)
        assert out.shape == z.shape
        # conditioning must influence the output (off the zero-init point)
        params = _perturb(params)
        out = m.apply(params, z, t, context=ctx)
        ctx2 = jnp.ones((2, 5, 16))
        out2 = m.apply(params, z, t, context=ctx2)
        assert float(jnp.abs(out - out2).max()) > 1e-8
