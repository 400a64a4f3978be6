"""Perceptual loss + noisy-latent classifier tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.losses.perceptual import make_perceptual_fn
from lidar_layout_tpu.models.classifier import (ClassifierConfig,
                                                NoisyLatentClassifier)
from lidar_layout_tpu.ops.lidar import LidarGeometry

GEOM = LidarGeometry(size=(32, 64))


class TestPerceptual:
    def test_zero_for_identical_and_orders(self, rng):
        fn = make_perceptual_fn(GEOM)
        x = jnp.asarray(np.clip(rng.standard_normal((1, 32, 64, 1)), -1, 1),
                        jnp.float32)
        assert float(fn(x, x)) == pytest.approx(0.0, abs=1e-5)
        near = x + 0.01
        far = jnp.asarray(np.clip(rng.standard_normal((1, 32, 64, 1)), -1, 1),
                          jnp.float32)
        assert float(fn(x, near)) < float(fn(x, far))

    def test_gradient_reaches_recon_only(self, rng):
        fn = make_perceptual_fn(GEOM)
        x = jnp.asarray(np.clip(rng.standard_normal((1, 32, 64, 1)), -1, 1),
                        jnp.float32)
        g = jax.grad(lambda r: fn(x, r))(x * 0.5)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestClassifier:
    def test_trains_to_separate_classes(self, rng):
        import optax
        cfg = ClassifierConfig(in_channels=4, model_channels=16, num_classes=2,
                               channel_mult=(1, 2), timesteps=32)
        clf = NoisyLatentClassifier(cfg)
        params = clf.init(jax.random.key(0), (8, 16, 4))
        # two separable classes: constant-sign latents
        z = jnp.concatenate([jnp.ones((4, 8, 16, 4)), -jnp.ones((4, 8, 16, 4))])
        y = jnp.asarray([0] * 4 + [1] * 4)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, k):
            (l, logs), g = jax.value_and_grad(clf.loss, has_aux=True)(p, k, z, y)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, logs

        for i in range(40):
            params, opt, logs = step(params, opt, jax.random.key(i))
        assert float(logs["acc"]) > 0.7

    def test_guidance_grad_shape(self, rng):
        cfg = ClassifierConfig(in_channels=4, model_channels=16, num_classes=2,
                               channel_mult=(1, 2), timesteps=32)
        clf = NoisyLatentClassifier(cfg)
        params = clf.init(jax.random.key(0), (8, 16, 4))
        z = jnp.zeros((2, 8, 16, 4))
        t = jnp.asarray([5, 10])
        g = clf.guidance_grad(params, z, t, jnp.asarray([0, 1]))
        assert g.shape == z.shape
