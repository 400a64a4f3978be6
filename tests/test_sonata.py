"""Sonata-v1m1 self-distillation pretraining
(reference pointcept/models/sonata/sonata_v1m1_base.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.models.ptv3 import PTv3Config
from lidar_layout_tpu.models.sonata import (Sonata, SonataConfig, ball_mask,
                                            OnlineCluster)

pytestmark = pytest.mark.slow  # model-scale file (see pytest.ini tiers)

BB = PTv3Config(in_channels=4, patch_size=16,
                enc_depths=(1, 1), enc_channels=(8, 16), enc_heads=(2, 2),
                dec_depths=(1,), dec_channels=(8,), dec_heads=(2,),
                orders=("z", "hilbert"), grid_size=0.2)
CFG = SonataConfig(head_in_channels=8, head_hidden_channels=16,
                   head_embed_channels=8, head_num_prototypes=32,
                   total_steps=100)


def _cloud(rng, n=128, valid=110):
    coord = rng.uniform(0.0, 6.0, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    mask = np.arange(n) < valid
    return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask)


def test_online_cluster_prototypes_on_sphere():
    oc = OnlineCluster(hidden=16, embed=8, num_prototypes=32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 8)),
                    jnp.float32)
    p = oc.init(jax.random.key(0), x)
    sim = oc.apply(p, x)
    assert sim.shape == (10, 32)
    # rows are cosine similarities: |sim| <= 1 given L2-normed both sides
    assert float(jnp.abs(sim).max()) <= 1.0 + 1e-5


def test_ball_mask_ratio_tracks_target():
    rng = np.random.default_rng(1)
    coord = jnp.asarray(rng.uniform(0, 4, (256, 3)).astype(np.float32))
    mask = jnp.ones(256, bool)
    m = ball_mask(jax.random.key(0), coord, mask, jnp.asarray(1.0),
                  jnp.asarray(0.5))
    frac = float(m.sum() / mask.sum())
    assert 0.2 < frac < 0.8  # coarse: prefix-accepted seeds approximate it
    assert not bool(m[~np.asarray(mask)].any()) if (~np.asarray(mask)).any() \
        else True


class TestPretraining:
    def test_student_fits_a_frozen_teacher(self):
        # With teacher + center FROZEN the distillation target is stationary
        # and the student must converge on it. (The full step's loss is
        # legitimately non-monotonic: the teacher EMA and prototype centering
        # move the target every step — DINO dynamics.)
        coord, feat, mask = _cloud(np.random.default_rng(2))
        model = Sonata(BB, CFG)
        state = model.init(jax.random.key(0), coord, feat, mask)
        # decorrelate the towers so the initial loss is not already minimal
        state["teacher"] = model.net.init(jax.random.key(7), coord, feat,
                                          mask)
        tx = optax.adam(1e-3)
        opt = tx.init(state["student"])

        def loss_fn(student):
            st = {**state, "student": student}
            return model.loss(st, jax.random.key(10), coord, feat, mask,
                              jnp.asarray(0))[0]

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        losses = []
        student = state["student"]
        for i in range(12):
            loss, g = grad_fn(student)
            up, opt = tx.update(g, opt, student)
            student = optax.apply_updates(student, up)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_full_step_dynamics(self):
        coord, feat, mask = _cloud(np.random.default_rng(3))
        model = Sonata(BB, CFG)
        state = model.init(jax.random.key(0), coord, feat, mask)
        tx = optax.adam(3e-4)
        opt = tx.init(state["student"])
        step_fn = model.make_pretrain_step(tx)
        t0 = jax.tree_util.tree_leaves(state["teacher"])[0].copy()
        for i in range(3):
            state, opt, loss = step_fn(state, opt, jax.random.key(10 + i),
                                       coord, feat, mask, jnp.asarray(i))
            assert np.isfinite(float(loss))
        t1 = jax.tree_util.tree_leaves(state["teacher"])[0]
        assert float(jnp.abs(t1 - t0).max()) > 0   # teacher EMA moved
        assert float(jnp.abs(state["center"]).max()) > 0  # centering live
