"""Samplers: DDPM ancestral, DDIM, PLMS, DPM-Solver++(2M) — each one compiled
``lax.scan`` loop.

Parity: ``lidm/models/diffusion/ddim.py:13-206`` (DDIM with eta/CFG/mask
inpainting), ``plms.py:11-236`` (PLMS multistep), ``ddpm.py:255-269``
(ancestral p_sample_loop). DPM-Solver++ is beyond the reference's sampler set
(see ``dpm_solver_sample``).

TPU-first (BASELINE.json north-star): the entire 50-step denoising loop lives in
one XLA program — the batch never leaves HBM, per-step coefficients are scanned
constants, and classifier-free guidance runs as a single doubled batch through
the U-Net rather than two calls.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import LatentDiffusion
from .schedules import DDIMSchedule, extract, q_sample

Array = jax.Array


def _cfg_apply(model: LatentDiffusion, params, x: Array, t: Array, cond, uncond,
               scale: float) -> Array:
    """Model eval with classifier-free guidance (ddim.py:173-179)."""
    if uncond is None or scale == 1.0:
        return model.apply_model(params, x, t, cond)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jax.tree.map(lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)
    out = model.apply_model(params, x_in, t_in, c_in)
    e_uncond, e_cond = jnp.split(out, 2, axis=0)
    return e_uncond + scale * (e_cond - e_uncond)


def ddim_sample(model: LatentDiffusion, params, rng: Array,
                shape: Tuple[int, ...], steps: int = 50, eta: float = 0.0,
                cond: Any = None, uncond: Any = None, cfg_scale: float = 1.0,
                mask: Optional[Array] = None, x0: Optional[Array] = None,
                temperature: float = 1.0, method: str = "uniform",
                return_pred_x0: bool = False):
    """Full DDIM loop as one scan. ``mask``/``x0`` enable inpainting
    (ddim.py:146-149: keep masked region on the forward trajectory)."""
    dsched = DDIMSchedule.create(model.schedule, steps, eta, method)
    n = len(dsched.timesteps)

    # tables in descending-time order so scan step 0 is t_max
    ts = jnp.asarray(dsched.timesteps[::-1].copy(), jnp.int32)
    a_t = jnp.asarray(dsched.alphas[::-1].copy(), jnp.float32)
    a_prev = jnp.asarray(dsched.alphas_prev[::-1].copy(), jnp.float32)
    sqrt_1ma = jnp.asarray(dsched.sqrt_one_minus_alphas[::-1].copy(), jnp.float32)
    sigmas = jnp.asarray(dsched.sigmas[::-1].copy(), jnp.float32)

    rng, r_init = jax.random.split(rng)
    img = jax.random.normal(r_init, shape, dtype=jnp.float32)
    step_rngs = jax.random.split(rng, n)

    def body(img, inputs):
        step_rng, t_scalar, at, aprev, s1ma, sigma = inputs
        b = shape[0]
        t = jnp.full((b,), t_scalar, jnp.int32)

        if mask is not None:
            img_orig = q_sample(model.schedule, x0, t,
                                jax.random.normal(step_rng, shape))
            img = img_orig * mask + (1.0 - mask) * img

        out = _cfg_apply(model, params, img, t, cond, uncond, cfg_scale)
        e_t = model.eps_from_model_out(img, t, out)

        pred_x0 = (img - s1ma * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev - sigma**2, 0.0)) * e_t
        noise = sigma * jax.random.normal(step_rng, shape) * temperature
        x_prev = jnp.sqrt(aprev) * pred_x0 + dir_xt + noise
        return x_prev, (pred_x0 if return_pred_x0 else 0.0)

    img, preds = jax.lax.scan(body, img, (step_rngs, ts, a_t, a_prev, sqrt_1ma, sigmas))
    if return_pred_x0:
        return img, preds
    return img


def plms_sample(model: LatentDiffusion, params, rng: Array,
                shape: Tuple[int, ...], steps: int = 50,
                cond: Any = None, uncond: Any = None, cfg_scale: float = 1.0,
                method: str = "uniform"):
    """PLMS (plms.py): Adams-Bashforth multistep on epsilon; eta must be 0.

    The 4-tap history is carried through the scan; the first steps fall back to
    lower-order updates exactly as the reference does (plms.py:196-209), with the
    order selected by ``lax.switch`` on the step index.
    """
    dsched = DDIMSchedule.create(model.schedule, steps, 0.0, method)
    n = len(dsched.timesteps)

    ts = jnp.asarray(dsched.timesteps[::-1].copy(), jnp.int32)
    ts_next = jnp.concatenate([ts[1:], jnp.asarray([0], jnp.int32)])
    a_t = jnp.asarray(dsched.alphas[::-1].copy(), jnp.float32)
    a_prev = jnp.asarray(dsched.alphas_prev[::-1].copy(), jnp.float32)
    sqrt_1ma = jnp.asarray(dsched.sqrt_one_minus_alphas[::-1].copy(), jnp.float32)

    rng, r_init = jax.random.split(rng)
    img = jax.random.normal(r_init, shape, dtype=jnp.float32)
    b = shape[0]

    def get_prev(img, e_t, at, aprev, s1ma):
        pred_x0 = (img - s1ma * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev, 0.0)) * e_t
        return jnp.sqrt(aprev) * pred_x0 + dir_xt, pred_x0

    def body(carry, inputs):
        img, old_eps, count = carry
        t_scalar, t_next_scalar, at, aprev, s1ma = inputs
        t = jnp.full((b,), t_scalar, jnp.int32)
        t_next = jnp.full((b,), t_next_scalar, jnp.int32)

        out = _cfg_apply(model, params, img, t, cond, uncond, cfg_scale)
        e_t = model.eps_from_model_out(img, t, out)

        # first step refines with a second model eval at t_next (plms.py:198-201)
        def order1(_):
            x_prev, _p = get_prev(img, e_t, at, aprev, s1ma)
            out2 = _cfg_apply(model, params, x_prev, t_next, cond, uncond, cfg_scale)
            e_t_next = model.eps_from_model_out(x_prev, t_next, out2)
            return (e_t + e_t_next) / 2.0

        def order2(_):
            return (3.0 * e_t - old_eps[2]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * old_eps[2] + 5.0 * old_eps[1]) / 12.0

        def order4(_):
            return (55.0 * e_t - 59.0 * old_eps[2] + 37.0 * old_eps[1]
                    - 9.0 * old_eps[0]) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(count, 3),
                                 [order1, order2, order3, order4], None)
        x_prev, _ = get_prev(img, e_prime, at, aprev, s1ma)

        old_eps = jnp.stack([old_eps[1], old_eps[2], e_t])
        return (x_prev, old_eps, count + 1), 0.0

    old_eps0 = jnp.zeros((3, *shape), jnp.float32)
    (img, _, _), _ = jax.lax.scan(
        body, (img, old_eps0, jnp.asarray(0, jnp.int32)),
        (ts, ts_next, a_t, a_prev, sqrt_1ma))
    return img


def dpm_solver_sample(model: LatentDiffusion, params, rng: Array,
                      shape: Tuple[int, ...], steps: int = 20,
                      cond: Any = None, uncond: Any = None,
                      cfg_scale: float = 1.0, method: str = "uniform"):
    """DPM-Solver++(2M): second-order multistep ODE solver in data-prediction
    form (Lu et al. 2022, arXiv:2211.01095) — BEYOND the reference's sampler
    set (it ships only DDIM/PLMS, ``lidm/models/diffusion/{ddim,plms}.py``):
    one model eval per step, deterministic, and typically matches 50-step
    DDIM sample quality at ~20 steps, i.e. ~2.5x sampling throughput.

    Same one-``lax.scan`` structure as ``ddim_sample``: per-step scalars are
    precomputed numpy tables fed as scan inputs; the multistep history
    (previous x0 prediction) rides the carry; the first step falls back to
    first-order (DPM-Solver++(1) == DDIM eta=0 in lambda-space) gated by the
    step counter, mirroring how ``plms_sample`` warms up its history.
    """
    dsched = DDIMSchedule.create(model.schedule, steps, 0.0, method)
    n = len(dsched.timesteps)
    b = shape[0]

    acp_cur = dsched.alphas[::-1].copy()
    acp_next = dsched.alphas_prev[::-1].copy()
    alpha_c, sigma_c = np.sqrt(acp_cur), np.sqrt(1.0 - acp_cur)
    alpha_n, sigma_n = np.sqrt(acp_next), np.sqrt(1.0 - acp_next)
    lam_c = np.log(alpha_c / sigma_c)
    lam_n = np.log(alpha_n / sigma_n)
    h = lam_n - lam_c
    h_prev = np.concatenate([h[:1], h[:-1]])  # unused at step 0
    # degenerate grid entries (duplicate timesteps after clipping, e.g.
    # steps == num_timesteps) give h == 0: that transition is an identity
    # (sigma_n == sigma_c, expm1(0) == 0), so any finite r works; and a
    # zero h_prev would blow up the 1/(2r) correction, so fall back to
    # first-order there
    r = np.where(h != 0.0, h_prev / np.where(h == 0.0, 1.0, h), 1.0)
    ms_ok = (h_prev > 0.0).astype(np.float32)
    r = np.maximum(r, 1e-4)

    ts = jnp.asarray(dsched.timesteps[::-1].copy(), jnp.int32)
    tables = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        (alpha_c, sigma_c, alpha_n, sigma_n, h, r, ms_ok))

    # deterministic solver, but derive the initial latent exactly like
    # ddim/plms (split -> r_init) so one key gives all samplers the same
    # starting noise — cross-sampler trajectory comparisons depend on it
    _, r_init = jax.random.split(rng)
    img = jax.random.normal(r_init, shape, dtype=jnp.float32)

    def body(carry, inputs):
        img, x0_prev, count = carry
        t_scalar, (ac, sc, an, sn, h_i, r_i, ms_i) = inputs
        t = jnp.full((b,), t_scalar, jnp.int32)

        out = _cfg_apply(model, params, img, t, cond, uncond, cfg_scale)
        e_t = model.eps_from_model_out(img, t, out)
        x0 = (img - sc * e_t) / ac

        c2 = 1.0 / (2.0 * r_i)
        d = jnp.where((count > 0) & (ms_i > 0),
                      (1.0 + c2) * x0 - c2 * x0_prev, x0)
        img = (sn / sc) * img - an * jnp.expm1(-h_i) * d
        return (img, x0, count + 1), 0.0

    (img, _, _), _ = jax.lax.scan(
        body, (img, jnp.zeros(shape, jnp.float32), jnp.asarray(0, jnp.int32)),
        (ts, tables))
    return img


def ddpm_sample(model: LatentDiffusion, params, rng: Array,
                shape: Tuple[int, ...], cond: Any = None,
                clip_denoised: bool = True):
    """Full ancestral sampling over all T steps (ddpm.py:220-269)."""
    s = model.schedule
    T = s.num_timesteps
    rng, r_init = jax.random.split(rng)
    img = jax.random.normal(r_init, shape, dtype=jnp.float32)
    step_rngs = jax.random.split(rng, T)
    b = shape[0]

    post_c1 = jnp.asarray(s.posterior_mean_coef1, jnp.float32)
    post_c2 = jnp.asarray(s.posterior_mean_coef2, jnp.float32)
    post_logvar = jnp.asarray(s.posterior_log_variance_clipped, jnp.float32)
    sr = jnp.asarray(s.sqrt_recip_alphas_cumprod, jnp.float32)
    srm1 = jnp.asarray(s.sqrt_recipm1_alphas_cumprod, jnp.float32)

    def body(img, inputs):
        step_rng, t_scalar = inputs
        t = jnp.full((b,), t_scalar, jnp.int32)
        out = model.apply_model(params, img, t, cond)
        if model.cfg.parameterization == "eps":
            x0 = sr[t_scalar] * img - srm1[t_scalar] * out
        else:
            x0 = out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = post_c1[t_scalar] * x0 + post_c2[t_scalar] * img
        noise = jax.random.normal(step_rng, shape)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        img = mean + nonzero * jnp.exp(0.5 * post_logvar[t_scalar]) * noise
        return img, 0.0

    img, _ = jax.lax.scan(body, img,
                          (step_rngs, jnp.arange(T - 1, -1, -1, dtype=jnp.int32)))
    return img
