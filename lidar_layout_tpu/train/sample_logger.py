"""Sample/reconstruction logging hook — the ImageLogger equivalent.

Parity: ``main.py:301-415`` ImageLogger — at a step frequency, render range
images (inputs / reconstructions / samples) and the reprojected point clouds
to the run directory. PNGs via matplotlib when available, .npy always.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from .trainer import HookBase


def save_range_png(path: str, img: np.ndarray) -> bool:
    """Render a range image to PNG (returns False if matplotlib is absent)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    fig, ax = plt.subplots(figsize=(12, 2))
    ax.imshow(img, cmap="turbo", vmin=-1, vmax=1, aspect="auto")
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return True


def lidm_log_images(model, params, batch, rng, n_row: int = 4,
                    sample_steps: int = 20, inpaint: bool = True):
    """The LatentDiffusion.log_images suite (ddpm.py:1261-1409): inputs,
    first-stage reconstruction, a progressive-noising diffusion row, DDIM
    samples, and inpainting/outpainting variants (masked DDIM, ddim.py:146).

    Returns dict[name -> (B, H, W, 1) model-space range images].
    """
    import jax
    import jax.numpy as jnp

    from ..models.samplers import ddim_sample
    from ..models.schedules import q_sample

    x = jnp.asarray(batch["image"][:n_row])
    n_row = x.shape[0]  # the batch may be smaller than requested
    out = {"inputs": x}
    z = model.encode_first_stage(params, x)
    rec = model.decode_first_stage(params, z)
    out["reconstruction"] = rec[..., :1]

    cond = None
    if model.cfg.conditioning_key is not None and "cond" in batch:
        cond = model.get_learned_conditioning(
            params, jax.tree.map(lambda v: jnp.asarray(v[:n_row]),
                                 batch["cond"]))

    # diffusion row: q_sample at evenly spaced t, decoded (ddpm.py:1286-1295)
    r_noise, r_samp, r_inp = jax.random.split(rng, 3)
    ts = jnp.linspace(0, model.cfg.timesteps - 1, 4).astype(jnp.int32)
    noise = jax.random.normal(r_noise, z.shape, z.dtype)
    diff_row = [model.decode_first_stage(
        params, q_sample(model.schedule, z, jnp.full((z.shape[0],), t), noise)
    )[..., :1] for t in ts]
    out["diffusion_row"] = jnp.concatenate(diff_row, axis=1)  # stack rows

    shape = (n_row, *model.cfg.latent_shape)
    z_s = ddim_sample(model, params, r_samp, shape, steps=sample_steps,
                      cond=cond)
    out["samples"] = model.decode_first_stage(params, z_s)[..., :1]

    if inpaint:
        # keep the left half on the forward trajectory, regenerate the right
        # (ddpm.py:1361-1390 inpaint/outpaint with a quartered mask)
        h, w = model.cfg.latent_shape[:2]
        mask = jnp.zeros((n_row, h, w, 1)).at[:, :, : w // 2].set(1.0)
        z_in = ddim_sample(model, params, r_inp, shape, steps=sample_steps,
                           cond=cond, mask=mask, x0=z)
        out["samples_inpainting"] = model.decode_first_stage(params, z_in)[..., :1]
        z_out = ddim_sample(model, params, r_inp, shape, steps=sample_steps,
                            cond=cond, mask=1.0 - mask, x0=z)
        out["samples_outpainting"] = model.decode_first_stage(params, z_out)[..., :1]
    return out


class SampleLogger(HookBase):
    """Calls ``render_fn(state, rng) -> dict[name -> (B, H, W, 1) images]``
    every ``every_steps`` and writes the results under workdir/images."""

    def __init__(self, render_fn: Callable, every_steps: int = 1000,
                 max_images: int = 4):
        self.render_fn = render_fn
        self.every_steps = every_steps
        self.max_images = max_images

    def after_step(self, logs):
        step = self.trainer.global_step
        if step % self.every_steps != 0:
            return
        import jax

        out_dir = os.path.join(self.trainer.workdir, "images")
        os.makedirs(out_dir, exist_ok=True)
        self.trainer.rng, sub = jax.random.split(self.trainer.rng)
        images = self.render_fn(self.trainer.state, sub)
        for name, imgs in images.items():
            imgs = np.asarray(imgs)[: self.max_images]
            np.save(os.path.join(out_dir, f"{name}_{step:07d}.npy"), imgs)
            for i, img in enumerate(imgs[..., 0]):
                save_range_png(
                    os.path.join(out_dir, f"{name}_{step:07d}_{i}.png"), img)
