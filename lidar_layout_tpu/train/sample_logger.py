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
