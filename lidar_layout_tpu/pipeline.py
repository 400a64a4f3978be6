"""Programmatic serving surface: load a trained run, generate scenes.

The reference's serving story is script-shaped (``scripts/sample.py`` loads a
logdir and loops ``DDIMSampler.sample``; reference sample.py:266-303). For
deployment a library call is the right surface, so this module packages the
same flow behind one object:

    pipe = GenerationPipeline.from_run_dir("runs/my_lidm")
    out = pipe.generate(64, seed=0)          # out.images, out.clouds

TPU-first: one jitted program per batch size does sample -> VQ decode ->
reprojection (fixed-capacity clouds), so a serving call is a single dispatch
and the 50-step DDIM scan never leaves the chip. Programs are cached per
(batch, conditioning-shape) key; EMA weights are used by default (the
reference's ``ema_scope``, ddpm.py:174-187).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["GenerationPipeline", "GenerationResult", "geometry_from_config"]


def geometry_from_config(cfg: Dict[str, Any], dataset: str = "64"):
    """Projection geometry from a config's data.params.dataset block, else the
    per-dataset default (the reference wires dataset_config into everything,
    main.py:558-559)."""
    from .ops.lidar import KITTI_GEOMETRY, NUSCENES_GEOMETRY, LidarGeometry

    dset = (cfg or {}).get("data", {}).get("params", {}).get("dataset", {})
    if dset:
        return LidarGeometry(
            size=tuple(dset.get("size", (64, 1024))),
            fov=tuple(dset.get("fov", (3, -25))),
            depth_range=tuple(dset.get("depth_range", (1.0, 56.0))),
            depth_scale=dset.get("depth_scale", 5.84),
            log_scale=dset.get("log_scale", True))
    return KITTI_GEOMETRY if dataset == "64" else NUSCENES_GEOMETRY


@dataclass
class GenerationResult:
    """``images``: (n, H, W, C) model-space range images; ``clouds``: per-scene
    (k_i, 3) reprojected xyz; ``seconds``: device wall time (excl. compile)."""
    images: np.ndarray
    clouds: List[np.ndarray]
    seconds: float

    @property
    def samples_per_sec(self) -> float:
        return len(self.images) / max(self.seconds, 1e-9)


@dataclass
class GenerationPipeline:
    """A loaded LatentDiffusion-family model plus its compiled samplers.

    ``model`` must expose ``cfg.latent_shape``, ``decode_first_stage`` and the
    ``apply_model`` contract the samplers drive (models/diffusion.py). For
    pixel-space families (R2DM) use their north-star scripts; this surface
    targets the flagship range-image LiDM stack.
    """
    model: Any
    params: Any
    geom: Any
    # DPM-Solver++(2M) at 20 steps is the serving default: DPM_QUALITY.json
    # (trained north-star EMA weights) shows JSD/MMD parity with DDIM-50
    # (0.3524 vs 0.3541 / 3.3e-5 both) at 1.38x device throughput (2.5x
    # fewer model evals; the VQ decode is the remaining fixed cost).
    sampler: str = "dpm"
    steps: int = 20
    eta: float = 0.0
    _cache: Dict[Tuple, Any] = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------- loading
    @classmethod
    def from_run_dir(cls, run_dir: str, base_config: Optional[str] = None,
                     dataset: str = "64", use_ema: bool = True,
                     bf16: bool = False, **kw) -> "GenerationPipeline":
        """Load the run's saved ``config.yaml`` (train_lidm.py writes one; the
        reference re-merges saved configs on resume, main.py:502-518) and its
        latest checkpoint; EMA weights by default."""
        import jax
        import jax.numpy as jnp

        from .config import instantiate_from_config, load_yaml

        cfg_path = base_config or os.path.join(run_dir, "config.yaml")
        cfg = load_yaml(cfg_path)
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        model = instantiate_from_config(cfg["model"], dtype=dtype)
        geom = geometry_from_config(cfg, dataset)

        params = model.init(jax.random.key(0), image_shape=(*geom.size, 1))
        ckpt = os.path.join(run_dir, "ckpt")
        if os.path.isdir(ckpt):
            from .train.checkpoint import restore_checkpoint
            from .train.diffusion_trainer import (create_train_state,
                                                  ema_params, make_optimizer)
            state = create_train_state(model, params,
                                       make_optimizer(1e-4))
            state = restore_checkpoint(ckpt, state)
            params = ema_params(model, state) if use_ema else state.params
        return cls(model=model, params=params, geom=geom, **kw)

    @classmethod
    def from_config(cls, cfg: Any, params: Any = None, dataset: str = "64",
                    bf16: bool = False, seed: int = 0,
                    **kw) -> "GenerationPipeline":
        """Build from a config path/dict with given (or fresh-init) params —
        the programmatic twin of ``scripts/sample.py -b``."""
        import jax
        import jax.numpy as jnp

        from .config import instantiate_from_config, load_yaml

        if isinstance(cfg, str):
            cfg = load_yaml(cfg)
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        model = instantiate_from_config(cfg["model"], dtype=dtype)
        geom = geometry_from_config(cfg, dataset)
        if params is None:
            params = model.init(jax.random.key(seed),
                                image_shape=(*geom.size, 1))
        return cls(model=model, params=params, geom=geom, **kw)

    # ---------------------------------------------------------- generation
    def _program(self, batch: int, cond_shapes: Tuple, cfg_scale: float):
        key = (batch, cond_shapes, cfg_scale, self.sampler, self.steps,
               self.eta)
        if key in self._cache:
            return self._cache[key]

        import jax
        import jax.numpy as jnp

        from .models import samplers as S
        from .ops import lidar as L

        lh, lw, lc = self.model.cfg.latent_shape
        shape = (batch, lh, lw, lc)
        draw = {"ddim": lambda p, r, c, u: S.ddim_sample(
                    self.model, p, r, shape, steps=self.steps, eta=self.eta,
                    cond=c, uncond=u, cfg_scale=cfg_scale),
                "plms": lambda p, r, c, u: S.plms_sample(
                    self.model, p, r, shape, steps=self.steps, cond=c,
                    uncond=u, cfg_scale=cfg_scale),
                "dpm": lambda p, r, c, u: S.dpm_solver_sample(
                    self.model, p, r, shape, steps=self.steps, cond=c,
                    uncond=u, cfg_scale=cfg_scale),
                "ddpm": lambda p, r, c, u: S.ddpm_sample(
                    self.model, p, r, shape, cond=c)}[self.sampler]

        @jax.jit
        def program(params, rng, cond, uncond):
            z = draw(params, rng, cond, uncond)
            imgs = self.model.decode_first_stage(params, z)
            xyz, valid = jax.vmap(
                lambda im: L.range2pcd(im, self.geom))(imgs[..., 0])
            return imgs, xyz, valid

        self._cache[key] = program
        return program

    def generate(self, n: int, seed: int = 0, batch: int = 16,
                 cond: Any = None, uncond: Any = None,
                 cfg_scale: float = 1.0) -> GenerationResult:
        """Generate ``n`` scenes. ``cond``/``uncond`` are conditioning pytrees
        (already encoded, batch-leading) for conditional models; ``cfg_scale``
        > 1 enables classifier-free guidance (ddim.py:168-206)."""
        import jax

        def shapes(tree):
            if tree is None:
                return ()
            return tuple(x.shape for x in jax.tree.leaves(tree))

        b = min(batch, n)
        program = self._program(b, shapes(cond), cfg_scale)

        imgs_all, clouds = [], []
        rng = jax.random.key(seed)
        t_total = 0.0
        for i in range((n + b - 1) // b):
            t0 = time.perf_counter()
            imgs, xyz, valid = jax.tree.map(
                np.asarray,
                program(self.params, jax.random.fold_in(rng, i), cond,
                        uncond))
            t_total += time.perf_counter() - t0
            imgs_all.append(imgs)
            for pc, v in zip(xyz, valid):
                clouds.append(pc[v])
        images = np.concatenate(imgs_all)[:n]
        return GenerationResult(images=images, clouds=clouds[:n],
                                seconds=t_total)
