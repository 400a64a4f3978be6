"""RangeNet-based perceptual loss for the range-image AEs.

Parity: ``lidm/modules/losses/perceptual.py:70-123`` PerceptualLoss —
channel-normalized feature diffs at rangenet decoder stages, per-stage scales
[5.0, 3.39, 2.29, 1.61, 0.895], spatial average, sum.

The feature net is frozen (params captured at construction, stop_gradient in
the forward). Metric parity needs the reference's pretrained rangenet weights
converted via eval.rangenet.load_torch_weights; the loss works (and trains the
AE usefully) with any fixed feature net.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..eval.rangenet import RangeNet
from ..ops.lidar import LidarGeometry

Array = jax.Array

STAGE_SCALES = (5.0, 3.39, 2.29, 1.61, 0.895)
DEFAULT_STAGES = ("dec_0", "dec_1", "dec_2", "dec_3", "dec_4")


def normalize_channels(x: Array, eps: float = 1e-10) -> Array:
    n = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (n + eps)


def make_perceptual_fn(geom: LidarGeometry, params=None,
                       stages: Sequence[str] = DEFAULT_STAGES,
                       rng_seed: int = 0,
                       stage_scales: Sequence[float] = None,
                       descriptor_weight: float = 0.0
                       ) -> Callable[[Array, Array], Array]:
    """Build perceptual_fn(inputs, recon) for losses.vq_loss.reconstruction_nll.

    inputs/recon are model-space (B, H, W, 1) range images; features are
    computed on [metric_depth, xyz] as the reference's preprocess does.
    """
    net = RangeNet(layers=21)
    if params is None:
        import numpy as np

        h, w = geom.size
        params = net.init(jax.random.key(rng_seed), jnp.zeros((1, h, w, 4)))
    params = jax.lax.stop_gradient(params)

    dirs = jnp.asarray(geom.ray_dirs(), jnp.float32)

    def preprocess(img: Array) -> Array:
        depth = (img[..., 0] * 0.5 + 0.5) * geom.depth_scale
        if geom.log_scale:
            depth = jnp.exp2(depth) - 1.0
        xyz = dirs[None] * depth[..., None]
        return jnp.concatenate([depth[..., None], xyz], axis=-1)

    # reference per-stage scales follow the dec_0..dec_4 order; a stage
    # subset keeps each stage's own scale (stage selection = the
    # "perceptual-layer weighting" lever, VERDICT r4 task 2)
    if stage_scales is None:
        stage_scales = [STAGE_SCALES[DEFAULT_STAGES.index(s)] for s in stages]

    def perceptual_fn(target: Array, recon: Array) -> Array:
        f0 = net.apply(params, preprocess(recon), return_features=True)
        f1 = net.apply(params, preprocess(target), return_features=True)
        total = 0.0
        for scale, name in zip(stage_scales, stages):
            a = normalize_channels(jax.lax.stop_gradient(f1[name]))
            b = normalize_channels(f0[name])
            diff = jnp.abs(a - b).mean(axis=-1)          # l1, channel mean
            total = total + scale * diff.mean()
        if descriptor_weight:
            # deepest layer: the FRID descriptor itself (final logits,
            # depth-sector aggregated) — per-sample L2 matching bounds the
            # Frechet mean term the stage losses don't directly see
            d0 = net.apply(params, preprocess(recon),
                           return_final_logits=True, agg_type="depth")
            d1 = jax.lax.stop_gradient(net.apply(
                params, preprocess(target), return_final_logits=True,
                agg_type="depth"))
            total = total + descriptor_weight * jnp.mean((d0 - d1) ** 2)
        return total

    return perceptual_fn
