"""Synthetic LiDAR scenes for tests and benchmarks (no dataset download needed).

Generates plausible street-like scans: ground plane + random boxes (cars/walls)
+ poles, then projects them through the real pipeline (ops.lidar), so every
downstream component sees realistically-structured range images.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..ops.lidar import LidarGeometry, KITTI_GEOMETRY


def synthetic_scene(rng: np.random.Generator, n_points: int = 120000) -> np.ndarray:
    """Return (N, 3) float32 points of a synthetic street scene.

    Identical RNG consumption to :func:`synthetic_scene_labeled`, so the two
    produce bit-identical geometry for the same generator state.
    """
    return synthetic_scene_labeled(rng, n_points)[0]


def synthetic_scene_labeled(rng: np.random.Generator, n_points: int = 120000
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 3) points + (N,) int32 semantic labels (0 ground, 1 box, 2 pole).

    Same generative process as :func:`synthetic_scene`, with per-point class
    ids so a semantic range map can be projected for conditional training
    (the sem-map conditioning task, kitti.py:111-124 one-hot maps).
    """
    n_ground = int(n_points * 0.6)
    r = np.sqrt(rng.uniform(4.0, 2500.0, n_ground))
    th = rng.uniform(-np.pi, np.pi, n_ground)
    ground = np.stack([r * np.cos(th), r * np.sin(th),
                       rng.normal(-1.9, 0.05, n_ground)], axis=-1)

    boxes = []
    n_box = rng.integers(6, 14)
    per_box = int(n_points * 0.3) // max(n_box, 1)
    for _ in range(n_box):
        cx, cy = rng.uniform(-40, 40, 2)
        l, w, h = rng.uniform(1.5, 8), rng.uniform(1.5, 3), rng.uniform(1.0, 3.0)
        pts = np.stack([rng.uniform(-l / 2, l / 2, per_box) + cx,
                        rng.uniform(-w / 2, w / 2, per_box) + cy,
                        rng.uniform(-2.0, -2.0 + h, per_box)], axis=-1)
        boxes.append(pts)

    n_pole = n_points - n_ground - per_box * n_box
    px, py = rng.uniform(-30, 30, (2, max(n_pole, 1)))
    poles = np.stack([px, py, rng.uniform(-2.0, 4.0, max(n_pole, 1))], axis=-1)

    pts = np.concatenate([ground] + boxes + [poles]).astype(np.float32)
    labels = np.concatenate([np.zeros(n_ground, np.int32),
                             np.ones(per_box * n_box, np.int32),
                             np.full(max(n_pole, 1), 2, np.int32)])
    return pts[:n_points], labels[:n_points]


def synthetic_range_batch(rng: np.random.Generator, batch: int,
                          geom: LidarGeometry = KITTI_GEOMETRY,
                          with_pcd: bool = False) -> Dict[str, np.ndarray]:
    """Batch dict matching the reference dataset contract:
    image (B,H,W,1) in [-1,1], mask (B,H,W,1) in {-1,+1}."""
    import jax
    import jax.numpy as jnp
    from ..ops import lidar as L

    pts = np.stack([synthetic_scene(rng) for _ in range(batch)])

    @jax.jit
    def project(p):
        img, _ = jax.vmap(lambda q: L.pcd2range(q, geom))(p)
        model, mask = L.process_scan(img, geom)
        return model, mask

    model, mask = project(jnp.asarray(pts))
    out = {"image": np.asarray(model)[..., None],
           "mask": np.asarray(mask)[..., None]}
    if with_pcd:
        out["points"] = pts
    return out


def synthetic_latent_batch(rng: np.random.Generator, batch: int,
                           shape: Tuple[int, int, int] = (16, 128, 8)
                           ) -> Dict[str, np.ndarray]:
    return {"image": rng.standard_normal((batch, *shape)).astype(np.float32)}
