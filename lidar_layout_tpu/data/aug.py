"""LiDAR augmentations (parity: lidm/utils/aug_utils.py:9-229).

Point-cloud flips/rotations (with matching box transforms) and keypoint drop,
as pure functions usable host-side (numpy) or device-side (jnp).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def random_flip(points: np.ndarray, boxes: Optional[np.ndarray],
                rng: np.random.Generator
                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Flip across x and/or y axes (aug_utils random_flip_*)."""
    pts = points.copy()
    bxs = None if boxes is None else boxes.copy()
    if rng.random() < 0.5:  # flip y
        pts[:, 1] = -pts[:, 1]
        if bxs is not None:
            bxs[:, 1] = -bxs[:, 1]
            bxs[:, 6] = -bxs[:, 6]
    if rng.random() < 0.5:  # flip x
        pts[:, 0] = -pts[:, 0]
        if bxs is not None:
            bxs[:, 0] = -bxs[:, 0]
            bxs[:, 6] = np.pi - bxs[:, 6]
    return pts, bxs


def random_rotate(points: np.ndarray, boxes: Optional[np.ndarray],
                  rng: np.random.Generator,
                  angle_range: Tuple[float, float] = (-np.pi / 4, np.pi / 4)
                  ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Global z rotation (aug_utils global_rotation)."""
    a = rng.uniform(*angle_range)
    c, s = np.cos(a), np.sin(a)
    rot = np.asarray([[c, -s], [s, c]], points.dtype)
    pts = points.copy()
    pts[:, :2] = pts[:, :2] @ rot.T
    bxs = None
    if boxes is not None:
        bxs = boxes.copy()
        bxs[:, :2] = bxs[:, :2] @ rot.T
        bxs[:, 6] = bxs[:, 6] + a
    return pts, bxs


def keypoint_drop(points: np.ndarray, rng: np.random.Generator,
                  drop_range: Tuple[int, int] = (5, 20),
                  radius: float = 2.0) -> np.ndarray:
    """Drop random spherical neighborhoods (aug_utils keypoint_drop):
    simulates occlusion holes."""
    n_drop = int(rng.integers(*drop_range))
    keep = np.ones(len(points), bool)
    for _ in range(n_drop):
        center = points[rng.integers(0, len(points))]
        d = np.linalg.norm(points - center, axis=-1)
        keep &= d > radius * rng.uniform(0.3, 1.0)
    return points[keep]
