"""Point-cloud transform pipeline (pointcept transform registry slice).

Parity: ``pointcept/datasets/transform.py`` — the LiDAR-specific transforms on
the dense-decoder path (SURVEY.md §3.4): FiltPoint (:186), CoordConvert
(:207), ToRange (:231), GridSample (:880), RandomRotate/Flip, Collect — as
composable numpy callables over the sample dict {coord, feat?, ...}.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

TRANSFORMS: Dict[str, Callable] = {}


def register(name: str):
    def deco(cls):
        TRANSFORMS[name] = cls
        return cls
    return deco


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, data: Dict) -> Dict:
        for t in self.transforms:
            data = t(data)
        return data


@register("FiltPoint")
class FiltPoint:
    """Range-gate the cloud (transform.py:186)."""

    def __init__(self, point_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)):
        self.r = point_range

    def __call__(self, data):
        c = data["coord"]
        m = ((c[:, 0] > self.r[0]) & (c[:, 0] < self.r[3])
             & (c[:, 1] > self.r[1]) & (c[:, 1] < self.r[4])
             & (c[:, 2] > self.r[2]) & (c[:, 2] < self.r[5]))
        return {k: (v[m] if isinstance(v, np.ndarray) and len(v) == len(m)
                    else v) for k, v in data.items()}


@register("CoordConvert")
class CoordConvert:
    """Shift coords to a non-negative frame (transform.py:207)."""

    def __call__(self, data):
        data = dict(data)
        data["origin"] = data["coord"].min(axis=0)
        data["coord"] = data["coord"] - data["origin"]
        return data


@register("ToRange")
class ToRange:
    """Attach the projected range image (transform.py:231)."""

    def __init__(self, geom=None):
        from ..ops.lidar import NUSCENES_GEOMETRY
        self.geom = geom or NUSCENES_GEOMETRY

    def __call__(self, data):
        import jax.numpy as jnp

        from ..ops.lidar import pcd2range
        data = dict(data)
        coord = data.get("raw_coord", data["coord"])
        img, _ = pcd2range(jnp.asarray(coord, jnp.float32), self.geom)
        data["range_img"] = np.asarray(img)
        return data


@register("GridSample")
class GridSample:
    """Voxel-grid downsample keeping one point per cell (transform.py:880)."""

    def __init__(self, grid_size: float = 0.05):
        self.grid_size = grid_size

    def __call__(self, data):
        c = data["coord"]
        v = np.floor((c - c.min(axis=0)) / self.grid_size).astype(np.int64)
        key = (v[:, 0] << 40) + (v[:, 1] << 20) + v[:, 2]
        _, keep = np.unique(key, return_index=True)
        keep.sort()
        return {k: (val[keep] if isinstance(val, np.ndarray)
                    and len(val) == len(c) else val)
                for k, val in data.items()}


@register("RandomRotate")
class RandomRotate:
    def __init__(self, angle=(-1.0, 1.0), p=0.5, seed=0):
        self.angle = angle
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        if self.rng.random() > self.p:
            return data
        from .aug import random_rotate
        data = dict(data)
        a0, a1 = self.angle
        data["coord"], _ = random_rotate(
            data["coord"], None, self.rng,
            angle_range=(a0 * np.pi, a1 * np.pi))
        return data


@register("RandomFlip")
class RandomFlip:
    def __init__(self, p=0.5, seed=0):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        if self.rng.random() > self.p:
            return data
        from .aug import random_flip
        data = dict(data)
        data["coord"], _ = random_flip(data["coord"], None, self.rng)
        return data


@register("Collect")
class Collect:
    def __init__(self, keys: Sequence[str]):
        self.keys = list(keys)

    def __call__(self, data):
        return {k: data[k] for k in self.keys if k in data}


def build_pipeline(cfgs: Sequence[Dict]) -> Compose:
    """[{'type': 'FiltPoint', ...}, ...] -> Compose (registry builder)."""
    ts = []
    for c in cfgs:
        c = dict(c)
        ts.append(TRANSFORMS[c.pop("type")](**c))
    return Compose(ts)
