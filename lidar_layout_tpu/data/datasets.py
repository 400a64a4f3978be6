"""Dataset readers: KITTI-360 / SemanticKITTI / nuScenes range-image batches.

Parity: ``lidm/data/kitti.py`` (velodyne .bin -> pcd2range -> process_scan),
``lidm/data/nusc_dataset.py`` (nuScenes variants). Readers keep numpy for IO
and push the projection math to device in batches (the reference projects
per-sample in CPU workers — SURVEY.md §7 moves this on-device).

When no dataset root exists the synthetic generator stands in, so every
pipeline stays runnable end-to-end in this environment.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..ops.lidar import KITTI_GEOMETRY, NUSCENES_GEOMETRY, LidarGeometry
from .synthetic import synthetic_range_batch


def read_velodyne_bin(path: str, with_remission: bool = True) -> np.ndarray:
    """KITTI velodyne format: float32 Nx4 [x, y, z, remission]."""
    scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return scan if with_remission else scan[:, :3]


def list_kitti360_scans(root: str, split: str = "train") -> List[str]:
    """KITTI-360 layout: <root>/data_3d_raw/<seq>/velodyne_points/data/*.bin.
    Splits follow the reference's sequence partition (kitti.py)."""
    train_seqs = ["0000", "0002", "0003", "0004", "0005", "0006", "0007", "0009", "0010"]
    val_seqs = ["0008"]
    seqs = train_seqs if split == "train" else val_seqs
    files = []
    for s in seqs:
        patt = os.path.join(root, "data_3d_raw", f"2013_05_28_drive_{s}_sync",
                            "velodyne_points", "data", "*.bin")
        files.extend(sorted(glob.glob(patt)))
    return files


def list_semantic_kitti_scans(root: str, split: str = "train") -> List[str]:
    train_seqs = [f"{i:02d}" for i in range(11) if i != 8]
    val_seqs = ["08"]
    seqs = train_seqs if split == "train" else val_seqs
    files = []
    for s in seqs:
        files.extend(sorted(glob.glob(
            os.path.join(root, "sequences", s, "velodyne", "*.bin"))))
    return files


class RangeImageDataset:
    """Batched iterator over projected range images.

    Falls back to synthetic scenes when ``root`` is missing/empty, so training
    scripts always run (clearly logged).
    """

    def __init__(self, root: Optional[str], dataset: str = "kitti360",
                 split: str = "train", batch_size: int = 4,
                 geom: Optional[LidarGeometry] = None, seed: int = 0,
                 max_points: int = 130000,
                 degradation: Optional[str] = None,
                 scale_factors: Optional[tuple] = None):
        self.geom = geom or (NUSCENES_GEOMETRY if dataset.startswith("nusc")
                             else KITTI_GEOMETRY)
        # SR-style conditioning: fixed PIL-interp downsample attached as
        # 'degraded_image' (reference base.py:37-49, kitti.py:80-82)
        self.degradation_transform = None
        if degradation is not None and scale_factors is not None:
            from .degradation import make_degradation_transform
            self.degradation_transform = make_degradation_transform(
                self.geom.size, scale_factors, degradation)
        self.batch_size = batch_size
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)
        self.files: List[str] = []
        if root and os.path.isdir(root):
            if dataset == "kitti360":
                self.files = list_kitti360_scans(root, split)
            elif dataset in ("kitti", "semantic_kitti"):
                self.files = list_semantic_kitti_scans(root, split)
        self.synthetic = not self.files
        if self.synthetic:
            print(f"[data] no scans under root={root!r} — using synthetic scenes")

    def __len__(self):
        return max(len(self.files) // self.batch_size, 1)

    def _project(self, clouds: np.ndarray, masks: np.ndarray) -> Dict[str, np.ndarray]:
        import jax
        import jax.numpy as jnp

        from ..ops import lidar as L

        @jax.jit
        def proj(p, m):
            img, _ = jax.vmap(lambda q, mm: L.pcd2range(q, self.geom, mask=mm))(p, m)
            model, mask = L.process_scan(img, self.geom)
            return model, mask

        model, mask = proj(jnp.asarray(clouds), jnp.asarray(masks))
        return self._attach_degraded(
            {"image": np.asarray(model)[..., None],
             "mask": np.asarray(mask)[..., None]})

    def _attach_degraded(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.degradation_transform is not None:
            batch["degraded_image"] = np.stack(
                [self.degradation_transform(img)
                 for img in batch["image"]]).astype(np.float32)
        return batch

    def batches(self, shuffle: bool = True, use_native: bool = True
                ) -> Iterator[Dict[str, np.ndarray]]:
        if self.synthetic:
            while True:
                yield self._attach_degraded(
                    synthetic_range_batch(self.rng, self.batch_size, self.geom))

        loader = None
        if use_native:
            try:
                from .native_loader import NativeScanLoader
                loader = NativeScanLoader(self.files, self.max_points)
            except Exception as e:
                print(f"[data] native loader unavailable ({e}); python reader")

        order = np.arange(len(self.files))
        while True:
            if shuffle:
                self.rng.shuffle(order)
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                clouds = np.zeros((self.batch_size, self.max_points, 3), np.float32)
                masks = np.zeros((self.batch_size, self.max_points), bool)
                idxs = order[i:i + self.batch_size]
                if loader is not None:
                    for k in idxs:
                        loader.enqueue(int(k))
                    for j in range(self.batch_size):
                        _, xyz, _, nv = loader.next()
                        clouds[j] = xyz
                        masks[j, :nv] = True
                else:
                    for j, k in enumerate(idxs):
                        pts = read_velodyne_bin(self.files[k])[:, :3]
                        n = min(len(pts), self.max_points)
                        clouds[j, :n] = pts[:n]
                        masks[j, :n] = True
                yield self._project(clouds, masks)
