"""Generation/reconstruction metrics: CD, EMD, JSD, MMD, Fréchet distance.

Parity: ``lidm/eval/eval_utils.py:20-104`` (evaluate dispatch, compute_cd/emd/
jsd/mmd), ``lidm/eval/metric_utils.py:233-284`` (BEV count histograms and
binned 2D clouds), ``lidm/eval/fid_score.py`` (Fréchet distance).

Device-side where it counts: chamfer/EMD run on TPU via ops.chamfer/ops.emd;
the Fréchet sqrtm runs on host (scipy) exactly like the reference.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import pairwise_cd
from ..ops.emd import emd_distance

Array = jax.Array

# eval constants (lidm/eval/__init__.py:28-36)
VOXEL_SIZE = 0.05
NUM_SECTORS = 16
DATA_CONFIG = {"64": {"x": [-50, 50], "y": [-50, 50], "z": [-3, 1]},
               "32": {"x": [-30, 30], "y": [-30, 30], "z": [-3, 6]}}


# ---------------------------------------------------------------------------
# BEV histograms (metric_utils.py:233-284)
# ---------------------------------------------------------------------------

def bev_count_histogram(pcds: Sequence[np.ndarray], data_type: str = "64",
                        voxel_size: float = VOXEL_SIZE) -> np.ndarray:
    """Sum over clouds of per-cloud BEV *occupancy* (each occupied voxel counts
    once per cloud — the reference dedups points via sparse_quantize first)."""
    cfg = DATA_CONFIG[data_type]
    x_range, y_range = cfg["x"], cfg["y"]
    nx = math.ceil((x_range[1] - x_range[0]) / voxel_size)
    ny = math.ceil((y_range[1] - y_range[0]) / voxel_size)
    min_bx = math.ceil(x_range[0] / voxel_size)
    min_by = math.ceil(y_range[0] / voxel_size)

    out = np.zeros((nx, ny), np.float32)
    for pcd in pcds:
        m = ((pcd[:, 0] > x_range[0]) & (pcd[:, 0] < x_range[1])
             & (pcd[:, 1] > y_range[0]) & (pcd[:, 1] < y_range[1]))
        p = pcd[m][:, :2]
        v = np.floor(p / voxel_size).astype(np.int64)
        v[:, 0] -= min_bx
        v[:, 1] -= min_by
        v = np.clip(v, 0, [nx - 1, ny - 1])
        occ = np.zeros((nx, ny), bool)
        occ[v[:, 0], v[:, 1]] = True
        out += occ
    return out


def bev_bin_clouds(pcds: Sequence[np.ndarray], data_type: str = "64",
                   voxel_size: float = 0.5) -> List[np.ndarray]:
    """Per-cloud deduped normalized 2D voxel clouds (pcd2bev_bin)."""
    cfg = DATA_CONFIG[data_type]
    x_range, y_range = cfg["x"], cfg["y"]
    nx = math.ceil((x_range[1] - x_range[0]) / voxel_size)
    ny = math.ceil((y_range[1] - y_range[0]) / voxel_size)
    min_bx = math.ceil(x_range[0] / voxel_size)
    min_by = math.ceil(y_range[0] / voxel_size)

    out = []
    for pcd in pcds:
        m = ((pcd[:, 0] > x_range[0]) & (pcd[:, 0] < x_range[1])
             & (pcd[:, 1] > y_range[0]) & (pcd[:, 1] < y_range[1]))
        p = pcd[m][:, :2]
        v = np.floor(p / voxel_size)
        v = np.unique(v, axis=0)
        v = ((v - [min_bx, min_by]) / [nx, ny]).astype(np.float32)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def compute_jsd(reference: Sequence[np.ndarray], samples: Sequence[np.ndarray],
                data_type: str = "64") -> float:
    """Jensen-Shannon divergence between summed BEV histograms
    (eval_utils.py:87-97; scipy.spatial.distance.jensenshannon semantics —
    i.e. the square root of the JS divergence with base-e logs)."""
    p = bev_count_histogram(reference, data_type).flatten()
    q = bev_count_histogram(samples, data_type).flatten()
    p = p / p.sum()
    q = q / q.sum()
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log(a[mask] / b[mask])))

    js = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return float(np.sqrt(max(js, 0.0)))


def _pad_to(p: np.ndarray, n: int, ndim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad cloud to n rows; mask marks real rows (the reference pads with 1e6
    sentinels — we carry an explicit mask instead)."""
    mask = np.zeros((n,), bool)
    mask[: len(p)] = True
    out = np.full((n, ndim), 1e6, np.float32)
    out[: len(p)] = p
    return out, mask


def compute_mmd(reference: Sequence[np.ndarray], samples: Sequence[np.ndarray],
                data_type: str = "64", ref_chunk: int = 8) -> float:
    """Minimum matching distance over binned BEV 2D clouds (eval_utils.py:70-84):
    for each reference cloud, min chamfer distance over all samples.

    One jitted call per ref_chunk references (vmapped over both axes) — a
    handful of device round-trips total instead of one per reference."""
    ref_b = bev_bin_clouds(reference, data_type)
    smp_b = bev_bin_clouds(samples, data_type)
    cap = max(max((len(p) for p in ref_b + smp_b), default=1), 1)
    # bucket the pad size so different sample sets (whose max bin counts
    # differ by a few points) reuse one compiled program instead of paying
    # a fresh nested-vmap compile per call — the dominant cost on CPU
    cap = -(-cap // 512) * 512

    smp_arr = jnp.asarray(np.stack([_pad_to(p, cap, 2)[0] for p in smp_b]))
    smp_mask = jnp.asarray(np.stack([_pad_to(p, cap, 2)[1] for p in smp_b]))

    @jax.jit
    def min_cd_chunk(rs, rms):
        def one_ref(r, rm):
            return jnp.min(jax.vmap(
                lambda s, sm: pairwise_cd(r, s, rm, sm))(smp_arr, smp_mask))
        return jax.vmap(one_ref)(rs, rms)

    results = []
    for i in range(0, len(ref_b), ref_chunk):
        chunk = ref_b[i: i + ref_chunk]
        while len(chunk) < ref_chunk:  # pad the last chunk (results sliced)
            chunk = chunk + [chunk[-1]]
        rs = jnp.asarray(np.stack([_pad_to(p, cap, 2)[0] for p in chunk]))
        rms = jnp.asarray(np.stack([_pad_to(p, cap, 2)[1] for p in chunk]))
        vals = np.asarray(min_cd_chunk(rs, rms))
        results.extend(vals[: min(ref_chunk, len(ref_b) - i)].tolist())
    return float(np.mean(results))


def compute_cd(reference: Sequence[np.ndarray], samples: Sequence[np.ndarray]
               ) -> float:
    """Mean pairwise chamfer over matched (reference, sample) pairs."""
    vals = [float(pairwise_cd(jnp.asarray(x), jnp.asarray(y)))
            for x, y in zip(reference, samples)]
    return float(np.mean(vals))


def compute_emd(reference: Sequence[np.ndarray], samples: Sequence[np.ndarray]
                ) -> float:
    vals = [float(emd_distance(jnp.asarray(x), jnp.asarray(y)))
            for x, y in zip(reference, samples)]
    return float(np.mean(vals))


def frechet_distance(feat1: np.ndarray, feat2: np.ndarray, eps: float = 1e-6
                     ) -> float:
    """Fréchet distance between feature sets (fid_score.py, pytorch-fid math)."""
    from scipy import linalg

    mu1, mu2 = feat1.mean(axis=0), feat2.mean(axis=0)
    s1 = np.cov(feat1, rowvar=False)
    s2 = np.cov(feat2, rowvar=False)

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))


def evaluate(reference: Sequence[np.ndarray], samples: Sequence[np.ndarray],
             metrics: Sequence[str], data_type: str = "64",
             feature_fn=None) -> Dict[str, float]:
    """Dispatch mirroring eval_utils.evaluate. ``feature_fn(pcds) -> (N, D)``
    supplies perceptual features for frid/fsvd/fpvd when a feature net +
    weights are available (see eval/rangenet.py)."""
    out: Dict[str, float] = {}
    if "cd" in metrics:
        out["cd"] = compute_cd(reference, samples)
    if "emd" in metrics:
        out["emd"] = compute_emd(reference, samples)
    if "jsd" in metrics:
        out["jsd"] = compute_jsd(reference, samples, data_type)
    if "mmd" in metrics:
        out["mmd"] = compute_mmd(reference, samples, data_type)
    for name in ("frid", "fsvd", "fpvd"):
        if name in metrics:
            fn = feature_fn.get(name) if isinstance(feature_fn, dict) \
                else feature_fn
            assert fn is not None, f"{name} needs a feature extractor"
            f1 = fn(reference)
            f2 = fn(samples)
            out[name] = frechet_distance(np.asarray(f1), np.asarray(f2))
    return out
