"""Device-side metric featurization for the serving/eval loop.

The host pipeline (``eval/metrics.py``) consumes ragged numpy clouds — right
for offline eval of arbitrary sample sets, wrong inside a TPU serving loop:
reading 2k decoded clouds back through the relay costs ~100 MB per batch and
the host then re-bins what the chip just computed. These helpers compute the
*sufficient statistics* of JSD / MMD / FRID on device, per generated batch, so
the only readbacks are a (nx, ny) histogram, (B, nx*ny) occupancy bitmaps and
(B, D) feature rows.

Equivalence with the host metrics is tested in
``tests/test_eval_metrics.py`` (same binning rules: strict range bounds,
floor / voxel, min-corner shift — metric_utils.py:233-284).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import BIG_SENTINEL, DATA_CONFIG

Array = jax.Array


def _grid_dims(data_type: str, voxel_size: float) -> Tuple[int, int, int, int]:
    cfg = DATA_CONFIG[data_type]
    x_range, y_range = cfg["x"], cfg["y"]
    nx = math.ceil((x_range[1] - x_range[0]) / voxel_size)
    ny = math.ceil((y_range[1] - y_range[0]) / voxel_size)
    min_bx = math.ceil(x_range[0] / voxel_size)
    min_by = math.ceil(y_range[0] / voxel_size)
    return nx, ny, min_bx, min_by


def _cell_index(xyz: Array, valid: Array, data_type: str, voxel_size: float
                ) -> Tuple[Array, int, int]:
    """Per-point flat BEV cell index, invalid/out-of-range routed to a dump
    slot at nx*ny. Binning matches bev_count_histogram / _bev_bin_cells."""
    cfg = DATA_CONFIG[data_type]
    (x0, x1), (y0, y1) = cfg["x"], cfg["y"]
    nx, ny, min_bx, min_by = _grid_dims(data_type, voxel_size)
    x, y = xyz[..., 0], xyz[..., 1]
    inb = valid & (x > x0) & (x < x1) & (y > y0) & (y < y1)
    vx = jnp.clip(jnp.floor(x / voxel_size).astype(jnp.int32) - min_bx,
                  0, nx - 1)
    vy = jnp.clip(jnp.floor(y / voxel_size).astype(jnp.int32) - min_by,
                  0, ny - 1)
    return jnp.where(inb, vx * ny + vy, nx * ny), nx, ny


def bev_occupancy_bitmaps(xyz: Array, valid: Array, data_type: str = "64",
                          voxel_size: float = 0.5) -> Array:
    """(B, N, 3) points -> (B, nx*ny) bool per-cloud BEV occupancy."""
    pix, nx, ny = _cell_index(xyz, valid, data_type, voxel_size)

    def one(p):
        g = jnp.zeros((nx * ny + 1,), bool).at[p].set(True)
        return g[: nx * ny]

    return jax.vmap(one)(pix)


def pack_bitmaps(bits: Array) -> Array:
    """(B, G) bool -> (B, ceil(G/8)) uint8, MSB-first (np.unpackbits layout).

    The axon relay moves ~300 KB/s (PERF.md #7): a batch-125 bool bitmap
    readback is 5 MB (~17 s of pure transfer); packed it's 625 KB. This was
    most of DPM_QUALITY's ~5.9 s/batch solver-independent cost (VERDICT r3
    weak #3)."""
    b, g = bits.shape
    pad = (-g) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)  # MSB first
    return (bits.reshape(b, -1, 8).astype(jnp.uint8) * w).sum(
        axis=-1, dtype=jnp.uint8)


def unpack_bitmaps(packed: np.ndarray, n_cells: int) -> np.ndarray:
    """Host inverse of pack_bitmaps: (B, ceil(G/8)) uint8 -> (B, G) bool."""
    return np.unpackbits(np.asarray(packed, np.uint8), axis=1,
                         count=n_cells).astype(bool)


def bev_occupancy_packed(xyz: Array, valid: Array, data_type: str = "64",
                         voxel_size: float = 0.5) -> Array:
    """bev_occupancy_bitmaps with the relay-friendly packed readback."""
    return pack_bitmaps(bev_occupancy_bitmaps(xyz, valid, data_type,
                                              voxel_size))


def mmd_from_packed(ref_packed: np.ndarray, smp_packed: np.ndarray,
                    data_type: str = "64", voxel_size: float = 0.5) -> float:
    nx, ny, _, _ = _grid_dims(data_type, voxel_size)
    return mmd_from_bitmaps(unpack_bitmaps(ref_packed, nx * ny),
                            unpack_bitmaps(smp_packed, nx * ny),
                            data_type, voxel_size)


def bev_hist_accumulate(xyz: Array, valid: Array, data_type: str = "64",
                        voxel_size: float = 0.05) -> Array:
    """(B, N, 3) points -> (nx, ny) f32 sum over the batch of per-cloud
    occupancy (the JSD count histogram's batch contribution)."""
    pix, nx, ny = _cell_index(xyz, valid, data_type, voxel_size)

    def body(acc, p):
        occ = jnp.zeros((nx * ny + 1,), bool).at[p].set(True)
        return acc + occ[: nx * ny].astype(jnp.float32), 0.0

    acc, _ = jax.lax.scan(body, jnp.zeros((nx * ny,), jnp.float32), pix)
    return acc.reshape(nx, ny)


def jsd_from_hists(p: np.ndarray, q: np.ndarray) -> float:
    """compute_jsd's tail on pre-accumulated count histograms."""
    p = (p / p.sum()).ravel()
    q = (q / q.sum()).ravel()
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log(a[mask] / b[mask])))

    js = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return float(np.sqrt(max(js, 0.0)))


def _edt_from_bitmaps(bits: np.ndarray, nx: int, ny: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(N, nx*ny) bool -> (occ f32, squared EDT f32) as in
    metrics._occupancy_and_sq_edt (empty clouds get BIG everywhere)."""
    from scipy import ndimage

    occ = bits.astype(np.float32)
    sq = np.empty_like(occ)
    for i in range(bits.shape[0]):
        g = bits[i].reshape(nx, ny)
        if not g.any():
            occ[i] = 0.0
            sq[i] = BIG_SENTINEL
            continue
        d = ndimage.distance_transform_edt(~g, sampling=(1.0 / nx, 1.0 / ny))
        sq[i] = (d.astype(np.float32) ** 2).ravel()
    return occ, sq


def mmd_from_bitmaps(ref_bits: np.ndarray, smp_bits: np.ndarray,
                     data_type: str = "64", voxel_size: float = 0.5) -> float:
    """compute_mmd on device-computed occupancy bitmaps (host EDT + matmul)."""
    nx, ny, _, _ = _grid_dims(data_type, voxel_size)
    occ_r, sq_r = _edt_from_bitmaps(np.asarray(ref_bits), nx, ny)
    occ_s, sq_s = _edt_from_bitmaps(np.asarray(smp_bits), nx, ny)
    cnt_r = np.maximum(occ_r.sum(-1), 1.0)
    cnt_s = np.maximum(occ_s.sum(-1), 1.0)
    d_rs = (occ_r @ sq_s.T) / cnt_r[:, None]
    d_sr = (occ_s @ sq_r.T) / cnt_s[:, None]
    cd = 0.5 * (d_rs + d_sr.T)
    return float(np.mean(cd.min(axis=1)))


def compact_valid_points(xyz: Array, valid: Array, cap: int
                         ) -> Tuple[Array, Array]:
    """(N, 3) pixel-order points + validity -> (cap, 3) valid-first points and
    a (cap,) bool mask, matching the host feature path's convention
    (registry.build_feature_fn: host_range2pcd compacts valid points in pixel
    order, then the first ``cap`` are taken and pad rows are zero).

    A stable argsort of ``~valid`` keeps pixel order within the valid block,
    which is exactly host_range2pcd's compaction order."""
    order = jnp.argsort(~valid, stable=True)
    pts = jnp.take(xyz, order[:cap], axis=0)
    if pts.shape[0] < cap:  # fewer pixels than the point budget: zero-pad
        pts = jnp.pad(pts, ((0, cap - pts.shape[0]), (0, 0)))
    n = jnp.minimum(jnp.sum(valid), cap)
    mask = jnp.arange(cap) < n
    return pts * mask[:, None], mask


def voxel_feature_inputs(xyz: Array, valid: Array, cap: int,
                         voxel_size: float = 0.05
                         ) -> Tuple[Array, Array, Array, Array]:
    """Device twin of build_feature_fn's per-cloud voxel preprocessing
    (registry.py:142-159 / metric_utils.py:157-168): 0.05 m rounding,
    min-corner shift over the valid rows, feats = [xyz, -1].

    Returns (vox int32, pts f32, feats f32, mask bool), each fixed-shape
    (cap, ...)."""
    pts, mask = compact_valid_points(xyz, valid, cap)
    vox = jnp.round(pts / voxel_size)
    vmin = jnp.min(jnp.where(mask[:, None], vox, jnp.inf), axis=0)
    vox = (vox - jnp.where(jnp.isfinite(vmin), vmin, 0.0)) * mask[:, None]
    fts = jnp.concatenate([pts, -jnp.ones((cap, 1), pts.dtype)], axis=-1)
    return vox.astype(jnp.int32), pts, fts, mask


def make_voxel_descriptor_fn(mink_apply, spv_apply, geom, cap: int = 30000,
                             voxel_size: float = 0.05, group: int = 10):
    """Fused FSVD/FPVD featurization for the serving loop (VERDICT r4 #6).

    The host path (registry.build_feature_fn modalities 'voxel' /
    'point_voxel') loops clouds through separately-jitted programs with a
    ~35 ms relay round trip each; inside the generation program the same
    MinkowskiNet + SPVCNN forwards run per batch with zero extra readback
    beyond two (B, D) descriptor rows. ``mink_apply(vox, pts, fts, msk)`` and
    ``spv_apply(...)`` must reproduce registry.build_feature_fn's logits_fn
    (net.apply + depth_sector_descriptor).

    Structure: lax.scan over chunks of ``group`` clouds with vmap inside.
    A fully serialized scan (r5's first cut) left the sparse convs' tiny
    gather+matmul work starving the MXU — 19.9 s/batch of 50, 75% of the
    serving program; vmapping ``group`` clouds batches those GEMMs while a
    chunk's gather buffers (~27 x capacity x channels) stay bounded."""

    def one(xyz, valid):
        vox, pts, fts, msk = voxel_feature_inputs(xyz, valid, cap, voxel_size)
        return (mink_apply(vox, pts, fts, msk),
                spv_apply(vox, pts, fts, msk))

    def batch_fn(xyz_b: Array, valid_b: Array) -> Tuple[Array, Array]:
        b = xyz_b.shape[0]
        g = next(d for d in range(min(group, b), 0, -1) if b % d == 0)

        def body(c, inp):
            x, v = inp
            return c, jax.vmap(one)(x, v)

        xb = xyz_b.reshape(b // g, g, *xyz_b.shape[1:])
        vb = valid_b.reshape(b // g, g, *valid_b.shape[1:])
        _, (fsvd, fpvd) = jax.lax.scan(body, 0.0, (xb, vb))
        return (fsvd.reshape(b, fsvd.shape[-1]),
                fpvd.reshape(b, fpvd.shape[-1]))

    return batch_fn


def rangenet_input_from_model_imgs(imgs: Array, geom) -> Array:
    """Decoded model-space range images (B, H, W) -> the (B, H, W, 4)
    [metric depth, x, y, z] rangenet eval input (metric_utils.py:316-321).

    The host path (``preprocess_range_batch``) reprojects the decoded cloud
    and re-rasterizes; reprojected points sit exactly on pixel-floor
    boundaries, so that round trip only reshuffles points across adjacent
    pixels by float-ulp noise. Here the raster IS the decoded image, so the
    conversion is direct; within one evaluation both reference and sample
    sides must use the same path (this one or the host one)."""
    from ..ops import lidar as L

    def one(img):
        d = L.model_to_depth(img, geom, clamp=False)
        xyz, valid = L.range2xyz(img, geom, from_model_space=True)
        d = jnp.where(valid, d, -1.0)
        return jnp.concatenate([d[..., None], xyz], axis=-1)

    return jax.vmap(one)(imgs)
