"""Device-side FSVD/FPVD featurization (eval.device_metrics) equals the host
feature path (eval.registry.build_feature_fn) on the same clouds.

The serving gate fuses MinkowskiNet/SPVCNN descriptor extraction into the
generation program (VERDICT r4 #6); these tests pin that the fused path is the
SAME measurement: identical preprocessing (compaction order, cap truncation,
min-corner shift, [xyz, -1] feats) and identical descriptors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.eval.device_metrics import (compact_valid_points,
                                                  make_voxel_descriptor_fn,
                                                  voxel_feature_inputs)
from lidar_layout_tpu.eval.registry import (build_feature_fn,
                                            build_voxel_feature_net)
from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY


def _clouds(n, n_pts, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform((-40, -40, -2), (40, 40, 1),
                        (n_pts, 3)).astype(np.float32) for _ in range(n)]


def test_compact_valid_points_matches_host_compaction():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    valid = rng.random(64) < 0.6
    cap = 24
    pts, mask = jax.jit(compact_valid_points, static_argnums=2)(
        jnp.asarray(xyz), jnp.asarray(valid), cap)
    host = xyz[valid][:cap]
    n = len(host)
    np.testing.assert_allclose(np.asarray(pts)[:n], host, rtol=0, atol=0)
    assert np.asarray(mask).sum() == n
    np.testing.assert_array_equal(np.asarray(pts)[n:], 0.0)


def test_voxel_inputs_match_host_preprocessing():
    cloud = _clouds(1, 500)[0]
    cap = 400  # force truncation
    vox_d, pts_d, fts_d, msk_d = jax.jit(
        voxel_feature_inputs, static_argnums=2)(
        jnp.asarray(cloud), jnp.ones((500,), bool), cap)
    # host twin (registry.py feature_fn preprocessing)
    n = min(len(cloud), cap)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = cloud[:n]
    vox = np.round(pts / 0.05)
    vox -= vox[:n].min(0, keepdims=True)
    fts = np.concatenate([pts, -np.ones((cap, 1), np.float32)], -1)
    np.testing.assert_array_equal(np.asarray(msk_d), np.arange(cap) < n)
    np.testing.assert_allclose(np.asarray(pts_d), pts, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fts_d), fts, atol=1e-6)
    # host pad rows (zeros) shift by the same min; device zeroes them — both
    # are masked out downstream, so compare valid rows only
    np.testing.assert_allclose(np.asarray(vox_d)[:n], vox[:n], atol=0)


@pytest.mark.slow
@pytest.mark.parametrize("modality", ["voxel", "point_voxel"])
def test_device_descriptor_equals_host_feature_fn(modality):
    cap = 2048
    clouds = _clouds(3, 1500, seed=11)
    host_fn = build_feature_fn("64", modality, max_points=cap)
    host = host_fn(clouds)

    apply_fn = build_voxel_feature_net("64", modality, max_points=cap)
    assert apply_fn.param_hash == host_fn.param_hash

    @jax.jit
    def dev(xyz, valid):
        vox, pts, fts, msk = voxel_feature_inputs(xyz, valid, cap)
        return apply_fn(vox, pts, fts, msk)

    for i, c in enumerate(clouds):
        got = np.asarray(dev(jnp.asarray(c), jnp.ones((len(c),), bool)))
        np.testing.assert_allclose(got, host[i], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_batched_descriptor_fn_shapes():
    cap = 512
    mink = build_voxel_feature_net("64", "voxel", max_points=cap)
    spv = build_voxel_feature_net("64", "point_voxel", max_points=cap)
    fn = make_voxel_descriptor_fn(mink, spv, KITTI_GEOMETRY, cap=cap)
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.uniform(-30, 30, (2, 800, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((2, 800)) < 0.7)
    fsvd, fpvd = jax.jit(fn)(xyz, valid)
    assert fsvd.shape[0] == 2 and fpvd.shape[0] == 2
    assert fsvd.shape[1] == fpvd.shape[1] == 768  # 48 logits x 16 sectors
    assert np.isfinite(np.asarray(fsvd)).all()
    assert np.isfinite(np.asarray(fpvd)).all()
