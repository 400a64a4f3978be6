"""Native C++ loader: build, read back synthetic velodyne files, prefetch."""
import os

import numpy as np
import pytest

from lidar_layout_tpu.data.native_loader import NativeScanLoader, build_native


@pytest.fixture(scope="module")
def bin_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("velodyne")
    rng = np.random.default_rng(0)
    paths, clouds = [], []
    for i in range(6):
        n = int(rng.integers(500, 1500))
        scan = rng.standard_normal((n, 4)).astype(np.float32)
        p = str(d / f"{i:06d}.bin")
        scan.tofile(p)
        paths.append(p)
        clouds.append(scan)
    return paths, clouds


def test_build():
    assert build_native() is not None


def test_roundtrip_and_padding(bin_files):
    paths, clouds = bin_files
    loader = NativeScanLoader(paths, max_points=2000, n_threads=2, prefetch=4)
    try:
        for i in range(len(paths)):
            loader.enqueue(i)
        got = {}
        for _ in range(len(paths)):
            idx, xyz, rem, nv = loader.next()
            got[idx] = (xyz, rem, nv)
        assert set(got) == set(range(len(paths)))
        for i, scan in enumerate(clouds):
            xyz, rem, nv = got[i]
            assert nv == len(scan)
            np.testing.assert_allclose(xyz[:nv], scan[:, :3], rtol=1e-6)
            np.testing.assert_allclose(rem[:nv], scan[:, 3], rtol=1e-6)
            assert (xyz[nv:] == 0).all()
    finally:
        loader.close()


def test_truncation(bin_files):
    paths, clouds = bin_files
    loader = NativeScanLoader(paths[:1], max_points=100, n_threads=1,
                              prefetch=2)
    try:
        loader.enqueue(0)
        idx, xyz, rem, nv = loader.next()
        assert nv == 100
        np.testing.assert_allclose(xyz, clouds[0][:100, :3], rtol=1e-6)
    finally:
        loader.close()
