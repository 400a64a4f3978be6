"""Image degradation pipeline (reference lidm/modules/image_degradation +
lidm/data/base.py:37-49 dataset hook)."""
import numpy as np
import pytest

from lidar_layout_tpu.data.degradation import (degradation_bsrgan_light,
                                               degradation_bsrgan_variant,
                                               gaussian_kernel2d,
                                               make_degradation_transform,
                                               resize_image)


def test_resize_modes_shapes():
    img = np.random.default_rng(0).random((16, 64)).astype(np.float32)
    for mode in ("pil_nearest", "pil_bilinear", "pil_bicubic", "pil_box",
                 "pil_hamming", "pil_lanczos"):
        out = resize_image(img, (8, 16), mode)
        assert out.shape == (8, 16)
        assert np.isfinite(out).all()


def test_resize_nearest_exact_on_blocks():
    # 2x2 constant blocks survive nearest 2x downsample exactly
    base = np.arange(8 * 32, dtype=np.float32).reshape(8, 32)
    img = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    out = resize_image(img, (8, 32), "pil_nearest")
    assert np.array_equal(out, base)


def test_transform_factory_matches_reference_scaling():
    # base.py:38: scaled = img_size / scale_factors
    tf = make_degradation_transform((64, 1024), (2, 4), "pil_bilinear")
    out = tf(np.zeros((64, 1024, 1), np.float32))
    assert out.shape == (32, 256, 1)
    with pytest.raises(ValueError):
        make_degradation_transform((64, 1024), (2, 4), "nope")


def test_gaussian_kernel_normalized_and_anisotropic():
    k = gaussian_kernel2d(9, 1.0)
    assert k.shape == (9, 9) and abs(k.sum() - 1.0) < 1e-6
    assert np.allclose(k, k.T)  # isotropic => symmetric
    ka = gaussian_kernel2d(9, 3.0, 0.5, theta=0.0)
    # wider along x than y when theta=0
    assert ka[4, 0] > ka[0, 4]


def test_bsrgan_variant_contract():
    rng = np.random.default_rng(3)
    hq = np.clip(rng.random((32, 64)).astype(np.float32), 0, 1)
    out = degradation_bsrgan_variant(hq, sf=4, rng=np.random.default_rng(7))
    assert out["image"].shape == (8, 16)
    assert out["hq"].shape == (32, 64)
    assert out["image"].min() >= 0.0 and out["image"].max() <= 1.0
    # deterministic under a fixed generator
    out2 = degradation_bsrgan_variant(hq, sf=4, rng=np.random.default_rng(7))
    assert np.array_equal(out["image"], out2["image"])
    # degraded differs from a clean downsample
    clean = resize_image(hq, (8, 16), "pil_bilinear")
    assert np.abs(out["image"] - clean).mean() > 1e-3


def test_bsrgan_light_and_multichannel():
    hq = np.clip(np.random.default_rng(0).random((16, 32, 1)), 0, 1)
    out = degradation_bsrgan_light(hq, sf=2, rng=np.random.default_rng(1))
    assert out["image"].shape == (8, 16, 1)
    assert np.isfinite(out["image"]).all()


def test_dataset_attaches_degraded_image():
    from lidar_layout_tpu.data.datasets import RangeImageDataset

    ds = RangeImageDataset(None, batch_size=2, degradation="pil_nearest",
                           scale_factors=(2, 4))
    batch = next(ds.batches())
    h, w = ds.geom.size
    assert batch["degraded_image"].shape == (2, h // 2, w // 4, 1)
    assert batch["degraded_image"].dtype == np.float32
