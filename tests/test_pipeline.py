"""GenerationPipeline: the programmatic serving surface
(reference scripts/sample.py:266-303 as a library call)."""
import os

import numpy as np

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests",
                   "tiny_uncond.yaml")


def test_generate_shapes_and_clouds():
    from lidar_layout_tpu.pipeline import GenerationPipeline

    pipe = GenerationPipeline.from_config(CFG, steps=3)
    out = pipe.generate(3, seed=0, batch=2)
    h, w = pipe.geom.size
    assert out.images.shape == (3, h, w, out.images.shape[-1])
    assert np.isfinite(out.images).all()
    assert len(out.clouds) == 3
    for pc in out.clouds:
        assert pc.ndim == 2 and pc.shape[1] == 3
    assert out.samples_per_sec > 0


def test_program_cache_reused():
    from lidar_layout_tpu.pipeline import GenerationPipeline

    pipe = GenerationPipeline.from_config(CFG, steps=2)
    pipe.generate(2, batch=2)
    assert len(pipe._cache) == 1
    pipe.generate(2, batch=2)          # same key -> no new program
    assert len(pipe._cache) == 1
    pipe.generate(1, batch=2)          # b=1 -> new program
    assert len(pipe._cache) == 2


def test_from_run_dir_config_only(tmp_path):
    # a run dir with config.yaml but no ckpt/ loads fresh-init weights
    import shutil

    from lidar_layout_tpu.pipeline import GenerationPipeline

    shutil.copy(CFG, tmp_path / "config.yaml")
    pipe = GenerationPipeline.from_run_dir(str(tmp_path), steps=2)
    out = pipe.generate(1, batch=1)
    assert len(out.clouds) == 1


def test_geometry_from_config_defaults():
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, NUSCENES_GEOMETRY
    from lidar_layout_tpu.pipeline import geometry_from_config

    assert geometry_from_config({}, "64") is KITTI_GEOMETRY
    assert geometry_from_config({}, "32") is NUSCENES_GEOMETRY
    g = geometry_from_config(
        {"data": {"params": {"dataset": {"size": [32, 512],
                                         "fov": [10, -30]}}}})
    assert g.size == (32, 512) and g.fov == (10, -30)
