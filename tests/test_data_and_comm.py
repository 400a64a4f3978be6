"""Data plumbing + collectives tests."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.data.conditional_builder import (Annotation,
                                                       ObjectsBoundingBoxBuilder,
                                                       ObjectsCenterPointsBuilder)
from lidar_layout_tpu.data.nuscenes_layout import (NuScenesLayoutDataset,
                                                   rescale_box, scale_box)
from lidar_layout_tpu.parallel.collectives import reduce_dict


class TestConditionalBuilder:
    def test_bbox_roundtrip(self):
        b = ObjectsBoundingBoxBuilder(num_classes=10, num_bins=64,
                                      no_max_objects=4)
        anns = [Annotation(3, (0.1, 0.2, 0.3, 0.4)),
                Annotation(7, (0.5, 0.5, 0.2, 0.1))]
        tokens = b.build(anns)
        assert tokens.shape == (20,)
        back = b.inverse_build(tokens)
        assert len(back) == 2
        assert back[0].category_id == 3
        np.testing.assert_allclose(back[0].bbox, anns[0].bbox, atol=1 / 63)

    def test_center_tokens(self):
        b = ObjectsCenterPointsBuilder(num_classes=10, num_bins=64,
                                       no_max_objects=3)
        tokens = b.build([Annotation(1, (0.0, 0.0, 0.2, 0.2))])
        assert tokens.shape == (9,)
        assert (tokens[3:] == b.none_token).all()


class TestNuScenesLayout:
    def test_scale_roundtrip(self):
        boxes = np.asarray([[10.0, -5.0, -1.0, 4.0, 2.0, 1.5, 0.3]])
        s = scale_box(boxes)
        assert s.shape == (2, 7)
        assert np.all(s[0] == -1)
        r = rescale_box(s.copy())
        np.testing.assert_allclose(r[1], boxes[0], rtol=1e-5, atol=1e-5)

    def test_reader_and_collate(self, tmp_path):
        # synthesize an infos pickle in the reference's schema
        rng = np.random.default_rng(0)
        infos = []
        for _ in range(3):
            k = int(rng.integers(2, 5))
            infos.append({"scene_graph": {
                "keep_box_names": [f"car" for _ in range(k)],
                "keep_box_relationships": [
                    [0, int(rng.integers(0, 4)), int(rng.integers(0, k))]
                    for _ in range(k)],
                "keep_box": rng.uniform(
                    [-40, -40, -3, 1, 1, 1, -3],
                    [40, 40, 2, 8, 3, 3, 3], (k, 7)).astype(np.float32),
            }})
        with open(tmp_path / "nuscenes_infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)

        ds = NuScenesLayoutDataset(str(tmp_path), "train", max_objs=8,
                                   max_triples=8)
        assert len(ds) == 3
        g = ds.collate([0, 1, 2])
        assert g["dec_objs"].shape == (24,)
        assert g["dec_triples"].shape == (24, 3)
        assert g["obj_mask"].sum() >= 3 * 3  # ego + >=2 objects per scene
        # the padded graph feeds the scene-graph encoder directly
        from lidar_layout_tpu.encoders.scene_graph import SceneGraphEncoder
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        enc = SceneGraphEncoder(num_objs=8, num_preds=16, embedding_dim=16)
        params = enc.init({"params": jax.random.key(0),
                           "change": jax.random.key(1)}, gj)
        latent, _ = enc.apply(params, gj, rngs={"change": jax.random.key(2)})
        assert np.isfinite(np.asarray(latent)).all()


class TestCollectives:
    def test_reduce_dict_under_shard_map(self):
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        x = jnp.arange(8.0)

        @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
        def f(xs):
            return reduce_dict({"m": xs.mean()}, "dp")["m"][None]

        out = f(x)
        assert float(out[0]) == pytest.approx(3.5)


class TestMemoryProbe:
    def test_meminfo_parses(self, tmp_path):
        from lidar_layout_tpu.utils.memory import available_gb, meminfo, total_gb
        p = tmp_path / "meminfo"
        p.write_text("MemTotal:       16000000 kB\n"
                     "MemFree:         4000000 kB\n"
                     "MemAvailable:    8388608 kB\n"
                     "Buffers:          100000 kB\n")
        info = meminfo(str(p))
        assert info["MemTotal"] == 16000000
        assert available_gb(str(p)) == pytest.approx(8.0)
        assert total_gb(str(p)) == pytest.approx(16000000 / 1024 / 1024)

    def test_fallback_without_memavailable(self, tmp_path):
        from lidar_layout_tpu.utils.memory import available_gb
        p = tmp_path / "meminfo"
        p.write_text("MemTotal: 8 kB\nMemFree: 1048576 kB\n"
                     "Buffers: 1048576 kB\nCached: 1048576 kB\n")
        assert available_gb(str(p)) == pytest.approx(3.0)
        assert available_gb(str(tmp_path / "missing")) == 0.0

    def test_clip_cache_gating(self, tmp_path):
        """cache_features=True keeps pickles resident; False never does."""
        infos = [{"scene_graph": {
            "keep_box_names": ["car"],
            "keep_box_relationships": [[0, 1, 1]],
            "keep_box": np.zeros((1, 7), np.float32),
        }}]
        with open(tmp_path / "nuscenes_infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)
        clip_dir = tmp_path / "train" / "CLIP" / "0000000"
        clip_dir.mkdir(parents=True)
        with open(clip_dir / "CLIP_0000000.pkl", "wb") as f:
            pickle.dump({"clip_obj_feats": np.ones((2, 512), np.float32),
                         "clip_rel_feats": np.ones((1, 512), np.float32)}, f)

        ds = NuScenesLayoutDataset(str(tmp_path), "train",
                                   cache_features=True)
        ds.scene(0)
        assert "0000000" in ds._feat_cache
        tf, _ = ds._load_clip_feats("0000000", 2, 1)  # served from cache
        assert tf[0, 0] == 1.0

        ds2 = NuScenesLayoutDataset(str(tmp_path), "train",
                                    cache_features=False)
        ds2.scene(0)
        assert not ds2._feat_cache
