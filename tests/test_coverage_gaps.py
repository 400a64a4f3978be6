"""Direct tests for modules previously covered only transitively:
nn/quantize (taming VectorQuantizer2 semantics), data/datasets (KITTI range
readers), eval/voxel_nets (fallback sparse feature net + descriptor)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lidar_layout_tpu.nn.quantize import VectorQuantizer, perplexity


class TestVectorQuantizer:
    def test_quantize_picks_nearest_code_and_straight_through(self):
        vq = VectorQuantizer(n_embed=16, embed_dim=4, beta=0.25)
        z = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 3, 5, 4)), jnp.float32)
        params = vq.init(jax.random.key(0), z)
        zq, loss, idx = vq.apply(params, z)
        assert zq.shape == z.shape and idx.shape == z.shape[:-1]

        # nearest-neighbour assignment against the actual codebook
        cb = jax.tree.leaves(params)[0]          # (n_embed, embed_dim)
        d = jnp.sum((z[..., None, :] - cb) ** 2, axis=-1)
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.asarray(jnp.argmin(d, axis=-1)))
        # straight-through: d zq / d z == identity (gradient passes through)
        g = jax.grad(lambda zz: vq.apply(params, zz)[0].sum())(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
        # codebook loss is non-negative scalar
        assert float(loss) >= 0.0

    def test_embed_code_roundtrip(self):
        vq = VectorQuantizer(n_embed=8, embed_dim=4)
        z = jnp.zeros((1, 2, 2, 4))
        params = vq.init(jax.random.key(1), z)
        zq, _, idx = vq.apply(params, z)
        cb = jax.tree.leaves(params)[0]
        np.testing.assert_allclose(
            np.asarray(vq.embed_code(cb, idx)), np.asarray(zq), atol=1e-6)

    def test_perplexity_uniform_vs_collapsed(self):
        u = jnp.arange(16, dtype=jnp.int32)        # all codes used once
        p_u, _ = perplexity(u, 16)
        c = jnp.zeros((16,), jnp.int32)            # collapsed to one code
        p_c, _ = perplexity(c, 16)
        assert float(p_u) > float(p_c)
        np.testing.assert_allclose(float(p_u), 16.0, rtol=1e-3)


class TestRangeImageDataset:
    def _make_kitti360(self, tmp_path, n_scans=3):
        seq = tmp_path / "data_3d_raw" / "2013_05_28_drive_0000_sync" \
            / "velodyne_points" / "data"
        os.makedirs(seq)
        rng = np.random.default_rng(0)
        for i in range(n_scans):
            pts = rng.uniform(-20, 20, (256, 4)).astype(np.float32)
            pts[:, 3] = rng.uniform(0, 1, 256)
            pts.tofile(seq / f"{i:010d}.bin")
        return str(tmp_path)

    def test_reads_and_projects_kitti360_bins(self, tmp_path):
        from lidar_layout_tpu.data.datasets import (RangeImageDataset,
                                                    list_kitti360_scans,
                                                    read_velodyne_bin)
        root = self._make_kitti360(tmp_path)
        scans = list_kitti360_scans(root, "train")
        assert len(scans) == 3
        pts = read_velodyne_bin(scans[0])
        assert pts.shape == (256, 4)

        ds = RangeImageDataset(root, dataset="kitti360", batch_size=2,
                               max_points=256)
        batch = next(ds.batches(shuffle=False, use_native=False))
        assert batch["image"].ndim == 4 and batch["image"].shape[0] == 2
        assert np.isfinite(batch["image"]).all()


class TestVoxelNetFallback:
    def test_forward_and_descriptor(self):
        from lidar_layout_tpu.eval.voxel_nets import (SparseVoxelNet,
                                                      VoxelNetConfig,
                                                      depth_sector_descriptor)
        cfg = VoxelNetConfig(channels=(8, 16), out_channels=5,
                             capacity=512)
        net = SparseVoxelNet(cfg)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-10, 10, (128, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((128, 4)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=128) < 0.9)
        params = net.init(jax.random.key(0), pts, feats, mask)
        out = net.apply(params, pts, feats, mask)
        logits = out[0] if isinstance(out, tuple) else out
        assert logits.shape[0] == 128
        assert np.isfinite(np.asarray(logits)).all()

        desc = depth_sector_descriptor(pts, logits, mask)
        assert np.isfinite(np.asarray(desc)).all()
        # masked-out points must not change the descriptor
        pts2 = pts.at[~mask].set(1e3)
        desc2 = depth_sector_descriptor(pts2, logits, mask)
        np.testing.assert_allclose(np.asarray(desc), np.asarray(desc2),
                                   atol=1e-5)
