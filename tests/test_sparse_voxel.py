"""Sparse voxel stack tests: grid ops, hierarchical VAE, cube diffusion."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_layout_tpu.models.cube_diffusion import (CubeDiffusion,
                                                    CubeDiffusionConfig,
                                                    SparseUNetConfig)
from lidar_layout_tpu.models.sparse_vae import (SparseVAE, SparseVAEConfig,
                                                struct_loss)
from lidar_layout_tpu.ops.voxel import (OFFSETS_27, VoxelGrid, build_grid,

                                        gather_neighbors, lookup,
                                        occupancy_targets, pool_to_parent,
                                        voxelize_points)

CFG = SparseVAEConfig(num_levels=3, base_capacity=512,
                      channels=(16, 32, 64), latent_dim=8, voxel_size=0.5)


def cloud(rng, n=600):
    pts = rng.uniform(0, 20, (n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[550:] = False
    return jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask)


class TestVoxelOps:
    def test_build_grid_dedups(self):
        coords = jnp.asarray([[1, 2, 3], [1, 2, 3], [4, 5, 6], [0, 0, 0]],
                             jnp.int32)
        mask = jnp.asarray([True, True, True, False])
        grid, p2v = build_grid(coords, mask, 8)
        assert int(np.asarray(grid.mask).sum()) == 2
        p2v = np.asarray(p2v)
        assert p2v[0] == p2v[1] and p2v[0] != p2v[2]

    def test_lookup_hit_and_miss(self):
        coords = jnp.asarray([[1, 1, 1], [2, 2, 2]], jnp.int32)
        grid, _ = build_grid(coords, jnp.asarray([True, True]), 4)
        idx, hit = lookup(grid, jnp.asarray([[1, 1, 1], [9, 9, 9]], jnp.int32))
        assert bool(np.asarray(hit)[0]) and not bool(np.asarray(hit)[1])
        np.testing.assert_array_equal(np.asarray(grid.coords)[np.asarray(idx)[0]],
                                      [1, 1, 1])

    def test_lookup_out_of_range_is_miss(self):
        # z_order_code clips coords to [0, 2^bits), so without an in-range
        # predicate a query at (-1,0,0) would alias onto voxel (0,0,0) and
        # submanifold stencils would double-count boundary voxels.
        coords = jnp.asarray([[0, 0, 0]], jnp.int32)
        grid, _ = build_grid(coords, jnp.asarray([True]), 4)
        queries = jnp.asarray(
            [[-1, 0, 0], [-2, 0, 0], [0, -1, 0], [0, 0, 1 << 10],
             [0, 0, 0]], jnp.int32)
        _, hit = lookup(grid, queries)
        np.testing.assert_array_equal(np.asarray(hit),
                                      [False, False, False, False, True])

    def test_count_unique_detects_overflow(self):
        from lidar_layout_tpu.ops.voxel import count_unique
        coords = jnp.asarray([[i, 0, 0] for i in range(6)] + [[0, 0, 0]],
                             jnp.int32)
        mask = jnp.ones(7, bool)
        n = int(count_unique(coords, mask))
        assert n == 6
        # a capacity-4 grid silently clips; count_unique is the loud check
        grid, _ = build_grid(coords, mask, 4)
        assert n > 4 and int(np.asarray(grid.mask).sum()) == 4

    def test_gather_neighbors_identity_center(self):
        coords = jnp.asarray([[5, 5, 5], [5, 5, 6]], jnp.int32)
        grid, _ = build_grid(coords, jnp.asarray([True, True]), 4)
        feats = jnp.zeros((4, 2)).at[:2].set(jnp.asarray([[1., 2.], [3., 4.]]))
        # reorder feats to grid order via lookup
        idx, _ = lookup(grid, coords)
        gfeats = jnp.zeros((4, 2)).at[idx].set(jnp.asarray([[1., 2.], [3., 4.]]))
        nb = np.asarray(gather_neighbors(grid, gfeats))
        center = 13  # offset (0,0,0) position in the 27-stencil
        np.testing.assert_allclose(nb[np.asarray(idx)[0], center], [1.0, 2.0])
        # the (0,0,1) neighbor of voxel A is voxel B
        off_z = int(np.argwhere((np.asarray(OFFSETS_27) == [0, 0, 1]).all(1))[0])
        np.testing.assert_allclose(nb[np.asarray(idx)[0], off_z], [3.0, 4.0])

    def test_pool_and_occupancy_targets(self):
        coords = jnp.asarray([[0, 0, 0], [1, 1, 1], [2, 2, 2]], jnp.int32)
        grid, _ = build_grid(coords, jnp.asarray([True] * 3), 4)
        feats = jnp.ones((4, 2))
        pgrid, pfeats, c2p = pool_to_parent(grid, feats, 4)
        # children (0,0,0),(1,1,1) share parent (0,0,0); (2,2,2) -> (1,1,1)
        assert int(np.asarray(pgrid.mask).sum()) == 2
        occ = np.asarray(occupancy_targets(pgrid, grid))
        assert occ.sum() == 3  # three existing children in total


@pytest.mark.slow
class TestSparseVAE:
    @pytest.fixture(scope="class")
    def vae_out(self):
        pts, feats, mask = cloud(np.random.default_rng(0))
        model = SparseVAE(CFG)
        params = model.init(jax.random.key(0), pts, feats, mask,
                            jax.random.key(1))
        out = model.apply(params, pts, feats, mask, jax.random.key(2))
        return model, params, out, (pts, feats, mask)

    def test_hierarchy_shapes(self, vae_out):
        _, _, out, _ = vae_out
        assert len(out["grids"]) == 3
        assert out["latent"].shape == (CFG.capacity(2), CFG.latent_dim)
        assert len(out["struct_logits"]) == 2
        # occupancy decreases with coarsening
        occs = [int(np.asarray(g.mask).sum()) for g in out["grids"]]
        assert occs[0] >= occs[1] >= occs[2] > 0

    def test_struct_loss_finite_and_trains(self, vae_out):
        model, params, out, (pts, feats, mask) = vae_out
        loss, logs = struct_loss(out)
        assert np.isfinite(float(loss))

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p, key):
            o = model.apply(p, pts, feats, mask, key)
            return struct_loss(o)[0]

        @jax.jit
        def step(p, o, key):
            l, g = jax.value_and_grad(loss_fn)(p, key)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        l0 = float(loss_fn(params, jax.random.key(3)))
        for i in range(20):
            params, opt, l = step(params, opt, jax.random.key(10 + i))
        assert float(l) < l0


@pytest.mark.slow
class TestCubeDiffusion:
    def test_train_and_sample(self):
        pts, feats, mask = cloud(np.random.default_rng(1))
        vae = SparseVAE(CFG)
        vp = vae.init(jax.random.key(0), pts, feats, mask, jax.random.key(1))
        out = vae.apply(vp, pts, feats, mask, jax.random.key(2))
        grid, z0 = out["latent_grid"], out["latent"]

        diff = CubeDiffusion(CubeDiffusionConfig(timesteps=64, latent_dim=8),
                             SparseUNetConfig(in_channels=8, model_channels=32,
                                              num_blocks=2, num_heads=2))
        dp = diff.init(jax.random.key(3), grid)
        loss, _ = diff.p_losses(dp, jax.random.key(4), grid, z0)
        assert np.isfinite(float(loss))

        z = diff.ddim_sample(dp, jax.random.key(5), grid, steps=4)
        assert z.shape == z0.shape
        zn = np.asarray(z)
        assert np.isfinite(zn).all()
        # masked voxels stay zero (skip when the grid is at full capacity)
        inv = ~np.asarray(grid.mask)
        if inv.any():
            assert np.abs(zn[inv]).max() == 0
