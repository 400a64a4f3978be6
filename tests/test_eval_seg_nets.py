"""Weight-exact MinkowskiNet/SPVCNN tests (VERDICT r1 #5).

- Sparse-conv kernels checked against torch DENSE conv3d at active sites
  (zero features at inactive voxels make submanifold == dense there) — the
  same grad-equivalence idea as pointops2's test_*.py scripts, without
  needing torchsparse.
- Conversion coverage: a template state_dict with the reference's exact
  names/shapes converts onto the flax modules leaf-for-leaf and every torch
  key is consumed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lidar_layout_tpu.eval.sparse_seg_nets import (
    _K2, _K3, LAYER_NUM, MinkowskiNet, SPVCNN, SegNetConfig, TSConv3d,
    convert_torchsparse_state_dict, make_template_state_dict)
from lidar_layout_tpu.ops.voxel import build_grid

TINY = SegNetConfig(input_dims=4, cr=0.25, num_class=5, capacity=1024,
                    bits=6)


def active_grid(rng, n=300, extent=12):
    coords = rng.integers(1, extent - 1, (n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    mask = np.ones(len(coords), bool)
    pad = 512 - len(coords)
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    mask = np.concatenate([mask, np.zeros(pad, bool)])
    grid, _ = build_grid(jnp.asarray(coords), jnp.asarray(mask), 512, bits=6)
    return grid, extent


class TestKernelEquivalence:
    def test_submanifold_conv3_matches_dense_torch(self):
        rng = np.random.default_rng(0)
        grid, D = active_grid(rng)
        cin, cout = 6, 8
        feats = rng.standard_normal((512, cin)).astype(np.float32)
        feats[~np.asarray(grid.mask)] = 0.0

        conv = TSConv3d(cout, 3, bits=6)
        params = conv.init(jax.random.key(0), grid, jnp.asarray(feats))
        out = np.asarray(conv.apply(params, grid, jnp.asarray(feats)))

        # dense torch reference
        w = np.asarray(params["params"]["kernel"])  # (27, cin, cout)
        wt = np.zeros((cout, cin, 3, 3, 3), np.float32)
        for k, (ox, oy, oz) in enumerate(np.asarray(_K3)):
            wt[:, :, ox + 1, oy + 1, oz + 1] = w[k].T
        vol = np.zeros((1, cin, D, D, D), np.float32)
        c = np.asarray(grid.coords)[np.asarray(grid.mask)]
        f = feats[np.asarray(grid.mask)]
        vol[0, :, c[:, 0], c[:, 1], c[:, 2]] = f
        dense = torch.nn.functional.conv3d(
            torch.from_numpy(vol), torch.from_numpy(wt), padding=1).numpy()
        want = dense[0, :, c[:, 0], c[:, 1], c[:, 2]]
        np.testing.assert_allclose(out[np.asarray(grid.mask)], want,
                                   rtol=1e-4, atol=1e-4)

    def test_stride2_down_matches_dense_torch(self):
        rng = np.random.default_rng(1)
        grid, D = active_grid(rng)
        cin, cout = 5, 7
        feats = rng.standard_normal((512, cin)).astype(np.float32)
        feats[~np.asarray(grid.mask)] = 0.0
        parent, _ = build_grid(grid.coords >> 1, grid.mask, 256, bits=6)

        conv = TSConv3d(cout, 2, 2, bits=6)
        params = conv.init(jax.random.key(0), grid, jnp.asarray(feats),
                           parent)
        out = np.asarray(conv.apply(params, grid, jnp.asarray(feats), parent))

        w = np.asarray(params["params"]["kernel"])  # (8, cin, cout)
        wt = np.zeros((cout, cin, 2, 2, 2), np.float32)
        for k, (ox, oy, oz) in enumerate(np.asarray(_K2)):
            wt[:, :, ox, oy, oz] = w[k].T
        vol = np.zeros((1, cin, D, D, D), np.float32)
        c = np.asarray(grid.coords)[np.asarray(grid.mask)]
        vol[0, :, c[:, 0], c[:, 1], c[:, 2]] = \
            feats[np.asarray(grid.mask)]
        dense = torch.nn.functional.conv3d(
            torch.from_numpy(vol), torch.from_numpy(wt), stride=2).numpy()
        pm = np.asarray(parent.mask)
        pc = np.asarray(parent.coords)[pm]
        want = dense[0, :, pc[:, 0], pc[:, 1], pc[:, 2]]
        np.testing.assert_allclose(out[pm], want, rtol=1e-4, atol=1e-4)

    def test_transposed_up_matches_dense_torch(self):
        rng = np.random.default_rng(2)
        grid, D = active_grid(rng)
        parent, _ = build_grid(grid.coords >> 1, grid.mask, 256, bits=6)
        cin, cout = 7, 5
        pfeats = rng.standard_normal((256, cin)).astype(np.float32)
        pfeats[~np.asarray(parent.mask)] = 0.0

        conv = TSConv3d(cout, 2, 2, transposed=True, bits=6)
        params = conv.init(jax.random.key(0), parent, jnp.asarray(pfeats),
                           grid)
        out = np.asarray(conv.apply(params, parent, jnp.asarray(pfeats),
                                    grid))

        w = np.asarray(params["params"]["kernel"])  # (8, cin, cout)
        wt = np.zeros((cin, cout, 2, 2, 2), np.float32)
        for k, (ox, oy, oz) in enumerate(np.asarray(_K2)):
            wt[:, :, ox, oy, oz] = w[k]
        Dp = D // 2 + 1
        vol = np.zeros((1, cin, Dp, Dp, Dp), np.float32)
        pm = np.asarray(parent.mask)
        pc = np.asarray(parent.coords)[pm]
        vol[0, :, pc[:, 0], pc[:, 1], pc[:, 2]] = pfeats[pm]
        dense = torch.nn.functional.conv_transpose3d(
            torch.from_numpy(vol), torch.from_numpy(wt), stride=2).numpy()
        m = np.asarray(grid.mask)
        c = np.asarray(grid.coords)[m]
        want = dense[0, :, c[:, 0], c[:, 1], c[:, 2]]
        np.testing.assert_allclose(out[m], want, rtol=1e-4, atol=1e-4)


def tiny_cloud(rng, n=400):
    pts = rng.integers(0, 40, (n, 3)).astype(np.float32)
    feats = np.concatenate(
        [pts * 0.05, -np.ones((n, 1), np.float32)], 1)
    mask = np.ones(n, bool)
    mask[380:] = False
    return jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask)


class TestConversion:
    @pytest.mark.parametrize("arch", ["minkowskinet", "spvcnn"])
    def test_template_state_dict_converts_leaf_for_leaf(self, arch):
        rng = np.random.default_rng(0)
        sd = make_template_state_dict(TINY, arch, rng)
        converted = convert_torchsparse_state_dict(sd, TINY, arch)

        net = (MinkowskiNet if arch == "minkowskinet" else SPVCNN)(TINY)
        pts, feats, mask = tiny_cloud(rng)
        ref_params = net.init(jax.random.key(0), pts.astype(jnp.int32), feats,
                              mask, return_final_logits=False)

        ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref_params)
        got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), converted)
        assert jax.tree_util.tree_structure(ref_shapes) == \
            jax.tree_util.tree_structure(got_shapes)
        assert ref_shapes == got_shapes

        out = net.apply(converted, pts.astype(jnp.int32), feats, mask,
                        return_final_logits=True)
        logits = np.asarray(out["logits"])
        assert np.isfinite(logits).all()
        assert np.abs(logits[np.asarray(out["mask"])]).sum() > 0

    def test_all_torch_keys_consumed(self):
        """Every key of the reference state_dict participates in conversion
        (no silently dropped weights)."""
        rng = np.random.default_rng(1)
        sd = make_template_state_dict(TINY, "spvcnn", rng)
        seen = set()

        class Tracker(dict):
            def __getitem__(self, k):
                seen.add(k)
                return sd[k]

            def __contains__(self, k):
                return k in sd

        convert_torchsparse_state_dict(Tracker(), TINY, "spvcnn")
        missing = set(sd) - seen
        # num_batches_tracked-style keys don't exist in the template
        assert not missing, f"unconsumed reference weights: {missing}"


class TestEndToEnd:
    def test_descriptor_dim_contract(self):
        """FSVD/FPVD descriptors = 16 depth sectors x final channels; the
        published 768-dim comes from cr=0.5 -> cs[8]=48."""
        cfg = SegNetConfig(cr=0.5)
        assert cfg.cs[8] * 16 == 768

    def test_minkowski_final_logits_voxelwise(self):
        rng = np.random.default_rng(3)
        net = MinkowskiNet(TINY)
        pts, feats, mask = tiny_cloud(rng)
        p = net.init(jax.random.key(0), pts.astype(jnp.int32), feats, mask)
        out = net.apply(p, pts.astype(jnp.int32), feats, mask)
        assert out["logits"].shape[-1] == TINY.cs[8]
        assert np.isfinite(np.asarray(out["logits"])).all()

    def test_spvcnn_final_logits_pointwise(self):
        rng = np.random.default_rng(4)
        net = SPVCNN(TINY)
        pts, feats, mask = tiny_cloud(rng)
        p = net.init(jax.random.key(0), pts.astype(jnp.int32), feats, mask)
        out = net.apply(p, pts.astype(jnp.int32), feats, mask)
        # per-point logits (spvcnn returns z3 at point coords)
        assert out["logits"].shape[0] == pts.shape[0]
        assert out["logits"].shape[-1] == TINY.cs[8]
        masked = np.asarray(out["logits"])[~np.asarray(mask)]
        assert np.abs(masked).max() == 0
