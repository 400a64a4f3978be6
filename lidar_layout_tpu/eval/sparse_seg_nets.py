"""Weight-exact MinkowskiNet / SPVCNN feature extractors for FSVD/FPVD.

Parity: ``lidm/modules/minkowskinet/model.py`` and ``lidm/modules/spvcnn/
model.py`` with ``lidm/modules/ts/basic_blocks.py`` — the EXACT reference
architectures (stem, 4 down stages of BasicConvolutionBlock + 2 ResidualBlocks,
4 up stages of deconv + skip-concat + 2 ResidualBlocks, classifier; SPVCNN adds
the three point_transforms and voxel<->point interpolation), so the reference's
pretrained torchsparse checkpoints convert onto these modules parameter by
parameter (see ``convert_torchsparse_state_dict``).

TPU-native formulation: fixed-capacity sorted-code voxel tables (ops.voxel);
a sparse conv is K neighbor gathers + one (N, K*Cin) x (K*Cin, Cout) matmul —
the MXU contraction. BatchNorms run in eval mode from converted running stats
(these nets are frozen feature extractors; eval/__init__.py:39-62).

Kernel-offset ordering matches torchsparse v1.4 ``get_kernel_offsets``:
odd kernels enumerate z-slowest/x-fastest, even kernels x-slowest/z-fastest —
the converter depends on this layout (documented there).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.voxel import VoxelGrid, build_grid, lookup

Array = jax.Array

# torchsparse v1.4 kernel offset orders (nn/utils/kernel.py get_kernel_offsets)
_K3 = np.array([[x, y, z] for z in (-1, 0, 1) for y in (-1, 0, 1)
                for x in (-1, 0, 1)], np.int32)          # odd: z slowest
_K2 = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                for z in (0, 1)], np.int32)              # even: x slowest

LAYER_NUM = (32, 32, 64, 128, 256, 256, 128, 96, 96)    # reference layer_num


def _gather_offsets(grid: VoxelGrid, feats: Array, offsets: np.ndarray,
                    bits: int) -> Array:
    """(cap, C) -> (cap, K, C): neighbor features in the given offset order,
    zeros at misses/padding."""
    offs = jnp.asarray(offsets)

    def one(off):
        idx, hit = lookup(grid, grid.coords + off[None, :], bits)
        ok = hit & grid.mask & grid.mask[idx]
        return jnp.where(ok[:, None], feats[idx], 0.0)

    return jnp.stack([one(offs[k]) for k in range(len(offsets))], axis=1)


class BatchNormEval(nn.Module):
    """Frozen BatchNorm: params carry converted running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * scale * jax.lax.rsqrt(var + self.eps) + bias


class TSConv3d(nn.Module):
    """torchsparse v1.4 Conv3d equivalent over a fixed-capacity grid.

    kernel param shape (K^3, Cin, Cout) for ks>1, (Cin, Cout) for ks==1 —
    the torchsparse weight layout, so conversion is a straight copy.
    Modes: ks3/s1 (submanifold), ks1/s1, ks2/s2 down, ks2/s2 transposed up.
    """

    features: int
    ks: int = 3
    stride: int = 1
    transposed: bool = False
    bits: int = 10

    @nn.compact
    def __call__(self, grid: VoxelGrid, x: Array,
                 out_grid: Optional[VoxelGrid] = None) -> Array:
        cin = x.shape[-1]
        if self.ks == 1:
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (cin, self.features))
            return (x @ w) * grid.mask[:, None]

        K = self.ks ** 3
        w = self.param(
            "kernel",
            lambda key, shape: nn.initializers.lecun_normal()(
                key, (shape[0] * shape[1], shape[2])).reshape(shape),
            (K, cin, self.features))

        if self.ks == 3 and self.stride == 1 and not self.transposed:
            nb = _gather_offsets(grid, x, _K3, self.bits)    # (cap, 27, C)
            out = nb.reshape(-1, K * cin) @ w.reshape(K * cin, self.features)
            return out * grid.mask[:, None]

        if self.ks == 2 and self.stride == 2 and not self.transposed:
            assert out_grid is not None, "stride-2 conv needs the parent grid"
            # out[p] = sum_o W[o] @ x[2p + o]
            parts = []
            for k in range(8):
                q = out_grid.coords * 2 + jnp.asarray(_K2[k])[None, :]
                idx, hit = lookup(grid, q, self.bits)
                ok = hit & out_grid.mask & grid.mask[idx]
                parts.append(jnp.where(ok[:, None], x[idx], 0.0) @ w[k])
            out = sum(parts)
            return out * out_grid.mask[:, None]

        if self.ks == 2 and self.stride == 2 and self.transposed:
            assert out_grid is not None, "deconv needs the target fine grid"
            # out[f] = x[f >> 1] @ W[offset_index(f & 1)]
            pidx, phit = lookup(grid, out_grid.coords >> 1, self.bits)
            ok = phit & out_grid.mask & grid.mask[pidx]
            xp = jnp.where(ok[:, None], x[pidx], 0.0)
            f = out_grid.coords & 1
            kidx = f[:, 0] * 4 + f[:, 1] * 2 + f[:, 2]      # _K2 order
            outs = jnp.stack([xp @ w[k] for k in range(8)], axis=1)
            out = jnp.take_along_axis(outs, kidx[:, None, None], axis=1)[:, 0]
            return out * out_grid.mask[:, None]

        raise NotImplementedError((self.ks, self.stride, self.transposed))


class BasicConvolutionBlock(nn.Module):
    """conv-bn-relu (ts/basic_blocks.py:12-26)."""

    features: int
    ks: int = 3
    stride: int = 1
    bits: int = 10

    @nn.compact
    def __call__(self, grid, x, out_grid=None):
        g = out_grid if out_grid is not None else grid
        h = TSConv3d(self.features, self.ks, self.stride, bits=self.bits,
                     name="conv")(grid, x, out_grid)
        h = BatchNormEval(self.features, name="bn")(h)
        return nn.relu(h) * g.mask[:, None]


class BasicDeconvolutionBlock(nn.Module):
    """transposed conv-bn-relu (ts/basic_blocks.py:29-43)."""

    features: int
    ks: int = 2
    bits: int = 10

    @nn.compact
    def __call__(self, grid, x, out_grid):
        h = TSConv3d(self.features, self.ks, 2, transposed=True,
                     bits=self.bits, name="conv")(grid, x, out_grid)
        h = BatchNormEval(self.features, name="bn")(h)
        return nn.relu(h) * out_grid.mask[:, None]


class ResidualBlock(nn.Module):
    """conv-bn-relu-conv-bn (+1x1 conv-bn shortcut) + relu
    (ts/basic_blocks.py:46-74)."""

    features: int
    bits: int = 10

    @nn.compact
    def __call__(self, grid, x):
        cin = x.shape[-1]
        h = TSConv3d(self.features, 3, bits=self.bits, name="conv0")(grid, x)
        h = BatchNormEval(self.features, name="bn0")(h)
        h = nn.relu(h)
        h = TSConv3d(self.features, 3, bits=self.bits, name="conv1")(grid, h)
        h = BatchNormEval(self.features, name="bn1")(h)
        if cin != self.features:
            s = TSConv3d(self.features, 1, bits=self.bits,
                         name="down_conv")(grid, x)
            s = BatchNormEval(self.features, name="down_bn")(s)
        else:
            s = x
        return nn.relu(h + s) * grid.mask[:, None]


@dataclasses.dataclass(frozen=True)
class SegNetConfig:
    """model_params of the eval config.yaml (eval/__init__.py build_model)."""

    input_dims: int = 4
    cr: float = 1.0
    layer_num: Tuple[int, ...] = LAYER_NUM
    num_class: int = 19
    voxel_size: float = 0.05
    capacity: int = 65536        # finest-level voxel capacity
    bits: int = 10

    @property
    def cs(self) -> Tuple[int, ...]:
        return tuple(int(self.cr * x) for x in self.layer_num)


def _build_pyramid(coords: Array, mask: Array, cfg: SegNetConfig
                   ) -> List[Tuple[VoxelGrid, Array]]:
    """5-level grid pyramid (L0..L4); returns [(grid, point2voxel/None)]."""
    grids = []
    g0, p2v = build_grid(coords, mask, cfg.capacity, cfg.bits)
    grids.append((g0, p2v))
    g = g0
    for lvl in range(1, 5):
        cap = max(cfg.capacity >> lvl, 64)
        g, _ = build_grid(g.coords >> 1, g.mask, cap, cfg.bits)
        grids.append((g, None))
    return grids


class MinkowskiNet(nn.Module):
    """Exact reference MinkowskiNet (minkowskinet/model.py:13-142)."""

    cfg: SegNetConfig

    @nn.compact
    def __call__(self, coords: Array, feats: Array, mask: Array,
                 return_final_logits: bool = True):
        cfg = self.cfg
        cs = cfg.cs
        b = cfg.bits
        pyr = _build_pyramid(coords, mask, cfg)
        (g0, p2v) = pyr[0]
        grids = [g for g, _ in pyr]

        # scatter point feats onto the finest grid (mean per voxel)
        w = mask.astype(feats.dtype)
        num = jnp.zeros((cfg.capacity, feats.shape[-1])).at[p2v].add(
            feats * w[:, None])
        den = jnp.zeros((cfg.capacity,)).at[p2v].add(w)
        x = num / jnp.maximum(den, 1.0)[:, None]

        # stem: conv3-bn-relu x2
        x = TSConv3d(cs[0], 3, bits=b, name="stem0")(g0, x)
        x = nn.relu(BatchNormEval(cs[0], name="stem_bn0")(x))
        x = TSConv3d(cs[0], 3, bits=b, name="stem1")(g0, x)
        x0 = nn.relu(BatchNormEval(cs[0], name="stem_bn1")(x)) \
            * g0.mask[:, None]

        skips = [x0]
        x_cur = x0
        for s in range(4):
            gi, go = grids[s], grids[s + 1]
            x_cur = BasicConvolutionBlock(cs[s], 2, 2, bits=b,
                                          name=f"stage{s+1}_down")(
                gi, x_cur, go)
            x_cur = ResidualBlock(cs[s + 1], bits=b,
                                  name=f"stage{s+1}_res0")(go, x_cur)
            x_cur = ResidualBlock(cs[s + 1], bits=b,
                                  name=f"stage{s+1}_res1")(go, x_cur)
            skips.append(x_cur)

        y = x_cur  # level 4
        for u in range(4):
            lvl = 3 - u
            fine = grids[lvl]
            y = BasicDeconvolutionBlock(cs[5 + u], bits=b,
                                        name=f"up{u+1}_deconv")(
                grids[lvl + 1], y, fine)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res0")(fine, y)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res1")(fine, y)

        if return_final_logits:
            return {"logits": y, "coords": grids[0].coords,
                    "mask": grids[0].mask}
        out = nn.Dense(cfg.num_class, name="classifier")(y)
        return {"logits": out, "coords": grids[0].coords,
                "mask": grids[0].mask}


def _voxel_to_point(grid: VoxelGrid, vox_feats: Array, pts_base: Array,
                    level: int, bits: int) -> Array:
    """Trilinear devoxelize (torchsparse ts/utils.py voxel_to_point,
    nearest=False): interpolate level-``level`` voxel features at base-res
    point coords. Grid coords at level L are base coords >> L."""
    s = float(1 << level)
    pf = pts_base / s
    base = jnp.floor(pf).astype(jnp.int32)
    frac = pf - base

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = base + jnp.asarray([dx, dy, dz])[None, :]
                idx, hit = lookup(grid, corner, bits)
                wgt = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                       * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                       * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
                ok = hit & grid.mask[idx]
                out = out + jnp.where(ok, wgt, 0.0)[:, None] * vox_feats[idx]
    return out


def _point_to_voxel(grid: VoxelGrid, pts_base: Array, pt_feats: Array,
                    pt_mask: Array, level: int, bits: int) -> Array:
    """Scatter-mean point features onto an existing level-L grid
    (torchsparse point_to_voxel)."""
    coords = (pts_base.astype(jnp.int32) >> level)
    idx, hit = lookup(grid, coords, bits)
    ok = hit & pt_mask
    cap = grid.coords.shape[0]
    w = ok.astype(pt_feats.dtype)
    num = jnp.zeros((cap, pt_feats.shape[-1])).at[idx].add(
        pt_feats * w[:, None])
    den = jnp.zeros((cap,)).at[idx].add(w)
    return (num / jnp.maximum(den, 1.0)[:, None]) * grid.mask[:, None]


class PointTransform(nn.Module):
    """Linear-bn-relu point branch (spvcnn/model.py:95-110)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.features, name="linear")(x)
        h = BatchNormEval(self.features, name="bn")(h)
        return nn.relu(h)


class SPVCNN(nn.Module):
    """Exact reference SPVCNN (spvcnn/model.py:13-179): MinkowskiNet voxel
    trunk + trilinear point branch with three point_transforms."""

    cfg: SegNetConfig

    @nn.compact
    def __call__(self, coords: Array, feats: Array, mask: Array,
                 return_final_logits: bool = True):
        cfg = self.cfg
        cs = cfg.cs
        b = cfg.bits
        pyr = _build_pyramid(coords, mask, cfg)
        (g0, p2v) = pyr[0]
        grids = [g for g, _ in pyr]
        pts_base = coords.astype(jnp.float32)

        w = mask.astype(feats.dtype)
        num = jnp.zeros((cfg.capacity, feats.shape[-1])).at[p2v].add(
            feats * w[:, None])
        den = jnp.zeros((cfg.capacity,)).at[p2v].add(w)
        x = num / jnp.maximum(den, 1.0)[:, None]

        x = TSConv3d(cs[0], 3, bits=b, name="stem0")(g0, x)
        x = nn.relu(BatchNormEval(cs[0], name="stem_bn0")(x))
        x = TSConv3d(cs[0], 3, bits=b, name="stem1")(g0, x)
        x0 = nn.relu(BatchNormEval(cs[0], name="stem_bn1")(x)) \
            * g0.mask[:, None]

        # z0: stem features at the points (level 0 trilinear)
        z0 = _voxel_to_point(g0, x0, pts_base, 0, b) * w[:, None]

        # stage trunk starts from the re-voxelized point branch (model.py
        # x1 = point_to_voxel(x0, z0)) but up4 concatenates the STEM x0
        x_cur = _point_to_voxel(g0, pts_base, z0, mask, 0, b)
        skips = [x0]
        for s in range(4):
            gi, go = grids[s], grids[s + 1]
            x_cur = BasicConvolutionBlock(cs[s], 2, 2, bits=b,
                                          name=f"stage{s+1}_down")(
                gi, x_cur, go)
            x_cur = ResidualBlock(cs[s + 1], bits=b,
                                  name=f"stage{s+1}_res0")(go, x_cur)
            x_cur = ResidualBlock(cs[s + 1], bits=b,
                                  name=f"stage{s+1}_res1")(go, x_cur)
            skips.append(x_cur)

        z1 = _voxel_to_point(grids[4], x_cur, pts_base, 4, b)
        z1 = (z1 + PointTransform(cs[4], name="pt0")(z0)) * w[:, None]

        y = _point_to_voxel(grids[4], pts_base, z1, mask, 4, b)
        for u in range(2):
            lvl = 3 - u
            fine = grids[lvl]
            y = BasicDeconvolutionBlock(cs[5 + u], bits=b,
                                        name=f"up{u+1}_deconv")(
                grids[lvl + 1], y, fine)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res0")(fine, y)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res1")(fine, y)

        z2 = _voxel_to_point(grids[2], y, pts_base, 2, b)
        z2 = (z2 + PointTransform(cs[6], name="pt1")(z1)) * w[:, None]

        y = _point_to_voxel(grids[2], pts_base, z2, mask, 2, b)
        for u in (2, 3):
            lvl = 3 - u
            fine = grids[lvl]
            y = BasicDeconvolutionBlock(cs[5 + u], bits=b,
                                        name=f"up{u+1}_deconv")(
                grids[lvl + 1], y, fine)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res0")(fine, y)
            y = ResidualBlock(cs[5 + u], bits=b, name=f"up{u+1}_res1")(fine, y)

        z3 = _voxel_to_point(grids[0], y, pts_base, 0, b)
        z3 = (z3 + PointTransform(cs[8], name="pt2")(z2)) * w[:, None]

        if return_final_logits:
            # per-POINT logits (spvcnn returns z3.F with point coords)
            return {"logits": z3, "coords": coords, "mask": mask}
        out = nn.Dense(cfg.num_class, name="classifier")(z3)
        return {"logits": out, "coords": coords, "mask": mask}


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------

def _bn(sd: Dict[str, Any], pfx: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{pfx}.weight"]),
            "bias": np.asarray(sd[f"{pfx}.bias"]),
            "mean": np.asarray(sd[f"{pfx}.running_mean"]),
            "var": np.asarray(sd[f"{pfx}.running_var"])}


def _conv(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[key])
    # torchsparse v1.4 stores (K, Cin, Cout) for K>1 and (Cin, Cout) for 1^3
    return {"kernel": w}


def _res(sd: Dict[str, Any], pfx: str, has_down: bool) -> Dict[str, Any]:
    out = {"conv0": _conv(sd, f"{pfx}.net.0.kernel"),
           "bn0": _bn(sd, f"{pfx}.net.1"),
           "conv1": _conv(sd, f"{pfx}.net.3.kernel"),
           "bn1": _bn(sd, f"{pfx}.net.4")}
    if has_down:
        out["down_conv"] = _conv(sd, f"{pfx}.downsample.0.kernel")
        out["down_bn"] = _bn(sd, f"{pfx}.downsample.1")
    return out


def convert_torchsparse_state_dict(sd: Dict[str, Any], cfg: SegNetConfig,
                                   arch: str) -> Dict[str, Any]:
    """Reference torchsparse checkpoint -> flax params for MinkowskiNet /
    SPVCNN ('minkowskinet' | 'spvcnn').

    Naming contract (minkowskinet/model.py, spvcnn/model.py):
      stem.{0,3}.kernel, stem.{1,4}.{weight,bias,running_*}
      stage{s}.0.net.{0,1}   (BasicConvolutionBlock)
      stage{s}.{1,2}.(net|downsample).*        (ResidualBlocks)
      up{u}.0.net.{0,1}      (BasicDeconvolutionBlock)
      up{u}.1.{0,1}.(net|downsample).*
      classifier.0.{weight,bias}
      point_transforms.{i}.{0,1}.*             (spvcnn only)
    """
    cs = cfg.cs
    p: Dict[str, Any] = {
        "stem0": _conv(sd, "stem.0.kernel"),
        "stem_bn0": _bn(sd, "stem.1"),
        "stem1": _conv(sd, "stem.3.kernel"),
        "stem_bn1": _bn(sd, "stem.4"),
    }
    for s in range(1, 5):
        p[f"stage{s}_down"] = {"conv": _conv(sd, f"stage{s}.0.net.0.kernel"),
                               "bn": _bn(sd, f"stage{s}.0.net.1")}
        # first residual changes channels iff cs[s-1] != cs[s]
        p[f"stage{s}_res0"] = _res(sd, f"stage{s}.1",
                                   has_down=cs[s - 1] != cs[s])
        p[f"stage{s}_res1"] = _res(sd, f"stage{s}.2", has_down=False)
    for u in range(1, 5):
        p[f"up{u}_deconv"] = {"conv": _conv(sd, f"up{u}.0.net.0.kernel"),
                              "bn": _bn(sd, f"up{u}.0.net.1")}
        p[f"up{u}_res0"] = _res(sd, f"up{u}.1.0", has_down=True)  # concat in
        p[f"up{u}_res1"] = _res(sd, f"up{u}.1.1", has_down=False)
    if "classifier.0.weight" in sd:
        p["classifier"] = {
            "kernel": np.asarray(sd["classifier.0.weight"]).T,
            "bias": np.asarray(sd["classifier.0.bias"])}
    if arch == "spvcnn":
        for i in range(3):
            p[f"pt{i}"] = {
                "linear": {
                    "kernel": np.asarray(
                        sd[f"point_transforms.{i}.0.weight"]).T,
                    "bias": np.asarray(sd[f"point_transforms.{i}.0.bias"])},
                "bn": _bn(sd, f"point_transforms.{i}.1")}
    return {"params": p}


def make_template_state_dict(cfg: SegNetConfig, arch: str,
                             rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random state_dict with the exact reference names/shapes — used by the
    conversion-coverage tests (real pretrained weights are not shipped in
    this environment; eval/registry logs that loudly)."""
    cs = cfg.cs
    sd: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k):
        shape = (cin, cout) if k == 1 else (k ** 3, cin, cout)
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    def bn(pfx, c):
        sd[f"{pfx}.weight"] = np.abs(
            rng.standard_normal(c).astype(np.float32)) + 0.5
        sd[f"{pfx}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{pfx}.running_mean"] = rng.standard_normal(c).astype(
            np.float32) * 0.1
        sd[f"{pfx}.running_var"] = np.abs(
            rng.standard_normal(c).astype(np.float32)) * 0.1 + 1.0

    def res(pfx, cin, cout):
        conv(f"{pfx}.net.0.kernel", cin, cout, 3)
        bn(f"{pfx}.net.1", cout)
        conv(f"{pfx}.net.3.kernel", cout, cout, 3)
        bn(f"{pfx}.net.4", cout)
        if cin != cout:
            conv(f"{pfx}.downsample.0.kernel", cin, cout, 1)
            bn(f"{pfx}.downsample.1", cout)

    conv("stem.0.kernel", cfg.input_dims, cs[0], 3)
    bn("stem.1", cs[0])
    conv("stem.3.kernel", cs[0], cs[0], 3)
    bn("stem.4", cs[0])
    for s in range(1, 5):
        conv(f"stage{s}.0.net.0.kernel", cs[s - 1], cs[s - 1], 2)
        bn(f"stage{s}.0.net.1", cs[s - 1])
        res(f"stage{s}.1", cs[s - 1], cs[s])
        res(f"stage{s}.2", cs[s], cs[s])
    skip = {1: cs[3], 2: cs[2], 3: cs[1], 4: cs[0]}
    for u in range(1, 5):
        # up_u deconv: cs[3+u] -> cs[4+u] (model.py up1..up4)
        conv(f"up{u}.0.net.0.kernel", cs[3 + u], cs[4 + u], 2)
        bn(f"up{u}.0.net.1", cs[4 + u])
        res(f"up{u}.1.0", cs[4 + u] + skip[u], cs[4 + u])
        res(f"up{u}.1.1", cs[4 + u], cs[4 + u])
    sd["classifier.0.weight"] = rng.standard_normal(
        (cfg.num_class, cs[8])).astype(np.float32) * 0.05
    sd["classifier.0.bias"] = np.zeros(cfg.num_class, np.float32)
    if arch == "spvcnn":
        dims = [(cs[0], cs[4]), (cs[4], cs[6]), (cs[6], cs[8])]
        for i, (ci, co) in enumerate(dims):
            sd[f"point_transforms.{i}.0.weight"] = rng.standard_normal(
                (co, ci)).astype(np.float32) * 0.05
            sd[f"point_transforms.{i}.0.bias"] = np.zeros(co, np.float32)
            bn(f"point_transforms.{i}.1", co)
    return sd
