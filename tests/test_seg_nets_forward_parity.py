"""FULL-MODEL forward parity of the converted MinkowskiNet vs dense torch.

VERDICT r2 weak #5 / task #4: the kernel-level equivalences in
test_eval_seg_nets.py leave model *wiring* (stage order, skip-concat order,
BN running stats, occupancy propagation) untested. torchsparse is not
installable here, so the oracle is a dense torch re-execution of the exact
reference architecture (minkowskinet/model.py:13-142): random weights in the
reference's torchsparse naming drive BOTH our sorted-grid jax model (via
convert_torchsparse_state_dict) AND a dense conv3d/conv_transpose3d pipeline
whose occupancy masks replicate sparse semantics (submanifold = dense conv
masked to input sites; stride-2 output sites = any-child-occupied; transposed
= one contributing parent per fine site).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lidar_layout_tpu.eval.sparse_seg_nets import (_K2, _K3, MinkowskiNet,

                                                   SegNetConfig,
                                                   convert_torchsparse_state_dict,
                                                   make_template_state_dict)

pytestmark = pytest.mark.slow  # heavy e2e/kernel file; default run skips (pytest.ini), CI/--runslow includes

CFG = SegNetConfig(input_dims=4, cr=0.25, num_class=5, capacity=1024, bits=6)
D = 16  # dense extent; L4 coords live in [0, 1)


def _w3(sd, name, cout, cin):
    w = np.zeros((cout, cin, 3, 3, 3), np.float32)
    for k, (ox, oy, oz) in enumerate(np.asarray(_K3)):
        w[:, :, ox + 1, oy + 1, oz + 1] = sd[name][k].T
    return torch.from_numpy(w)


def _w2(sd, name, cout, cin):
    w = np.zeros((cout, cin, 2, 2, 2), np.float32)
    for k, (ox, oy, oz) in enumerate(np.asarray(_K2)):
        w[:, :, ox, oy, oz] = sd[name][k].T
    return torch.from_numpy(w)


def _bn(sd, pfx, vol):
    wgt = torch.from_numpy(sd[f"{pfx}.weight"]).view(1, -1, 1, 1, 1)
    b = torch.from_numpy(sd[f"{pfx}.bias"]).view(1, -1, 1, 1, 1)
    m = torch.from_numpy(sd[f"{pfx}.running_mean"]).view(1, -1, 1, 1, 1)
    v = torch.from_numpy(sd[f"{pfx}.running_var"]).view(1, -1, 1, 1, 1)
    return (vol - m) * wgt * torch.rsqrt(v + 1e-5) + b


def _subm(sd, name, vol, occ, cout):
    cin = vol.shape[1]
    out = F.conv3d(vol, _w3(sd, f"{name}.kernel", cout, cin), padding=1)
    return out * occ


def _res(sd, pfx, vol, occ, cout, has_down):
    cin = vol.shape[1]
    h = F.relu(_bn(sd, f"{pfx}.net.1", _subm(sd, f"{pfx}.net.0", vol, occ,
                                             cout))) * occ
    h = _bn(sd, f"{pfx}.net.4", _subm(sd, f"{pfx}.net.3", h, occ, cout))
    if has_down:
        w1 = torch.from_numpy(sd[f"{pfx}.downsample.0.kernel"].T
                              ).view(cout, cin, 1, 1, 1)
        s = _bn(sd, f"{pfx}.downsample.1", F.conv3d(vol, w1))
    else:
        s = vol
    return F.relu(h + s) * occ


def dense_minkowski(sd, cfg, vol0, occ0):
    cs = cfg.cs
    occ = [occ0]
    for _ in range(4):
        occ.append(F.max_pool3d(occ[-1], 2))
    x = F.relu(_bn(sd, "stem.1", _subm(sd, "stem.0", vol0, occ[0],
                                       cs[0]))) * occ[0]
    x = F.relu(_bn(sd, "stem.4", _subm(sd, "stem.3", x, occ[0],
                                       cs[0]))) * occ[0]
    skips = [x]
    for s in range(1, 5):
        cin = x.shape[1]
        down = F.conv3d(x, _w2(sd, f"stage{s}.0.net.0.kernel", cin, cin),
                        stride=2)
        x = F.relu(_bn(sd, f"stage{s}.0.net.1", down)) * occ[s]
        x = _res(sd, f"stage{s}.1", x, occ[s], cs[s],
                 has_down=cs[s - 1] != cs[s])
        x = _res(sd, f"stage{s}.2", x, occ[s], cs[s], has_down=False)
        skips.append(x)
    y = skips[-1]
    for u in range(1, 5):
        lvl = 4 - u
        cin = y.shape[1]
        # conv_transpose3d weight layout is (Cin, Cout, k, k, k)
        up = F.conv_transpose3d(y, _w2(sd, f"up{u}.0.net.0.kernel", cs[4 + u],
                                       cin).permute(1, 0, 2, 3, 4)
                                .contiguous(), stride=2)
        y = F.relu(_bn(sd, f"up{u}.0.net.1", up)) * occ[lvl]
        y = torch.cat([y, skips[lvl]], dim=1)
        y = _res(sd, f"up{u}.1.0", y, occ[lvl], cs[4 + u], has_down=True)
        y = _res(sd, f"up{u}.1.1", y, occ[lvl], cs[4 + u], has_down=False)
    wcls = torch.from_numpy(sd["classifier.0.weight"]).view(
        cfg.num_class, cs[8], 1, 1, 1)
    bcls = torch.from_numpy(sd["classifier.0.bias"])
    return F.conv3d(y, wcls, bcls) * occ[0]


def test_minkowski_full_forward_matches_dense_torch():
    rng = np.random.default_rng(0)
    sd = make_template_state_dict(CFG, "minkowskinet", rng)
    params = convert_torchsparse_state_dict(sd, CFG, "minkowskinet")

    # points on a small integer grid, multiple points per voxel (mean pool)
    n = 400
    coords = rng.integers(0, D, (n, 3)).astype(np.int32)
    feats = rng.standard_normal((n, CFG.input_dims)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[380:] = False

    model = MinkowskiNet(CFG)
    out = model.apply(params, jnp.asarray(coords), jnp.asarray(feats),
                      jnp.asarray(mask), return_final_logits=False)
    vmask = np.asarray(out["mask"])
    vcoords = np.asarray(out["coords"])[vmask]
    logits = np.asarray(out["logits"])[vmask]

    # dense twin input: mean point features per voxel
    vol = np.zeros((CFG.input_dims, D, D, D), np.float32)
    cnt = np.zeros((D, D, D), np.float32)
    for c, f, m in zip(coords, feats, mask):
        if m:
            vol[:, c[0], c[1], c[2]] += f
            cnt[c[0], c[1], c[2]] += 1
    occ0 = (cnt > 0).astype(np.float32)
    vol = vol / np.maximum(cnt, 1.0)
    ref = dense_minkowski(sd, CFG,
                          torch.from_numpy(vol[None]),
                          torch.from_numpy(occ0[None, None]))
    ref = ref[0].permute(1, 2, 3, 0).numpy()
    want = ref[vcoords[:, 0], vcoords[:, 1], vcoords[:, 2]]
    np.testing.assert_allclose(logits, want, atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# SPVCNN: voxel trunk + trilinear point branch (spvcnn/model.py:13-179)
# ---------------------------------------------------------------------------

def _trilinear(vol, occ, pts, level):
    """Sample (C, D, D, D) torch vol at base-res points / 2^level; corners
    without occupancy contribute zero weight (torchsparse voxel_to_point)."""
    v = vol[0].numpy()
    o = occ[0, 0].numpy()
    d = v.shape[-1]
    pf = pts / float(1 << level)
    base = np.floor(pf).astype(np.int64)
    frac = pf - base
    out = np.zeros((len(pts), v.shape[0]), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = base + [dx, dy, dz]
                ok = (c >= 0).all(1) & (c < d).all(1)
                cc = np.clip(c, 0, d - 1)
                wgt = (np.where(dx, frac[:, 0], 1 - frac[:, 0])
                       * np.where(dy, frac[:, 1], 1 - frac[:, 1])
                       * np.where(dz, frac[:, 2], 1 - frac[:, 2]))
                wgt = wgt * ok * (o[cc[:, 0], cc[:, 1], cc[:, 2]] > 0)
                out += wgt[:, None] * v[:, cc[:, 0], cc[:, 1], cc[:, 2]].T
    return out


def _scatter_mean(pts, pt_feats, pt_mask, occ, level, d):
    """Point features -> (1, C, d, d, d) torch vol, mean per occupied voxel."""
    c = (pts.astype(np.int64) >> level)
    vol = np.zeros((pt_feats.shape[1], d, d, d), np.float32)
    cnt = np.zeros((d, d, d), np.float32)
    for p, f, m in zip(c, pt_feats, pt_mask):
        if m:
            vol[:, p[0], p[1], p[2]] += f
            cnt[p[0], p[1], p[2]] += 1
    vol = vol / np.maximum(cnt, 1.0)
    return torch.from_numpy(vol[None]) * occ


def _pt_transform(sd, i, x):
    w = sd[f"point_transforms.{i}.0.weight"]
    b = sd[f"point_transforms.{i}.0.bias"]
    h = x @ w.T + b
    pfx = f"point_transforms.{i}.1"
    h = ((h - sd[f"{pfx}.running_mean"]) * sd[f"{pfx}.weight"]
         / np.sqrt(sd[f"{pfx}.running_var"] + 1e-5) + sd[f"{pfx}.bias"])
    return np.maximum(h, 0.0)


def test_spvcnn_full_forward_matches_dense_torch():
    from lidar_layout_tpu.eval.sparse_seg_nets import SPVCNN

    rng = np.random.default_rng(1)
    sd = make_template_state_dict(CFG, "spvcnn", rng)
    params = convert_torchsparse_state_dict(sd, CFG, "spvcnn")
    cs = CFG.cs

    n = 400
    coords = rng.integers(0, D, (n, 3)).astype(np.int32)
    feats = rng.standard_normal((n, CFG.input_dims)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[380:] = False
    w = mask.astype(np.float32)

    model = SPVCNN(CFG)
    out = model.apply(params, jnp.asarray(coords), jnp.asarray(feats),
                      jnp.asarray(mask), return_final_logits=False)
    logits = np.asarray(out["logits"])[mask]

    # ---- dense torch twin ----
    vol = np.zeros((CFG.input_dims, D, D, D), np.float32)
    cnt = np.zeros((D, D, D), np.float32)
    for c, f, m in zip(coords, feats, mask):
        if m:
            vol[:, c[0], c[1], c[2]] += f
            cnt[c[0], c[1], c[2]] += 1
    occ = [(torch.from_numpy((cnt > 0).astype(np.float32)))[None, None]]
    for _ in range(4):
        occ.append(F.max_pool3d(occ[-1], 2))
    vol = torch.from_numpy((vol / np.maximum(cnt, 1.0))[None])

    x = F.relu(_bn(sd, "stem.1", _subm(sd, "stem.0", vol, occ[0],
                                       cs[0]))) * occ[0]
    x0 = F.relu(_bn(sd, "stem.4", _subm(sd, "stem.3", x, occ[0],
                                        cs[0]))) * occ[0]
    pts = coords.astype(np.float32)
    z0 = _trilinear(x0, occ[0], pts, 0) * w[:, None]

    x = _scatter_mean(pts, z0, mask, occ[0], 0, D)
    skips = [x0]
    for s in range(1, 5):
        cin = x.shape[1]
        down = F.conv3d(x, _w2(sd, f"stage{s}.0.net.0.kernel", cin, cin),
                        stride=2)
        x = F.relu(_bn(sd, f"stage{s}.0.net.1", down)) * occ[s]
        x = _res(sd, f"stage{s}.1", x, occ[s], cs[s],
                 has_down=cs[s - 1] != cs[s])
        x = _res(sd, f"stage{s}.2", x, occ[s], cs[s], has_down=False)
        skips.append(x)

    z1 = (_trilinear(x, occ[4], pts, 4) + _pt_transform(sd, 0, z0)) \
        * w[:, None]
    y = _scatter_mean(pts, z1, mask, occ[4], 4, D >> 4)

    def up_stage(y, u):
        lvl = 4 - u
        cin = y.shape[1]
        up = F.conv_transpose3d(y, _w2(sd, f"up{u}.0.net.0.kernel",
                                       cs[4 + u], cin)
                                .permute(1, 0, 2, 3, 4).contiguous(),
                                stride=2)
        y = F.relu(_bn(sd, f"up{u}.0.net.1", up)) * occ[lvl]
        y = torch.cat([y, skips[lvl]], dim=1)
        y = _res(sd, f"up{u}.1.0", y, occ[lvl], cs[4 + u], has_down=True)
        return _res(sd, f"up{u}.1.1", y, occ[lvl], cs[4 + u], has_down=False)

    y = up_stage(y, 1)
    y = up_stage(y, 2)
    z2 = (_trilinear(y, occ[2], pts, 2) + _pt_transform(sd, 1, z1)) \
        * w[:, None]
    y = _scatter_mean(pts, z2, mask, occ[2], 2, D >> 2)
    y = up_stage(y, 3)
    y = up_stage(y, 4)
    z3 = (_trilinear(y, occ[0], pts, 0) + _pt_transform(sd, 2, z2)) \
        * w[:, None]
    want = z3 @ sd["classifier.0.weight"].T + sd["classifier.0.bias"]

    np.testing.assert_allclose(logits, want[mask], atol=2e-3, rtol=2e-3)
