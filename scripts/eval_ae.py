#!/usr/bin/env python
"""Autoencoder reconstruction evaluation (parity: scripts/eval_ae.py):
val batches -> reconstruct -> reproject -> CD/EMD (+JSD) on the clouds."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True)
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-n", "--n-batches", type=int, default=4)
    p.add_argument("--metrics", nargs="+", default=["cd", "jsd"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.datasets import RangeImageDataset
    from lidar_layout_tpu.eval.metrics import evaluate
    from lidar_layout_tpu.models.autoencoder import apply_raydrop
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, range2pcd

    cfg = load_yaml(args.base)
    model = instantiate_from_config(cfg["model"])
    geom = KITTI_GEOMETRY
    ds = RangeImageDataset(args.data_root, split="val",
                           batch_size=cfg["data"]["params"].get("batch_size", 4),
                           geom=geom)

    x0 = jnp.zeros((1, *geom.size, model.cfg.in_channels))
    params = model.init(jax.random.key(0), x0)
    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(os.path.join(args.resume, "ckpt"),
                                      {"params_g": params})
        params = restored["params_g"] if "params_g" in restored else restored
        print(f"loaded weights from {args.resume}")
    else:
        print("WARNING: evaluating randomly initialized AE")

    @jax.jit
    def recon(params, x):
        dec, _, _ = model.apply(params, x)
        return apply_raydrop(dec) if model.use_mask else dec

    gt_clouds, rec_clouds = [], []
    it = ds.batches(shuffle=False)
    for _ in range(args.n_batches):
        batch = next(it)
        x = jnp.asarray(batch["image"])
        xr = np.asarray(recon(params, x))
        for img_gt, img_rec in zip(np.asarray(x)[..., 0], xr[..., 0]):
            for img, acc in ((img_gt, gt_clouds), (img_rec, rec_clouds)):
                xyz, valid = range2pcd(jnp.asarray(img), geom)
                acc.append(np.asarray(xyz)[np.asarray(valid)])

    out = evaluate(gt_clouds, rec_clouds, args.metrics, "64")
    print(json.dumps({k: round(v, 6) for k, v in out.items()}))


if __name__ == "__main__":
    main()
