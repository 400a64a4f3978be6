#!/usr/bin/env python
"""Train the Gaussian-surfel dense decoder (pointcept-style stage).

Config-driven parity with the reference ``scripts/train_dense_decoder.py`` +
pointcept DefaultTrainer: ``-b configs/ours/nuscenes/dense_decoder/gaus_10cm
.yaml -d data_root``. The backbone comes from the config (full reference
widths by default); one jitted SPMD step replaces the mp.spawn launcher.
Synthetic scenes stand in only when no dataset root is provided (logged).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs",
                              "ours", "nuscenes", "dense_decoder",
                              "gaus_10cm.yaml")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", default=DEFAULT_CONFIG, help="YAML config")
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--workdir", default=None)
    p.add_argument("--n-points", type=int, default=8192)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="shrink backbone + geometry for smoke runs")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast local smoke runs)")
    args, unknown = p.parse_known_args()
    bad = [u for u in unknown if "=" not in u]
    if bad:
        p.error(f"unrecognized arguments: {' '.join(bad)}")
    args.overrides = unknown

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.factory import build_batches
    from lidar_layout_tpu.models.gs_decoder import gs_loss, render_surfels
    from lidar_layout_tpu.ops.gaussian_raster import RasterConfig
    from lidar_layout_tpu.ops.lidar import LidarGeometry, pcd2range
    from lidar_layout_tpu.train.trainer import (CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer)

    cfg = load_yaml(args.base)
    if args.overrides:
        from lidar_layout_tpu.config import apply_dotlist
        apply_dotlist(cfg, args.overrides)
        print(f"dotlist overrides: {args.overrides}")
    model_cfg = cfg["model"]
    data_cfg = cfg.get("data", {}).get("params", {})
    dset_cfg = data_cfg.get("dataset", {})
    name = os.path.splitext(os.path.basename(args.base))[0]
    workdir = args.workdir or f"./runs/{name}"

    if args.tiny:
        model_cfg["params"]["backbone"]["params"].update(
            enc_depths=[1, 1], enc_channels=[16, 32], enc_num_head=[2, 4],
            enc_patch_size=[64, 64], dec_depths=[1], dec_channels=[16],
            dec_num_head=[2], drop_path=0.0)
        model_cfg["params"]["head"] = {"params": {"feat_dim": 16}}
        geom = LidarGeometry(size=(16, 64), fov=(10, -30))
        n_pts = 512
    else:
        geom = LidarGeometry(
            size=tuple(dset_cfg.get("size", (32, 1024))),
            fov=tuple(dset_cfg.get("fov", (10, -30))),
            depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
            depth_scale=dset_cfg.get("depth_scale", 5.84),
            log_scale=dset_cfg.get("log_scale", True))
        n_pts = args.n_points

    model = instantiate_from_config(model_cfg)
    rc = RasterConfig(chunk=128 if args.tiny else 512)

    train_blk = data_cfg.get("train", {"target": "nusc_cube_decode",
                                       "params": {}})
    blk_params = dict(train_blk.get("params", {}))
    blk_params.setdefault("max_points", n_pts)
    blk_params.setdefault("transform", data_cfg.get("transform"))
    batch_size = args.batch_size or 1  # per-step single cloud, SPMD over dp
    raw_batches = build_batches(train_blk.get("target", "nusc_cube_decode"),
                                blk_params, dset_cfg, args.data_root,
                                batch_size, seed=args.seed,
                                force_synthetic=args.synthetic)

    def to_sample(b):
        """One cloud per step: flatten batch dim, derive GT range image."""
        pts = jnp.asarray(b["points"][0])
        feats = jnp.asarray(b["feats"][0])
        mask = jnp.asarray(b["mask"][0])
        if "range_img" in b:
            gt_range = jnp.asarray(b["range_img"][0])
        else:
            gt_range, _ = pcd2range(pts, geom, mask=mask)
        gt_mask = gt_range > 0
        return {"points": pts, "feats": feats, "mask": mask,
                "gt_range": jnp.where(gt_mask, gt_range, 0.0),
                "gt_mask": gt_mask}

    b0 = to_sample(next(raw_batches))
    params = model.init(jax.random.key(args.seed), b0["points"], b0["feats"],
                        b0["mask"])
    opt_cfg = cfg.get("optimizer", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(opt_cfg.get("lr", 1e-4),
                                 weight_decay=opt_cfg.get("weight_decay",
                                                          1e-2)))
    opt = tx.init(params)

    @jax.jit
    def step_fn(state, batch, key):
        params, opt = state

        def loss_fn(p):
            surfels = model.apply(p, batch["points"], batch["feats"],
                                  batch["mask"])
            render = render_surfels(surfels, geom, rc)
            return gs_loss(render, batch["gt_range"], batch["gt_mask"])

        (l, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), logs

    def batches():
        for b in raw_batches:
            yield to_sample(b)

    trainer = Trainer(step_fn, (params, opt), batches(), workdir=workdir,
                      max_steps=args.steps,
                      hooks=[IterationTimer(), InformationWriter(),
                             CheckpointSaver(max(args.steps // 5, 1))],
                      seed=args.seed)
    trainer.train()
    print(f"done -> {workdir}")


if __name__ == "__main__":
    main()
