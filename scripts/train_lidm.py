#!/usr/bin/env python
"""Train a range-image autoencoder or latent-diffusion model from a YAML config.

CLI parity with the reference's ``main.py`` / ``scripts/train_lidm.py``:
  -b/--base config.yaml   -t/--train   -r/--resume dir   -d/--data-root
  -s/--seed   --steps N   --workdir DIR   --synthetic (force synthetic data)

One process drives all local devices (SPMD); there is no DDP launcher.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="YAML config")
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--workdir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast local smoke runs)")
    p.add_argument("--bf16", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.datasets import RangeImageDataset
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.ops.lidar import LidarGeometry
    from lidar_layout_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from lidar_layout_tpu.train.lr_schedule import scale_lr
    from lidar_layout_tpu.train.trainer import (CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer)

    cfg = load_yaml(args.base)
    model_cfg = cfg["model"]
    data_cfg = cfg.get("data", {}).get("params", {})
    dset_cfg = data_cfg.get("dataset", {})
    name = os.path.splitext(os.path.basename(args.base))[0]
    workdir = args.workdir or f"./runs/{name}"

    geom = LidarGeometry(
        size=tuple(dset_cfg.get("size", (64, 1024))),
        fov=tuple(dset_cfg.get("fov", (3, -25))),
        depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
        depth_scale=dset_cfg.get("depth_scale", 5.84),
        log_scale=dset_cfg.get("log_scale", True))

    batch_size = data_cfg.get("batch_size", 4)
    n_dev = len(jax.devices())
    batch_size = max(batch_size, n_dev)  # at least one sample per chip
    train_blk = data_cfg.get("train")
    if train_blk and train_blk.get("target"):
        from lidar_layout_tpu.data.factory import build_batches
        raw_batches = build_batches(
            train_blk["target"], train_blk.get("params", {}), dset_cfg,
            args.data_root, batch_size, seed=args.seed,
            force_synthetic=args.synthetic)
    else:
        ds = RangeImageDataset(None if args.synthetic else args.data_root,
                               batch_size=batch_size, geom=geom,
                               seed=args.seed)
        raw_batches = ds.batches()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    target = model_cfg["target"]
    base_lr = model_cfg.get("base_learning_rate", 4.5e-6)
    lr = scale_lr(base_lr, batch_size, 1)
    mesh = make_mesh()

    if "autoencoder" in target or target in ("vq_model",):
        model = instantiate_from_config(model_cfg, dtype=dtype)
        from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                       make_ae_optimizers,
                                                       make_ae_train_step)
        lc = model_cfg["params"].get("lossconfig")
        if isinstance(lc, dict) and lc.get("target") not in (None, "torch.nn.Identity"):
            loss_cfg = instantiate_from_config(lc)
        else:
            from lidar_layout_tpu.losses.vq_loss import VQLossConfig
            loss_cfg = VQLossConfig()
        geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
        disc = LiDARNLayerDiscriminator()
        tx_g, tx_d = make_ae_optimizers(lr, lr)
        state = create_ae_state(model, disc, jax.random.key(args.seed),
                                (*geom.size, model.cfg.in_channels),
                                tx_g, tx_d, loss_cfg, geo)
        step = make_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d)
    else:
        model = instantiate_from_config(model_cfg, dtype=dtype)
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, make_train_step)
        tx = make_optimizer(lr)
        params = model.init(jax.random.key(args.seed),
                            image_shape=(*geom.size, 1))
        state = create_train_state(model, params, tx)
        step = make_train_step(model, tx)

    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(os.path.join(args.resume, "ckpt"), state)
        print(f"resumed from {args.resume}")

    state = replicate(state, mesh)

    def batches():
        for b in raw_batches:
            yield shard_batch({k: v for k, v in b.items()}, mesh)

    trainer = Trainer(step, state, batches(), workdir=workdir,
                      max_steps=args.steps,
                      hooks=[IterationTimer(), InformationWriter(),
                             CheckpointSaver(every_steps=max(args.steps // 5, 1))],
                      seed=args.seed)
    trainer.train()
    print(f"done: {trainer.global_step} steps -> {workdir}")


if __name__ == "__main__":
    main()
