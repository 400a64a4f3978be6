#!/usr/bin/env python
"""Train the Gaussian-surfel dense decoder (pointcept-style stage).

Parity: ``scripts/train_dense_decoder.py`` + pointcept DefaultTrainer — here
the hook-driven Trainer runs one jitted SPMD step (no mp.spawn launcher).
Synthetic scenes stand in when no dataset root is provided.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--workdir", default="./runs/dense_decoder")
    p.add_argument("--n-points", type=int, default=8192)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.models.gs_decoder import (DenseDecoder,
                                                    GSDecoderConfig, gs_loss,
                                                    render_surfels)
    from lidar_layout_tpu.models.ptv3 import PTv3Config
    from lidar_layout_tpu.ops.gaussian_raster import RasterConfig
    from lidar_layout_tpu.ops.lidar import NUSCENES_GEOMETRY, LidarGeometry, pcd2range
    from lidar_layout_tpu.train.trainer import (CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer)

    geom = LidarGeometry(size=(16, 64)) if args.tiny else NUSCENES_GEOMETRY
    n_pts = 512 if args.tiny else args.n_points
    bb = (PTv3Config(in_channels=4, patch_size=64, enc_depths=(1, 1),
                     enc_channels=(16, 32), enc_heads=(2, 4), dec_depths=(1,),
                     dec_channels=(16,), dec_heads=(2,), bits=8)
          if args.tiny else
          PTv3Config(in_channels=4, patch_size=1024,
                     enc_depths=(2, 2, 2), enc_channels=(32, 64, 128),
                     enc_heads=(2, 4, 8), dec_depths=(2, 2),
                     dec_channels=(64, 64), dec_heads=(4, 4)))
    model = DenseDecoder(bb, GSDecoderConfig(feat_dim=32, n_offsets=4))
    rc = RasterConfig(chunk=128 if args.tiny else 512)

    rng = np.random.default_rng(args.seed)

    def make_batch():
        pts = synthetic_scene(rng, n_pts).astype(np.float32)
        feats = np.concatenate([pts, np.zeros((n_pts, 1), np.float32)], -1)
        mask = np.ones(n_pts, bool)
        gt_range, _ = pcd2range(jnp.asarray(pts), geom)
        gt_mask = np.asarray(gt_range) > 0
        return {"points": jnp.asarray(pts), "feats": jnp.asarray(feats),
                "mask": jnp.asarray(mask),
                "gt_range": jnp.where(jnp.asarray(gt_mask), gt_range, 0.0),
                "gt_mask": jnp.asarray(gt_mask)}

    b0 = make_batch()
    params = model.init(jax.random.key(args.seed), b0["points"], b0["feats"],
                        b0["mask"])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
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
        while True:
            yield make_batch()

    trainer = Trainer(step_fn, (params, opt), batches(), workdir=args.workdir,
                      max_steps=args.steps,
                      hooks=[IterationTimer(), InformationWriter(),
                             CheckpointSaver(max(args.steps // 5, 1))],
                      seed=args.seed)
    trainer.train()
    print(f"done -> {args.workdir}")


if __name__ == "__main__":
    main()
