#!/usr/bin/env python
"""Unconditional sampling + optional evaluation.

CLI parity with the reference ``scripts/sample.py``: -r ckpt/run dir, -d
dataset type, -n n_samples, --eval (JSD/MMD + FRID when features available);
writes range-image .npy and point-cloud .npz outputs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="model YAML config")
    p.add_argument("-r", "--resume", default=None, help="run dir with ckpt/")
    p.add_argument("-d", "--dataset", default="64", choices=["32", "64"])
    p.add_argument("-n", "--n-samples", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--sampler", default="ddim", choices=["ddim", "plms", "ddpm"])
    p.add_argument("--eval", action="store_true")
    p.add_argument("--outdir", default="./samples")
    p.add_argument("--bf16", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.models.samplers import (ddim_sample, ddpm_sample,
                                                  plms_sample)
    from lidar_layout_tpu.ops.lidar import (KITTI_GEOMETRY, NUSCENES_GEOMETRY,
                                            range2pcd)

    cfg = load_yaml(args.base)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = instantiate_from_config(cfg["model"], dtype=dtype)
    dset_cfg = cfg.get("data", {}).get("params", {}).get("dataset", {})
    if dset_cfg:
        from lidar_layout_tpu.ops.lidar import LidarGeometry
        geom = LidarGeometry(
            size=tuple(dset_cfg.get("size", (64, 1024))),
            fov=tuple(dset_cfg.get("fov", (3, -25))),
            depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
            depth_scale=dset_cfg.get("depth_scale", 5.84),
            log_scale=dset_cfg.get("log_scale", True))
    else:
        geom = KITTI_GEOMETRY if args.dataset == "64" else NUSCENES_GEOMETRY

    params = model.init(jax.random.key(0), image_shape=(*geom.size, 1))
    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, ema_params)
        tx = make_optimizer(1e-4)
        state = create_train_state(model, params, tx)
        state = restore_checkpoint(os.path.join(args.resume, "ckpt"), state)
        params = ema_params(model, state)  # ema_scope for sampling
        print(f"loaded EMA weights from {args.resume}")
    else:
        print("WARNING: sampling from randomly initialized weights")

    h, w, c = model.cfg.latent_shape
    sampler = {"ddim": lambda p, r: ddim_sample(model, p, r,
                                                (args.batch, h, w, c),
                                                steps=args.steps, eta=args.eta),
               "plms": lambda p, r: plms_sample(model, p, r,
                                                (args.batch, h, w, c),
                                                steps=args.steps),
               "ddpm": lambda p, r: ddpm_sample(model, p, r,
                                                (args.batch, h, w, c))}[args.sampler]

    @jax.jit
    def sample_batch(params, rng):
        z = sampler(params, rng)
        return model.decode_first_stage(params, z)

    os.makedirs(args.outdir, exist_ok=True)
    all_imgs, all_pcds = [], []
    rng = jax.random.key(42)
    n_batches = (args.n_samples + args.batch - 1) // args.batch
    for i in range(n_batches):
        t0 = time.perf_counter()
        imgs = np.asarray(sample_batch(params, jax.random.fold_in(rng, i)))
        dt = time.perf_counter() - t0
        print(f"batch {i + 1}/{n_batches}: {imgs.shape[0] / dt:.2f} samples/s",
              flush=True)
        all_imgs.append(imgs)
        for img in imgs[..., 0]:
            xyz, valid = range2pcd(jnp.asarray(img), geom)
            all_pcds.append(np.asarray(xyz)[np.asarray(valid)])

    imgs = np.concatenate(all_imgs)[: args.n_samples]
    np.save(os.path.join(args.outdir, "samples_range.npy"), imgs)
    np.savez(os.path.join(args.outdir, "samples_pcd.npz"),
             **{f"pcd_{i}": p for i, p in enumerate(all_pcds[: args.n_samples])})
    print(f"wrote {len(imgs)} samples to {args.outdir}")

    if args.eval:
        from lidar_layout_tpu.data.synthetic import synthetic_scene
        from lidar_layout_tpu.eval.metrics import evaluate
        ref = [synthetic_scene(np.random.default_rng(i)) for i in range(len(all_pcds))]
        out = evaluate(ref, all_pcds, ["jsd", "mmd"], args.dataset)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
