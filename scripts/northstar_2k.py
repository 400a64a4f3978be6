#!/usr/bin/env python
"""BASELINE.json north-star: 2,000 samples generated AND scored end-to-end.

The reference computes its published tables on 2,000 samples
(README.md:107-111); BASELINE.md's throughput note sets the TPU rebuild's
target as "2k unconditional 64-beam samples generated **and** FRID/FSVD-scored
end-to-end on a v5e-8 in under 10 minutes". This script runs that loop on the
hardware we have (one v5e chip): restore the trained north-star LiDM
(runs/northstar_r02b), draw 2,000 EMA samples (50-step DDIM + VQ decode +
reprojection, one compiled program per batch), and score JSD + MMD + FRID
against 2,000 held-out scenes. Compile time is reported separately from the
steady-state clock (the target describes a serving loop, not a cold start).

Writes NORTHSTAR_2K.json. One TPU job at a time (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="./runs/northstar_r02b")
    p.add_argument("--n-samples", type=int, default=2000)
    p.add_argument("--batch", type=int, default=125)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="NORTHSTAR_2K.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.eval.metrics import evaluate
    from lidar_layout_tpu.eval.registry import build_feature_fn
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion,
                                                   apply_scale_by_std)
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.models.unet import UNetConfig
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY
    from lidar_layout_tpu.train.checkpoint import restore_checkpoint
    from lidar_layout_tpu.train.diffusion_trainer import (create_train_state,
                                                          ema_params,
                                                          make_optimizer)

    # production north-star config (northstar_train.py, non-tiny branch)
    geom = KITTI_GEOMETRY
    h, w = geom.size
    ae_cfg = AEConfig(ch=32, ch_mult=(1, 2, 2, 4),
                      strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                      out_ch=2, num_res_blocks=2)
    unet_cfg = UNetConfig(in_channels=8, model_channels=128, out_channels=8,
                          num_res_blocks=2, attention_resolutions=(4, 2, 1),
                          channel_mult=(1, 2, 4), num_head_channels=32)
    diff_cfg = DiffusionConfig(timesteps=1024, linear_start=0.0015,
                               linear_end=0.0195, latent_shape=(16, 128, 8),
                               scale_by_std=True)
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=2048, embed_dim=8, use_mask=True)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    # the optimizer must match the training run's TREE STRUCTURE for orbax to
    # restore: northstar_train --cosine wraps lr in a schedule, whose
    # scale_by_learning_rate state is ScaleByScheduleState, not EmptyState
    from lidar_layout_tpu.train.lr_schedule import lambda_warmup_cosine_optax
    lr = lambda_warmup_cosine_optax(base_lr=2e-4, warm_up_steps=1000,
                                    lr_min=0.1, lr_max=1.0, lr_start=0.01,
                                    max_decay_steps=36000)
    tx = make_optimizer(lr)
    dstate = create_train_state(model, params, tx)
    dstate = restore_checkpoint(os.path.join(args.workdir, "ckpt_lidm"),
                                dstate)
    trained = ema_params(model, dstate)
    print(f"[2k] restored step {int(dstate.step)}", flush=True)

    # scale_factor is config-side, not checkpointed: recalibrate exactly as
    # northstar_train did (same first pool scenes -> encode -> 1/std)
    @jax.jit
    def project(pts):
        img, _ = L.pcd2range(pts, geom)
        model_img, mask = L.process_scan(img, geom)
        return model_img, mask

    probe = np.zeros((16, h, w, 1), np.float32)
    for i in range(16):
        img, _ = project(jnp.asarray(
            synthetic_scene(np.random.default_rng(i), 120000)))
        probe[i, ..., 0] = np.asarray(img)
    s = apply_scale_by_std(model, trained, jnp.asarray(probe))
    print(f"[2k] scale_factor={float(s):.4f} (train log: 0.2302)", flush=True)

    lh, lw, lc = diff_cfg.latent_shape
    b = args.batch

    @jax.jit
    def sample_batch(ps, key):
        z = ddim_sample(model, ps, key, (b, lh, lw, lc), steps=args.steps)
        imgs = model.decode_first_stage(ps, z)
        xyz, valid = jax.vmap(lambda im: L.range2pcd(im, geom))(imgs[..., 0])
        return xyz, valid

    # held-out references (the "dataset" side of the loop; built once,
    # outside the serving clock, like the reference's cached val split)
    print(f"[2k] building {args.n_samples} held-out reference scenes...",
          flush=True)
    t0 = time.perf_counter()
    ref = [synthetic_scene(np.random.default_rng(100_000 + i), 120000)
           for i in range(args.n_samples)]
    ref_seconds = time.perf_counter() - t0

    # compile outside the timed region (steady-state serving clock)
    t0 = time.perf_counter()
    _ = jax.tree.map(np.asarray, sample_batch(trained, jax.random.key(0)))
    ffn = {"frid": build_feature_fn("64", "range")}
    compile_seconds = time.perf_counter() - t0

    # ---- the timed end-to-end loop: generate 2k + score ------------------
    t_gen0 = time.perf_counter()
    clouds = []
    n_batches = (args.n_samples + b - 1) // b
    for i in range(n_batches):
        xyz, valid = jax.tree.map(
            np.asarray, sample_batch(trained, jax.random.key(40_000 + i)))
        for pc, v in zip(xyz, valid):
            clouds.append(pc[v])
        if (i + 1) % 4 == 0:
            print(f"  gen {len(clouds)}/{args.n_samples} "
                  f"({time.perf_counter() - t_gen0:.0f}s)", flush=True)
    clouds = clouds[: args.n_samples]
    gen_seconds = time.perf_counter() - t_gen0

    t_eval0 = time.perf_counter()
    metrics = evaluate(ref, clouds, ["jsd", "mmd", "frid"], "64",
                       feature_fn=ffn, verbose=True)
    eval_seconds = time.perf_counter() - t_eval0
    total = gen_seconds + eval_seconds

    report = {
        "n_samples": args.n_samples,
        "batch": b,
        "ddim_steps": args.steps,
        "ckpt_step": int(dstate.step),
        "metrics": {k: round(float(v), 6) for k, v in metrics.items()},
        "gen_seconds": round(gen_seconds, 1),
        "eval_seconds": round(eval_seconds, 1),
        "total_seconds": round(total, 1),
        "samples_per_sec": round(args.n_samples / gen_seconds, 2),
        "compile_seconds": round(compile_seconds, 1),
        "ref_build_seconds": round(ref_seconds, 1),
        "n_chips": len(jax.devices()),
        "target": "BASELINE.md: 2k generated + scored < 600 s on v5e-8",
        "met_target": bool(total < 600.0),
        "hardware": str(jax.devices()[0].platform),
        "description": (
            "End-to-end 2k-sample loop on the trained north-star LiDM (EMA): "
            "50-step DDIM + VQ decode + reprojection per compiled batch, then "
            "JSD/MMD (grid distance transforms) + FRID (chunked DarkNet21 "
            "features) against 2k held-out scenes. Steady-state clock; "
            "compile and reference-set construction reported separately."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
