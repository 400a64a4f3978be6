#!/usr/bin/env python
"""DPM-Solver++(2M) quality-vs-speed evidence on the TRAINED north-star LiDM.

The sampler claim ("50-step DDIM quality at ~20 steps, one eval per step")
needs trained-model evidence, not solver math alone. This restores the
north-star checkpoints (runs/northstar_r02b), draws the same number of
samples with DDIM-50, DPM-20 and DPM-10, times each full compiled loop
(sampling + VQ decode + reprojection), and scores each set with JSD/MMD
against held-out scenes. Writes DPM_QUALITY.json.

One TPU job at a time (CLAUDE.md).
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
    p.add_argument("--workdir", default="./runs/northstar_r03")
    p.add_argument("--n-eval", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="DPM_QUALITY.json")
    p.add_argument("--ae-ch", type=int, default=48,
                   help="stage-A width of the restored run")
    p.add_argument("--n-embed", type=int, default=8192)
    p.add_argument("--no-mask", action="store_true",
                   help="restored run trained without the ray-drop head")
    p.add_argument("--vq-init", default="taming")
    p.add_argument("--cosine-steps", type=int, default=0,
                   help="the run's --lidm-steps when it used --cosine "
                        "(rebuilds the schedule so the orbax opt-state tree "
                        "matches)")
    p.add_argument("--lidm-lr", type=float, default=2e-4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.eval.metrics import evaluate
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.samplers import ddim_sample, dpm_solver_sample
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
    ae_cfg = AEConfig(ch=args.ae_ch, ch_mult=(1, 2, 2, 4),
                      strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                      out_ch=1 if args.no_mask else 2, num_res_blocks=2)
    unet_cfg = UNetConfig(in_channels=8, model_channels=128, out_channels=8,
                          num_res_blocks=2, attention_resolutions=(4, 2, 1),
                          channel_mult=(1, 2, 4), num_head_channels=32)
    diff_cfg = DiffusionConfig(timesteps=1024, linear_start=0.0015,
                               linear_end=0.0195, latent_shape=(16, 128, 8),
                               scale_by_std=True)
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=args.n_embed, embed_dim=8,
                            use_mask=not args.no_mask, vq_init=args.vq_init)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    if args.cosine_steps:
        from lidar_layout_tpu.train.lr_schedule import \
            lambda_warmup_cosine_optax
        lr = lambda_warmup_cosine_optax(
            base_lr=args.lidm_lr, warm_up_steps=1000, lr_min=0.1, lr_max=1.0,
            lr_start=0.01, max_decay_steps=args.cosine_steps)
    else:
        lr = args.lidm_lr
    tx = make_optimizer(lr)
    dstate = create_train_state(model, params, tx)
    dstate = restore_checkpoint(os.path.join(args.workdir, "ckpt_lidm"),
                                dstate)
    trained = ema_params(model, dstate)
    print(f"[dpm_quality] restored step {int(dstate.step)}", flush=True)

    # scale_factor is config-side, not checkpointed: recalibrate it exactly
    # as northstar_train did (same first 16 pool scenes -> encode -> 1/std)
    from lidar_layout_tpu.models.diffusion import apply_scale_by_std

    from lidar_layout_tpu.data.device_synthetic import (host_range2pcd,
                                                        scene_image_batch)
    probe_im, _ = scene_image_batch(jax.random.key(1_000_000), 16, 120000,
                                    geom)
    s = apply_scale_by_std(model, trained, probe_im[..., None])
    print(f"[dpm_quality] scale_factor={float(s):.4f}", flush=True)

    lh, lw, lc = diff_cfg.latent_shape
    b = args.batch

    def make_draw(sampler, steps):
        @jax.jit
        def sample_batch(ps, key):
            z = sampler(model, ps, key, (b, lh, lw, lc), steps=steps)
            imgs = model.decode_first_stage(ps, z)
            return imgs[..., 0].astype(jnp.float16)

        def draw():
            clouds = []
            # warmup/compile outside the timed region
            _ = np.asarray(sample_batch(trained, jax.random.key(0)))
            t0 = time.perf_counter()
            for i in range((args.n_eval + b - 1) // b):
                imgs = np.asarray(sample_batch(trained,
                                               jax.random.key(7000 + i))
                                  ).astype(np.float32)
                clouds += [host_range2pcd(im, geom) for im in imgs]
            dt = time.perf_counter() - t0
            return clouds[: args.n_eval], dt

        return draw

    # held-out references: REPROJECTED scenes, the r03 eval convention
    ref = []
    for i in range(0, args.n_eval, 64):
        im, _ = scene_image_batch(jax.random.key(9_000_000 + i), 64, 120000,
                                  geom)
        im = np.asarray(im.astype(jnp.float16)).astype(np.float32)
        ref += [host_range2pcd(x, geom) for x in im]
    ref = ref[:args.n_eval]

    variants = {
        "ddim50": make_draw(ddim_sample, 50),
        "dpm20": make_draw(dpm_solver_sample, 20),
        "dpm10": make_draw(dpm_solver_sample, 10),
    }
    def device_time(sampler, steps):
        """On-device sampling+decode wall time (scalar readback only) — the
        draw() clock is dominated by the ~300 KB/s relay download of the f16
        images, which is eval plumbing, not solver speed."""
        @jax.jit
        def run(ps, key):
            z = sampler(model, ps, key, (b, lh, lw, lc), steps=steps)
            return jnp.sum(model.decode_first_stage(ps, z).astype(jnp.float32))

        float(run(trained, jax.random.key(0)))  # compile+warm
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(run(trained, jax.random.key(1 + r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    report = {"n_samples": args.n_eval, "batch": b,
              "ckpt_step": int(dstate.step), "variants": {}}
    for name, draw in variants.items():
        clouds, dt = draw()
        m = evaluate(ref, clouds, ["jsd", "mmd"], "64")
        report["variants"][name] = {
            "gen_seconds_incl_download": round(dt, 1),
            **{k: round(float(v), 6) for k, v in m.items()}}
        print(json.dumps({name: report["variants"][name]}), flush=True)
    probes = {"ddim50": (ddim_sample, 50), "dpm20": (dpm_solver_sample, 20),
              "dpm10": (dpm_solver_sample, 10)}
    for name, (sampler, steps) in probes.items():
        dt = device_time(sampler, steps)
        report["variants"][name]["device_seconds_per_batch"] = round(dt, 3)
        report["variants"][name]["samples_per_sec_device"] = round(b / dt, 2)
        print(f"{name}: {dt:.3f}s/batch on device", flush=True)

    d50 = report["variants"]["ddim50"]
    d20 = report["variants"]["dpm20"]
    report["dpm20_speedup_vs_ddim50"] = round(
        d20["samples_per_sec_device"] / d50["samples_per_sec_device"], 2)
    report["hardware"] = str(jax.devices()[0].platform)
    report["description"] = (
        "Trained north-star LiDM (EMA weights): identical decode/eval "
        "pipeline, only the solver and step count vary. JSD/MMD vs held-out "
        "scenes; quality parity of dpm20 with ddim50 validates the sampler's "
        "headline claim on a real trained model.")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
