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
    p.add_argument("--workdir", default="./runs/northstar_r02b")
    p.add_argument("--n-eval", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="DPM_QUALITY.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene
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
    tx = make_optimizer(2e-4)
    dstate = create_train_state(model, params, tx)
    dstate = restore_checkpoint(os.path.join(args.workdir, "ckpt_lidm"),
                                dstate)
    trained = ema_params(model, dstate)
    print(f"[dpm_quality] restored step {int(dstate.step)}", flush=True)

    # scale_factor is config-side, not checkpointed: recalibrate it exactly
    # as northstar_train did (same first 16 pool scenes -> encode -> 1/std)
    from lidar_layout_tpu.models.diffusion import apply_scale_by_std

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
    print(f"[dpm_quality] scale_factor={float(s):.4f} (train log: 0.2302)",
          flush=True)

    lh, lw, lc = diff_cfg.latent_shape
    b = args.batch

    def make_draw(sampler, steps):
        @jax.jit
        def sample_batch(ps, key):
            z = sampler(model, ps, key, (b, lh, lw, lc), steps=steps)
            imgs = model.decode_first_stage(ps, z)
            xyz, valid = jax.vmap(lambda im: L.range2pcd(im, geom))(
                imgs[..., 0])
            return xyz, valid

        def draw():
            clouds = []
            # warmup/compile outside the timed region
            _ = jax.tree.map(np.asarray,
                             sample_batch(trained, jax.random.key(0)))
            t0 = time.perf_counter()
            for i in range((args.n_eval + b - 1) // b):
                xyz, valid = jax.tree.map(
                    np.asarray, sample_batch(trained, jax.random.key(7000 + i)))
                for pc, v in zip(xyz, valid):
                    clouds.append(pc[v])
            dt = time.perf_counter() - t0
            return clouds[: args.n_eval], dt

        return draw

    ref = [synthetic_scene(np.random.default_rng(10_000 + i), 120000)
           for i in range(args.n_eval)]

    variants = {
        "ddim50": make_draw(ddim_sample, 50),
        "dpm20": make_draw(dpm_solver_sample, 20),
        "dpm10": make_draw(dpm_solver_sample, 10),
    }
    report = {"n_samples": args.n_eval, "batch": b,
              "ckpt_step": int(dstate.step), "variants": {}}
    for name, draw in variants.items():
        clouds, dt = draw()
        m = evaluate(ref, clouds, ["jsd", "mmd"], "64")
        report["variants"][name] = {
            "gen_seconds": round(dt, 1),
            "samples_per_sec": round(args.n_eval / dt, 2),
            **{k: round(float(v), 6) for k, v in m.items()}}
        print(json.dumps({name: report["variants"][name]}), flush=True)

    d50 = report["variants"]["ddim50"]
    d20 = report["variants"]["dpm20"]
    report["dpm20_speedup_vs_ddim50"] = round(
        d20["samples_per_sec"] / d50["samples_per_sec"], 2)
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
