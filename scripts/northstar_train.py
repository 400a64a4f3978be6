#!/usr/bin/env python
"""Trained-model north star (VERDICT r1 #4): prove the pipeline LEARNS.

Trains the two-stage LiDM end to end on a fixed synthetic training
distribution, then shows trained-weight samples beat (a) a random-weights
model and (b) pure noise on JSD/MMD against held-out scenes from the same
distribution. Writes NORTHSTAR_r02.json.

Stage A: VQ-GAN range AE (use_mask) on 64x1024 synthetic KITTI-geometry scans.
Stage B: latent DDPM (U-Net) over the frozen stage-A latents, with EMA.
Stage C: 50-step DDIM samples -> decode -> reproject -> JSD/MMD vs held-out
         references; same metrics for the random-init model.
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
    p.add_argument("--ae-steps", type=int, default=6000)
    p.add_argument("--lidm-steps", type=int, default=12000)
    p.add_argument("--ae-batch", type=int, default=8)
    p.add_argument("--lidm-batch", type=int, default=16)
    p.add_argument("--pool", type=int, default=512, help="train scenes")
    p.add_argument("--n-eval", type=int, default=256)
    p.add_argument("--sample-steps", type=int, default=50)
    p.add_argument("--chunk", type=int, default=50,
                   help="optimizer steps fused per dispatch (lax.scan)")
    p.add_argument("--workdir", default="./runs/northstar_r02")
    p.add_argument("--out", default="NORTHSTAR_r02.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", help="CI-sized smoke run")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.losses.vq_loss import VQLossConfig
    from lidar_layout_tpu.models.autoencoder import AEConfig, VQModel
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.models.unet import UNetConfig
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, LidarGeometry
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.eval.metrics import evaluate
    from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                   make_ae_optimizers)
    from lidar_layout_tpu.train.diffusion_trainer import (create_train_state,
                                                          ema_params,
                                                          make_optimizer)

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.perf_counter()
    report = {"stages": {}}

    if args.tiny:
        geom = LidarGeometry(size=(16, 128))
        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=2, num_res_blocks=1)
        unet_cfg = UNetConfig(in_channels=8, model_channels=32, out_channels=8,
                              num_res_blocks=1, attention_resolutions=(2,),
                              channel_mult=(1, 2), num_head_channels=8)
        diff_cfg = DiffusionConfig(timesteps=256, latent_shape=(4, 16, 8))
        n_points = 16384
    else:
        geom = KITTI_GEOMETRY
        ae_cfg = AEConfig(ch=32, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=2, num_res_blocks=2)
        unet_cfg = UNetConfig(in_channels=8, model_channels=128,
                              out_channels=8, num_res_blocks=2,
                              attention_resolutions=(4, 2, 1),
                              channel_mult=(1, 2, 4), num_head_channels=32)
        diff_cfg = DiffusionConfig(timesteps=1024, linear_start=0.0015,
                                   linear_end=0.0195,
                                   latent_shape=(16, 128, 8))
        n_points = 120000

    h, w = geom.size

    # ---- fixed training distribution: pool of projected synthetic scenes ----
    print(f"[northstar] building {args.pool}-scene training pool...",
          flush=True)

    @jax.jit
    def project(pts):
        img, _ = L.pcd2range(pts, geom)
        model_img, mask = L.process_scan(img, geom)
        return model_img, mask

    pool = np.zeros((args.pool, h, w, 1), np.float32)
    pool_mask = np.zeros((args.pool, h, w, 1), np.float32)
    for i in range(args.pool):
        pts = synthetic_scene(np.random.default_rng(i), n_points)
        model_img, hit = project(jnp.asarray(pts))
        pool[i, ..., 0] = np.asarray(model_img)
        pool_mask[i, ..., 0] = np.asarray(hit).astype(np.float32)
    ref_clouds = []
    for i in range(args.n_eval):
        ref_clouds.append(synthetic_scene(
            np.random.default_rng(10_000 + i), n_points))

    # device-resident pool: per step only a handful of int32 indices cross the
    # relay. (Host->device batches every step pinned unbounded client memory —
    # the r2 first attempt leaked to 62 GB RSS and crawled.)
    pool_dev = jnp.asarray(pool)
    pool_mask_dev = jnp.asarray(pool_mask)

    def make_batch_fn(bs):
        # device-side batch builder for the scan-chunked drivers: the whole
        # chunk of K steps (index draw + gather + fwd/bwd + update) is ONE
        # XLA program, so the ~35 ms/dispatch relay cost amortizes to K.
        def batch_fn(rng):
            idx = jax.random.randint(rng, (bs,), 0, args.pool)
            return {"image": jnp.take(pool_dev, idx, axis=0),
                    "mask": jnp.take(pool_mask_dev, idx, axis=0)}
        return batch_fn

    # ------------------------------- stage A: VQ-GAN AE -------------------
    print("[northstar] stage A: training VQ-GAN AE...", flush=True)
    ae = VQModel(ae_cfg, n_embed=2048, embed_dim=8, use_mask=True)
    loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0, curve_length=1,
                            disc_start=2000, disc_weight=0.3)
    geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
    disc = LiDARNLayerDiscriminator()
    tx_g, tx_d = make_ae_optimizers(2e-4, 2e-4)
    ae_state = create_ae_state(ae, disc, jax.random.key(0), (h, w, 1),
                               tx_g, tx_d, loss_cfg, geo)

    from lidar_layout_tpu.train.checkpoint import (latest_step,
                                                   restore_checkpoint,
                                                   save_checkpoint)
    ae_ckpt_dir = os.path.join(args.workdir, "ckpt_ae")

    t0 = time.perf_counter()
    first_rec = last_rec = None
    if latest_step(ae_ckpt_dir) is not None and not args.tiny:
        ae_state = restore_checkpoint(ae_ckpt_dir, ae_state)
        print(f"[northstar] stage A restored from {ae_ckpt_dir}", flush=True)
        first_rec = last_rec = float("nan")
    else:
        from lidar_layout_tpu.train.ae_trainer import make_chunked_ae_train_step
        chunk = max(min(args.chunk, args.ae_steps), 1)
        n_chunks = max(args.ae_steps // chunk, 1)
        ae_chunked = make_chunked_ae_train_step(
            ae, disc, loss_cfg, geo, tx_g, tx_d,
            make_batch_fn(args.ae_batch), chunk)
        for c in range(n_chunks):
            ae_state, logs = ae_chunked(ae_state, jax.random.key(c))
            if c % max(n_chunks // 20, 1) == 0 or c == n_chunks - 1:
                rec = float(logs["nll_loss"])
                if first_rec is None:
                    first_rec = rec
                last_rec = rec
                print(f"  ae step {(c + 1) * chunk}: "
                      f"nll={float(logs['nll_loss']):.4f} "
                      f"q={float(logs['quant_loss']):.4f}", flush=True)
        args.ae_steps = n_chunks * chunk  # actual steps run
        save_checkpoint(ae_ckpt_dir, args.ae_steps, ae_state)
        print(f"[northstar] stage A checkpoint -> {ae_ckpt_dir}", flush=True)
    report["stages"]["ae"] = {
        "steps": args.ae_steps, "seconds": round(time.perf_counter() - t0, 1),
        "nll_first": round(first_rec, 4), "nll_last": round(last_rec, 4)}

    # ------------------------------- stage B: latent DDPM -----------------
    print("[northstar] stage B: training latent diffusion...", flush=True)
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=2048, embed_dim=8, use_mask=True)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    params["first_stage"] = ae_state.params_g  # trained stage A, frozen
    tx = make_optimizer(2e-4)
    dstate = create_train_state(model, params, tx)

    t0 = time.perf_counter()
    first_loss = last_loss = None
    from lidar_layout_tpu.train.diffusion_trainer import make_chunked_train_step
    chunk = max(min(args.chunk, args.lidm_steps), 1)
    n_chunks = max(args.lidm_steps // chunk, 1)
    dchunked = make_chunked_train_step(model, tx,
                                       make_batch_fn(args.lidm_batch), chunk)
    for c in range(n_chunks):
        dstate, logs = dchunked(dstate, jax.random.key(100_000 + c))
        if c % max(n_chunks // 20, 1) == 0 or c == n_chunks - 1:
            cur = float(logs["loss"])
            if first_loss is None:
                first_loss = cur
            last_loss = cur
            print(f"  lidm step {(c + 1) * chunk}: loss={cur:.4f}", flush=True)
    report["stages"]["lidm"] = {
        "steps": n_chunks * chunk,
        "seconds": round(time.perf_counter() - t0, 1),
        "loss_first": round(first_loss, 4), "loss_last": round(last_loss, 4)}

    # ------------------------------- stage C: sample + eval ---------------
    print("[northstar] stage C: sampling + eval...", flush=True)
    lh, lw, lc = diff_cfg.latent_shape
    batch = 32

    def draw_clouds(sample_params, seed):
        @jax.jit
        def sample_batch(ps, key):
            z = ddim_sample(model, ps, key, (batch, lh, lw, lc),
                            steps=args.sample_steps)
            imgs = model.decode_first_stage(ps, z)
            xyz, valid = jax.vmap(lambda im: L.range2pcd(im, geom))(
                imgs[..., 0])
            return xyz, valid

        clouds = []
        for i in range((args.n_eval + batch - 1) // batch):
            xyz, valid = jax.tree.map(
                np.asarray, sample_batch(sample_params,
                                         jax.random.key(seed + i)))
            for pc, v in zip(xyz, valid):
                clouds.append(pc[v])
        return clouds[: args.n_eval]

    trained = ema_params(model, dstate)
    t0 = time.perf_counter()
    trained_clouds = draw_clouds(trained, 7_000)
    gen_secs = time.perf_counter() - t0

    random_params = model.init(jax.random.key(99), image_shape=(h, w, 1))
    random_clouds = draw_clouds(random_params, 8_000)

    # AE-reconstruction ceiling: held-out scans -> stage-A encode/decode ->
    # reproject. Isolates first-stage quality from the diffusion prior: the
    # trained sampler can at best match this row, so a big trained-vs-recon
    # gap blames stage B, a big recon-vs-self gap blames stage A.
    @jax.jit
    def ae_recon_batch(ps, imgs):
        z = model.encode_first_stage(ps, imgs)
        rec = model.decode_first_stage(ps, z)
        xyz, valid = jax.vmap(lambda im: L.range2pcd(im, geom))(rec[..., 0])
        return xyz, valid

    recon_clouds = []
    for i in range(0, args.n_eval, batch):
        imgs = np.stack([np.asarray(project(jnp.asarray(p))[0])[..., None]
                         for p in ref_clouds[i:i + batch]])
        xyz, valid = jax.tree.map(
            np.asarray, ae_recon_batch(trained, jnp.asarray(imgs)))
        for pc, v in zip(xyz, valid):
            recon_clouds.append(pc[v])
    recon_clouds = recon_clouds[: args.n_eval]

    # pure-noise baseline: uniform points in the scene volume
    noise_clouds = [np.random.default_rng(i).uniform(
        (-50, -50, -3), (50, 50, 2), (4096, 3)).astype(np.float32)
        for i in range(args.n_eval)]

    data_type = "64" if not args.tiny else "64"
    m_trained = evaluate(ref_clouds, trained_clouds, ["jsd", "mmd"], data_type)
    m_random = evaluate(ref_clouds, random_clouds, ["jsd", "mmd"], data_type)
    m_noise = evaluate(ref_clouds, noise_clouds, ["jsd", "mmd"], data_type)
    m_recon = evaluate(ref_clouds, recon_clouds, ["jsd", "mmd"], data_type)
    # sanity ceiling: held-out real scenes vs themselves (split halves)
    half = args.n_eval // 2
    m_self = evaluate(ref_clouds[:half], ref_clouds[half:], ["jsd", "mmd"],
                      data_type)

    report["eval"] = {
        "n_samples": args.n_eval,
        "gen_seconds": round(gen_secs, 1),
        "trained": {k: round(float(v), 6) for k, v in m_trained.items()},
        "random_weights": {k: round(float(v), 6) for k, v in m_random.items()},
        "noise": {k: round(float(v), 6) for k, v in m_noise.items()},
        "ae_recon_ceiling": {k: round(float(v), 6)
                             for k, v in m_recon.items()},
        "heldout_self": {k: round(float(v), 6) for k, v in m_self.items()},
    }
    report["trained_beats_random"] = bool(
        m_trained["jsd"] < m_random["jsd"])
    report["trained_beats_noise"] = bool(m_trained["jsd"] < m_noise["jsd"])
    report["total_seconds"] = round(time.perf_counter() - t_start, 1)
    report["hardware"] = str(jax.devices()[0].platform)
    report["description"] = (
        "Two-stage LiDM trained from scratch on a fixed synthetic "
        "distribution; JSD/MMD of trained EMA samples vs held-out scenes, "
        "compared against random-weights and noise baselines.")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)

    # persist checkpoints for sample.py --eval reuse
    try:
        from lidar_layout_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(os.path.join(args.workdir, "ckpt_lidm"),
                        int(dstate.step), dstate)
        print(f"[northstar] checkpoints -> {args.workdir}", flush=True)
    except Exception as e:  # checkpointing must not void the report
        print(f"[northstar] checkpoint save failed: {e}", flush=True)


if __name__ == "__main__":
    main()
