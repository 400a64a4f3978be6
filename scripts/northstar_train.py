#!/usr/bin/env python
"""Trained-model north star (VERDICT r1 #4): prove the pipeline LEARNS.

Trains the two-stage LiDM end to end on a fixed synthetic training
distribution, then shows trained-weight samples beat (a) a random-weights
model and (b) pure noise on JSD/MMD against held-out scenes from the same
distribution. Writes NORTHSTAR_r03.json.

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


def majority_beats(trained, baseline, mset):
    """Per-metric wins + majority verdict (lower is better for all metrics)."""
    per = {k: bool(trained[k] < baseline[k]) for k in mset}
    return per, sum(per.values()) * 2 > len(per)


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
    p.add_argument("--workdir", default="./runs/northstar_r05")
    p.add_argument("--out", default="NORTHSTAR_r05.json")
    p.add_argument("--lidm-lr", type=float, default=2e-4)
    p.add_argument("--cosine", action="store_true",
                   help="1k-step warmup + cosine decay to 10% for stage B")
    p.add_argument("--scale-by-std", action="store_true",
                   help="calibrate scale_factor=1/std(z) before stage B "
                        "(ddpm.py:540-553); fixes the SNR mismatch when the "
                        "first stage's latents aren't unit-variance")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", help="CI-sized smoke run")
    p.add_argument("--ae-ch", type=int, default=0,
                   help="stage-A base width override (0 = family default; "
                        "the reference flagship uses ch=64, "
                        "configs/autoencoder/kitti/autoencoder_c2_p4.yaml)")
    p.add_argument("--n-embed", type=int, default=2048,
                   help="VQ codebook size (reference flagship: 16384)")
    p.add_argument("--no-mask", action="store_true",
                   help="reference flagship stage-A recipe: no ray-drop "
                        "head, pure pixel L1 + smooth/normal, geo/mask "
                        "factors 0, GAN off (autoencoder_c2_p4.yaml). "
                        "r03 diag: the mask+geo recipe diluted the depth "
                        "gradient 3x and recon depth MAE was the JSD "
                        "bottleneck")
    p.add_argument("--vq-init", default="taming",
                   help="taming | normal codebook init (nn/quantize.py)")
    p.add_argument("--perceptual-factor", type=float, default=0.0,
                   help="rangenet_dec perceptual loss weight for stage A "
                        "(vqperceptual.py:109-114; the loss net IS the FRID "
                        "feature net — same RangeNet-21, same key(0) init — "
                        "mirroring the reference where losses/perceptual.py "
                        "and eval FRID share the pretrained rangenet). r3 "
                        "left the recon FRID ceiling at 198 vs a 2.5 floor "
                        "with JSD/MMD saturated: the AE loses feature-space "
                        "detail that pixel losses don't see (VERDICT r3 #4)")
    p.add_argument("--perceptual-stages", default="",
                   help="comma list of rangenet stages for the perceptual "
                        "loss (default all dec_0..dec_4; see ae_diag)")
    p.add_argument("--descriptor-factor", type=float, default=0.0,
                   help="L2 match on the FRID descriptor itself (deepest "
                        "perceptual layer; VERDICT r4 task 2)")
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
    from lidar_layout_tpu.eval.metrics import evaluate
    from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                   make_ae_optimizers)
    from lidar_layout_tpu.train.diffusion_trainer import (create_train_state,
                                                          ema_params,
                                                          make_optimizer)

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.perf_counter()
    report = {"stages": {}, "config": {
        k: getattr(args, k) for k in ("ae_steps", "lidm_steps", "ae_batch",
                                      "lidm_batch", "pool", "ae_ch",
                                      "n_embed", "no_mask", "vq_init",
                                      "cosine", "scale_by_std",
                                      "perceptual_factor",
                                      "perceptual_stages",
                                      "descriptor_factor")}}

    if args.tiny:
        geom = LidarGeometry(size=(16, 128))
        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=1 if args.no_mask else 2, num_res_blocks=1)
        unet_cfg = UNetConfig(in_channels=8, model_channels=32, out_channels=8,
                              num_res_blocks=1, attention_resolutions=(2,),
                              channel_mult=(1, 2), num_head_channels=8)
        diff_cfg = DiffusionConfig(timesteps=256, latent_shape=(4, 16, 8))
        n_points = 16384
    else:
        geom = KITTI_GEOMETRY
        ae_cfg = AEConfig(ch=args.ae_ch or 32, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=1 if args.no_mask else 2, num_res_blocks=2)
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
    # Scenes are generated AND projected on device (data/device_synthetic):
    # this round's relay moves ~300 KB/s, so the old host-numpy path (512 x
    # 1.4 MB raw clouds up, 384 x 0.8 MB eval clouds down) cost tens of
    # minutes of pure transfer — and r02's eval stage 5.5 h. Only compact f16
    # range images are ever downloaded; clouds are host-reprojected.
    from lidar_layout_tpu.data.device_synthetic import (host_range2pcd,
                                                        scene_image_batch)

    print(f"[northstar] building {args.pool}-scene training pool on device...",
          flush=True)
    gen_b = 64
    chunks = []
    for i in range(0, args.pool, gen_b):
        im, mk = scene_image_batch(jax.random.key(1_000_000 + i), gen_b,
                                   n_points, geom)
        chunks.append((im[..., None], mk[..., None]))
    pool_data = {"image": jnp.concatenate([c[0] for c in chunks])[:args.pool],
                 "mask": jnp.concatenate([c[1] for c in chunks])[:args.pool]}
    jax.block_until_ready(pool_data)
    pool = np.asarray(pool_data["image"][:16].astype(jnp.float16)
                      ).astype(np.float32)  # small host slice (scale probes)

    # Held-out references are REPROJECTED clouds (range roundtrip), matching
    # the reference's eval convention: sample.py:298-300 collates
    # example['reproj'] = range2pcd(pcd2range(scan)) (kitti.py:75-77), never
    # the raw scan. Raw-vs-reproj is apples-to-oranges (~+0.13 JSD, ~2x MMD:
    # the 64x1024 projection drops ~82% of a 120k-point scene).
    ref_imgs, ref_clouds = [], []
    for i in range(0, args.n_eval, gen_b):
        im, _ = scene_image_batch(jax.random.key(9_000_000 + i), gen_b,
                                  n_points, geom)
        ref_imgs.append(np.asarray(im.astype(jnp.float16)))
    ref_imgs = np.concatenate(ref_imgs).astype(np.float32)[:args.n_eval]
    ref_clouds = [host_range2pcd(ref_imgs[i], geom)
                  for i in range(args.n_eval)]

    def make_batch_fn(bs):
        # device-side batch builder for the scan-chunked drivers: the whole
        # chunk of K steps (index draw + gather + fwd/bwd + update) is ONE
        # XLA program, so the ~35 ms/dispatch relay cost amortizes to K.
        def batch_fn(rng, data):
            idx = jax.random.randint(rng, (bs,), 0, args.pool)
            return {"image": jnp.take(data["image"], idx, axis=0),
                    "mask": jnp.take(data["mask"], idx, axis=0)}
        return batch_fn

    # ------------------------------- stage A: VQ-GAN AE -------------------
    print("[northstar] stage A: training VQ-GAN AE...", flush=True)
    ae = VQModel(ae_cfg, n_embed=args.n_embed, embed_dim=8,
                 use_mask=not args.no_mask, vq_init=args.vq_init)
    if args.no_mask:
        # reference flagship recipe (autoencoder_c2_p4.yaml): pixel L1 at
        # full weight + smooth/normal 0.1, disc_start=1 under the 'until'
        # gate = GAN off
        loss_cfg = VQLossConfig(mask_factor=0.0, geo_factor=0.0,
                                curve_length=1, disc_start=1,
                                disc_weight=0.6)
    else:
        loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0,
                                curve_length=1, disc_start=2000,
                                disc_weight=0.3)
    perceptual_fn = None
    if args.perceptual_factor > 0 or args.descriptor_factor > 0:
        import dataclasses as _dc
        pf = max(args.perceptual_factor, 1e-9)
        loss_cfg = _dc.replace(loss_cfg, perceptual_factor=pf)
        from lidar_layout_tpu.losses.perceptual import (DEFAULT_STAGES,
                                                        make_perceptual_fn)
        stages = (tuple(args.perceptual_stages.split(","))
                  if args.perceptual_stages else DEFAULT_STAGES)
        perceptual_fn = make_perceptual_fn(  # key(0) = FRID feature net
            geom, stages=stages,
            descriptor_weight=args.descriptor_factor / pf)
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
    chunk = max(min(args.chunk, args.ae_steps), 1)
    n_chunks = max(args.ae_steps // chunk, 1)
    saved_a = None if args.tiny else latest_step(ae_ckpt_dir)
    a_trained_this_run = not (saved_a is not None
                              and saved_a >= n_chunks * chunk)
    if not a_trained_this_run:
        ae_state = restore_checkpoint(ae_ckpt_dir, ae_state)
        print(f"[northstar] stage A restored from {ae_ckpt_dir}", flush=True)
        first_rec = last_rec = None  # training stats live in the run's log
    else:
        start_c = 0
        if saved_a is not None:
            ae_state = restore_checkpoint(ae_ckpt_dir, ae_state)
            start_c = saved_a // chunk
            print(f"[northstar] stage A resuming at step {saved_a}",
                  flush=True)
        from lidar_layout_tpu.train.ae_trainer import make_chunked_ae_train_step
        ae_chunked = make_chunked_ae_train_step(
            ae, disc, loss_cfg, geo, tx_g, tx_d,
            make_batch_fn(args.ae_batch), chunk,
            perceptual_fn=perceptual_fn)
        save_every = max(n_chunks // 5, 1)
        for c in range(start_c, n_chunks):
            ae_state, logs = ae_chunked(ae_state, jax.random.key(c),
                                        pool_data)
            if c % max(n_chunks // 20, 1) == 0 or c == n_chunks - 1:
                rec = float(logs["nll_loss"])
                if first_rec is None:
                    first_rec = rec
                last_rec = rec
                print(f"  ae step {(c + 1) * chunk}: "
                      f"nll={float(logs['nll_loss']):.4f} "
                      f"q={float(logs['quant_loss']):.4f}", flush=True)
            if (c + 1) % save_every == 0 and not args.tiny \
                    and c != n_chunks - 1:
                save_checkpoint(ae_ckpt_dir, (c + 1) * chunk, ae_state)
        args.ae_steps = n_chunks * chunk  # actual steps run
        save_checkpoint(ae_ckpt_dir, args.ae_steps, ae_state)
        print(f"[northstar] stage A checkpoint -> {ae_ckpt_dir}", flush=True)
    report["stages"]["ae"] = {
        "steps": args.ae_steps, "seconds": round(time.perf_counter() - t0, 1),
        # provenance (VERDICT r4 task 8): "seconds" of a restored stage is
        # restore time, NOT training time — say which this was
        "trained_this_run": a_trained_this_run,
        "restored_from": None if saved_a is None else ae_ckpt_dir,
        "nll_first": None if first_rec is None else round(first_rec, 4),
        "nll_last": None if last_rec is None else round(last_rec, 4)}

    # ------------------------------- stage B: latent DDPM -----------------
    print("[northstar] stage B: training latent diffusion...", flush=True)
    if args.scale_by_std:
        import dataclasses
        diff_cfg = dataclasses.replace(diff_cfg, scale_by_std=True)
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=args.n_embed, embed_dim=8,
                            use_mask=not args.no_mask, vq_init=args.vq_init)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    params["first_stage"] = ae_state.params_g  # trained stage A, frozen
    if args.scale_by_std:
        from lidar_layout_tpu.models.diffusion import apply_scale_by_std
        s = apply_scale_by_std(model, params, jnp.asarray(pool[:16]))
        report["stages"]["scale_factor"] = round(float(s), 4)
        print(f"[northstar] scale_by_std: scale_factor={s:.4f}", flush=True)
    if args.cosine:
        from lidar_layout_tpu.train.lr_schedule import \
            lambda_warmup_cosine_optax
        lr = lambda_warmup_cosine_optax(
            base_lr=args.lidm_lr, warm_up_steps=1000, lr_min=0.1, lr_max=1.0,
            lr_start=0.01, max_decay_steps=args.lidm_steps)
    else:
        lr = args.lidm_lr
    tx = make_optimizer(lr)
    dstate = create_train_state(model, params, tx)

    # latent-scale diagnostic: std(z) far from 1 would mean the diffusion
    # schedule's SNR is mismatched (scale_by_std exists for that case; the
    # reference's VQ first stage keeps scale_factor=1, uncond_c2_p4.yaml)
    z_probe = model.encode_first_stage(params, jnp.asarray(pool[:16]))
    report["stages"]["latent_std"] = round(float(jnp.std(z_probe)), 4)

    t0 = time.perf_counter()
    first_loss = last_loss = None
    lidm_ckpt_dir = os.path.join(args.workdir, "ckpt_lidm")
    chunk = max(min(args.chunk, args.lidm_steps), 1)
    n_chunks = max(args.lidm_steps // chunk, 1)
    saved_b = None if args.tiny else latest_step(lidm_ckpt_dir)
    b_trained_this_run = not (saved_b is not None
                              and saved_b >= n_chunks * chunk)
    if not b_trained_this_run:
        dstate = restore_checkpoint(lidm_ckpt_dir, dstate)
        print(f"[northstar] stage B restored from {lidm_ckpt_dir}",
              flush=True)
        first_loss = last_loss = None  # training stats live in the run's log
        n_chunks, chunk = saved_b, 1
    else:
        start_c = 0
        if saved_b is not None:
            dstate = restore_checkpoint(lidm_ckpt_dir, dstate)
            start_c = saved_b // chunk
            print(f"[northstar] stage B resuming at step {saved_b}",
                  flush=True)
        from lidar_layout_tpu.train.diffusion_trainer import \
            make_chunked_train_step
        dchunked = make_chunked_train_step(model, tx,
                                           make_batch_fn(args.lidm_batch),
                                           chunk)
        save_every = max(n_chunks // 10, 1)
        for c in range(start_c, n_chunks):
            dstate, logs = dchunked(dstate, jax.random.key(100_000 + c),
                                    pool_data)
            if c % max(n_chunks // 20, 1) == 0 or c == n_chunks - 1:
                cur = float(logs["loss"])
                if first_loss is None:
                    first_loss = cur
                last_loss = cur
                print(f"  lidm step {(c + 1) * chunk}: loss={cur:.4f}",
                      flush=True)
            if (c + 1) % save_every == 0 and not args.tiny \
                    and c != n_chunks - 1:
                save_checkpoint(lidm_ckpt_dir, (c + 1) * chunk, dstate)
        save_checkpoint(lidm_ckpt_dir, n_chunks * chunk, dstate)
        print("[northstar] stage B checkpoint saved", flush=True)
    report["stages"]["lidm"] = {
        "steps": n_chunks * chunk,
        "seconds": round(time.perf_counter() - t0, 1),
        "trained_this_run": b_trained_this_run,
        "restored_from": None if saved_b is None else lidm_ckpt_dir,
        "loss_first": None if first_loss is None else round(first_loss, 4),
        "loss_last": None if last_loss is None else round(last_loss, 4)}

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
            return imgs[..., 0].astype(jnp.float16)  # compact relay download

        clouds = []
        for i in range((args.n_eval + batch - 1) // batch):
            imgs = np.asarray(sample_batch(sample_params,
                                           jax.random.key(seed + i))
                              ).astype(np.float32)
            clouds += [host_range2pcd(im, geom) for im in imgs]
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
        return rec[..., 0].astype(jnp.float16)

    recon_clouds = []
    for i in range(0, args.n_eval, batch):
        imgs = jnp.asarray(ref_imgs[i:i + batch, ..., None])
        rec = np.asarray(ae_recon_batch(trained, imgs)).astype(np.float32)
        recon_clouds += [host_range2pcd(im, geom) for im in rec]
    recon_clouds = recon_clouds[: args.n_eval]

    # pure-noise baseline: uniform points in the scene volume
    noise_clouds = [np.random.default_rng(i).uniform(
        (-50, -50, -3), (50, 50, 2), (4096, 3)).astype(np.float32)
        for i in range(args.n_eval)]

    # persist the clouds: post-hoc metrics without regenerating
    def ragged(cl):
        # np.asarray(..., dtype=object) on SAME-shape clouds would box every
        # scalar into a PyObject (GBs for 256x120k pts); fill explicitly
        arr = np.empty(len(cl), dtype=object)
        arr[:] = [c.astype(np.float16) for c in cl]
        return arr

    np.savez(os.path.join(args.workdir, "eval_clouds.npz"),
             **{name: ragged(cl)
                for name, cl in [("reference", ref_clouds),
                                 ("trained", trained_clouds),
                                 ("random_weights", random_clouds),
                                 ("ae_recon", recon_clouds)]})

    # FRID with the exact RangeNet-21 extractor at FIXED random init (no
    # pretrained weights in this env — registry logs this loudly). Random-
    # projection Frechet distances still rank distributions; only relative
    # comparisons below are meaningful, not the reference's absolute tables.
    from lidar_layout_tpu.eval.registry import build_feature_fn
    ffn = {"frid": build_feature_fn("64", "range")}
    # pin the extractor so cross-round FRID deltas are comparable (r2 weak #6)
    report["frid_feature_hash"] = ffn["frid"].param_hash

    data_type = "64" if not args.tiny else "64"
    mset = ["jsd", "mmd", "frid"]
    m_trained = evaluate(ref_clouds, trained_clouds, mset, data_type,
                         feature_fn=ffn)
    m_random = evaluate(ref_clouds, random_clouds, mset, data_type,
                        feature_fn=ffn)
    m_noise = evaluate(ref_clouds, noise_clouds, mset, data_type,
                       feature_fn=ffn)
    m_recon = evaluate(ref_clouds, recon_clouds, mset, data_type,
                       feature_fn=ffn)
    # sanity ceiling: held-out real scenes vs themselves (split halves)
    half = args.n_eval // 2
    m_self = evaluate(ref_clouds[:half], ref_clouds[half:], mset, data_type,
                      feature_fn=ffn)

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
    # verdicts: majority vote over the metric set, per-metric detail alongside
    per_random, maj_random = majority_beats(m_trained, m_random, mset)
    per_noise, maj_noise = majority_beats(m_trained, m_noise, mset)
    report["trained_beats_random"] = maj_random
    report["trained_beats_noise"] = maj_noise
    report["trained_beats_random_per_metric"] = per_random
    report["trained_beats_noise_per_metric"] = per_noise
    report["total_seconds"] = round(time.perf_counter() - t_start, 1)
    report["hardware"] = str(jax.devices()[0].platform)
    report["description"] = (
        "Two-stage LiDM trained from scratch on a fixed synthetic "
        "distribution; JSD/MMD (+ fixed-random-feature FRID, relative only) "
        "of trained EMA samples vs held-out scenes, compared against "
        "random-weights / noise baselines and the AE-reconstruction ceiling.")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
