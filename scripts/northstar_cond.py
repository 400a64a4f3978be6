#!/usr/bin/env python
"""Conditional-generation north star: semantic-map -> LiDAR (map2lidar).

Proves the CONDITIONING path learns, completing the learning-evidence table
(uncond LiDM / layout / dense / object / R2DM already have north stars).
Trains a small two-stage LiDM whose U-Net receives a SpatialRescaler'd one-hot
semantic range map as concat conditioning (the reference's map2lidar task:
kitti.py:111-124 one-hot maps, encoders/modules.py:108 SpatialRescaler,
conditioning_key 'concat').

Evidence: on held-out scenes, samples conditioned on scene i's semantic map
must reconstruct scene i's range image far better than samples conditioned on
a MISMATCHED map (shuffled by one), and better than a random-weights model —
a conditioning-free model cannot separate matched from mismatched.

Writes NORTHSTAR_COND.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SEM = 4  # ground / box / pole / void(no-hit)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ae-steps", type=int, default=3000)
    p.add_argument("--lidm-steps", type=int, default=9000)
    p.add_argument("--ae-batch", type=int, default=16)
    p.add_argument("--lidm-batch", type=int, default=32)
    p.add_argument("--pool", type=int, default=512)
    p.add_argument("--n-eval", type=int, default=64)
    p.add_argument("--sample-steps", type=int, default=50)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--workdir", default="./runs/northstar_cond")
    p.add_argument("--out", default="NORTHSTAR_COND.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", help="CI-sized smoke run")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene_labeled
    from lidar_layout_tpu.encoders.modules import SpatialRescaler
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.losses.vq_loss import VQLossConfig
    from lidar_layout_tpu.models.autoencoder import AEConfig, VQModel
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.models.unet import UNetConfig
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.ops.lidar import LidarGeometry
    from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                   make_ae_optimizers,
                                                   make_chunked_ae_train_step)
    from lidar_layout_tpu.train.checkpoint import (latest_step,
                                                   restore_checkpoint,
                                                   save_checkpoint)
    from lidar_layout_tpu.train.diffusion_trainer import (
        create_train_state, ema_params, make_chunked_train_step,
        make_optimizer)

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.perf_counter()
    report = {"stages": {}}

    if args.tiny:
        geom = LidarGeometry(size=(16, 128))
        latent = (4, 16, 8)
        ae_ch, mc, nrb, tsteps = 16, 32, 1, 256
        n_points = 16384
    else:
        geom = LidarGeometry(size=(32, 256), fov=(10.0, -30.0),
                             depth_range=(1.0, 56.0), depth_scale=6,
                             log_scale=True)
        latent = (8, 32, 8)
        ae_ch, mc, nrb, tsteps = 32, 96, 2, 1024
        n_points = 40000

    h, w = geom.size
    ae_cfg = AEConfig(ch=ae_ch, ch_mult=(1, 2, 2, 4),
                      strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                      out_ch=2, num_res_blocks=nrb)
    # concat conditioning: U-Net input = z (8) + one-hot sem map (N_SEM)
    unet_cfg = UNetConfig(in_channels=8 + N_SEM, model_channels=mc,
                          out_channels=8, num_res_blocks=nrb,
                          attention_resolutions=(4, 2),
                          channel_mult=(1, 2, 4), num_head_channels=32)
    diff_cfg = DiffusionConfig(timesteps=tsteps, linear_start=0.0015,
                               linear_end=0.0195, latent_shape=latent,
                               conditioning_key="concat")

    # ---- pool: (image, mask, semantic map) triples ------------------------
    print(f"[cond] building {args.pool}-scene labeled pool...", flush=True)

    @jax.jit
    def project(pts, labels):
        img, lab = L.pcd2range(pts, geom, features=labels)
        model_img, hit = L.process_scan(img, geom)
        # semantic map: projected class id; no-hit pixels -> void (N_SEM-1)
        sem = jnp.where(hit, lab, float(N_SEM - 1)).astype(jnp.int32)
        return model_img, hit, sem

    def build(seed0, count):
        imgs = np.zeros((count, h, w, 1), np.float32)
        masks = np.zeros((count, h, w, 1), np.float32)
        sems = np.zeros((count, h, w), np.int32)
        for i in range(count):
            pts, lab = synthetic_scene_labeled(
                np.random.default_rng(seed0 + i), n_points)
            im, hit, sem = project(jnp.asarray(pts),
                                   jnp.asarray(lab, jnp.float32))
            imgs[i, ..., 0] = np.asarray(im)
            masks[i, ..., 0] = np.asarray(hit).astype(np.float32)
            sems[i] = np.asarray(sem)
        return imgs, masks, sems

    pool, pool_mask, pool_sem = build(0, args.pool)
    ref_img, _, ref_sem = build(50_000, args.n_eval)

    onehot = np.eye(N_SEM, dtype=np.float32)
    pool_data = {"image": jnp.asarray(pool), "mask": jnp.asarray(pool_mask),
                 "cond": jnp.asarray(onehot[pool_sem])}

    def make_batch_fn(bs, with_cond):
        def batch_fn(rng, data):
            idx = jax.random.randint(rng, (bs,), 0, args.pool)
            out = {"image": jnp.take(data["image"], idx, axis=0),
                   "mask": jnp.take(data["mask"], idx, axis=0)}
            if with_cond:
                out["cond"] = jnp.take(data["cond"], idx, axis=0)
            return out
        return batch_fn

    # ---- stage A: small VQ-GAN AE (unconditional) -------------------------
    print("[cond] stage A: VQ-GAN AE...", flush=True)
    ae = VQModel(ae_cfg, n_embed=1024, embed_dim=8, use_mask=True)
    loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0, curve_length=1,
                            disc_start=max(args.ae_steps // 3, 1),
                            disc_weight=0.3)
    geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
    disc = LiDARNLayerDiscriminator()
    tx_g, tx_d = make_ae_optimizers(2e-4, 2e-4)
    ae_state = create_ae_state(ae, disc, jax.random.key(0), (h, w, 1),
                               tx_g, tx_d, loss_cfg, geo)
    ae_ckpt = os.path.join(args.workdir, "ckpt_ae")
    chunk = max(min(args.chunk, args.ae_steps), 1)
    n_chunks = max(args.ae_steps // chunk, 1)
    t0 = time.perf_counter()
    nll_first = nll_last = float("nan")
    ae_stats_path = os.path.join(args.workdir, "stats_ae.json")
    saved = None if args.tiny else latest_step(ae_ckpt)
    if saved is not None and saved >= n_chunks * chunk:
        ae_state = restore_checkpoint(ae_ckpt, ae_state)
        print("[cond] stage A restored", flush=True)
        # a fully-restored stage ran zero chunks here: recover its loss
        # trajectory from the sidecar the original run persisted
        if os.path.exists(ae_stats_path):
            with open(ae_stats_path) as f:
                prev = json.load(f)
            nll_first = prev.get("nll_first", nll_first)
            nll_last = prev.get("nll_last", nll_last)
    else:
        start_c = 0
        if saved is not None:
            ae_state = restore_checkpoint(ae_ckpt, ae_state)
            start_c = saved // chunk
            print(f"[cond] stage A resuming at step {saved}", flush=True)
        step_fn = make_chunked_ae_train_step(
            ae, disc, loss_cfg, geo, tx_g, tx_d,
            make_batch_fn(args.ae_batch, False), chunk)
        save_every = max(n_chunks // 5, 1)
        for c in range(start_c, n_chunks):
            ae_state, logs = step_fn(ae_state, jax.random.key(c), pool_data)
            if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
                cur = float(logs["nll_loss"])
                nll_first = cur if np.isnan(nll_first) else nll_first
                nll_last = cur
                print(f"  ae {(c + 1) * chunk}: nll={cur:.4f}", flush=True)
            if (c + 1) % save_every == 0 and not args.tiny \
                    and c != n_chunks - 1:
                save_checkpoint(ae_ckpt, (c + 1) * chunk, ae_state)
        if not args.tiny:
            save_checkpoint(ae_ckpt, n_chunks * chunk, ae_state)
            with open(ae_stats_path, "w") as f:
                json.dump({"nll_first": nll_first, "nll_last": nll_last}, f)
    report["stages"]["ae"] = {"steps": n_chunks * chunk,
                              "seconds": round(time.perf_counter() - t0, 1),
                              "nll_first": round(nll_first, 4),
                              "nll_last": round(nll_last, 4)}

    # ---- stage B: conditional latent DDPM ----------------------------------
    print("[cond] stage B: map-conditioned latent diffusion...", flush=True)
    cond_stage = SpatialRescaler(
        n_stages=1, wh_factors=(latent[0] / h, latent[1] / w))
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=1024, embed_dim=8, use_mask=True,
                            cond_stage=cond_stage)
    cond_ex = jnp.zeros((1, h, w, N_SEM))
    params = model.init(jax.random.key(1), image_shape=(h, w, 1),
                        cond_example=cond_ex)
    params["first_stage"] = ae_state.params_g
    tx = make_optimizer(2e-4)
    dstate = create_train_state(model, params, tx)

    lidm_ckpt = os.path.join(args.workdir, "ckpt_lidm")
    chunk = max(min(args.chunk, args.lidm_steps), 1)
    n_chunks = max(args.lidm_steps // chunk, 1)
    t0 = time.perf_counter()
    loss_first = loss_last = float("nan")
    lidm_stats_path = os.path.join(args.workdir, "stats_lidm.json")
    saved = None if args.tiny else latest_step(lidm_ckpt)
    if saved is not None and saved >= n_chunks * chunk:
        dstate = restore_checkpoint(lidm_ckpt, dstate)
        print("[cond] stage B restored", flush=True)
        if os.path.exists(lidm_stats_path):
            with open(lidm_stats_path) as f:
                prev = json.load(f)
            loss_first = prev.get("loss_first", loss_first)
            loss_last = prev.get("loss_last", loss_last)
    else:
        start_c = 0
        if saved is not None:
            dstate = restore_checkpoint(lidm_ckpt, dstate)
            start_c = saved // chunk
            print(f"[cond] stage B resuming at step {saved}", flush=True)
        step_fn = make_chunked_train_step(
            model, tx, make_batch_fn(args.lidm_batch, True), chunk)
        save_every = max(n_chunks // 10, 1)
        for c in range(start_c, n_chunks):
            dstate, logs = step_fn(dstate, jax.random.key(7_000 + c),
                                   pool_data)
            if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
                cur = float(logs["loss"])
                loss_first = cur if np.isnan(loss_first) else loss_first
                loss_last = cur
                print(f"  lidm {(c + 1) * chunk}: loss={cur:.4f}", flush=True)
            if (c + 1) % save_every == 0 and not args.tiny \
                    and c != n_chunks - 1:
                save_checkpoint(lidm_ckpt, (c + 1) * chunk, dstate)
        if not args.tiny:
            save_checkpoint(lidm_ckpt, n_chunks * chunk, dstate)
            with open(lidm_stats_path, "w") as f:
                json.dump({"loss_first": loss_first,
                           "loss_last": loss_last}, f)
    report["stages"]["lidm"] = {"steps": n_chunks * chunk,
                                "seconds": round(time.perf_counter() - t0, 1),
                                "loss_first": round(loss_first, 4),
                                "loss_last": round(loss_last, 4)}

    # ---- stage C: conditional consistency eval -----------------------------
    print("[cond] stage C: matched vs mismatched sampling...", flush=True)
    lh, lw, lc = latent
    batch = min(32, args.n_eval)

    @jax.jit
    def sample_with_maps(ps, key, sem_onehot):
        z = ddim_sample(model, ps, key, (sem_onehot.shape[0], lh, lw, lc),
                        steps=args.sample_steps,
                        cond=model.get_learned_conditioning(
                            ps, sem_onehot))
        return model.decode_first_stage(ps, z)

    def masked_l1(sample, target):
        """L1 over pixels that are hits in BOTH (model-space images)."""
        hit = (sample[..., 0] > -0.999) & (target[..., 0] > -0.999)
        d = np.abs(sample[..., 0] - target[..., 0]) * hit
        return float(d.sum() / np.maximum(hit.sum(), 1))

    def run_eval(ps, seed):
        sem = onehot[ref_sem]                       # matched maps
        sem_mis = np.roll(sem, 1, axis=0)           # mismatched (shifted)
        l1_m, l1_x = [], []
        for i in range(0, args.n_eval, batch):
            sl = slice(i, i + batch)
            sm = jax.tree.map(np.asarray, sample_with_maps(
                ps, jax.random.key(seed + i), jnp.asarray(sem[sl])))
            sx = jax.tree.map(np.asarray, sample_with_maps(
                ps, jax.random.key(seed + i + 777), jnp.asarray(sem_mis[sl])))
            for j in range(sm.shape[0]):
                l1_m.append(masked_l1(sm[j], ref_img[sl][j]))
                # mismatched samples scored against the map's TRUE scene:
                # if conditioning works they match the rolled scene, not this
                l1_x.append(masked_l1(sx[j], ref_img[sl][j]))
        return float(np.mean(l1_m)), float(np.mean(l1_x))

    trained = ema_params(model, dstate)
    l1_matched, l1_mismatched = run_eval(trained, 100)
    rnd = model.init(jax.random.key(99), image_shape=(h, w, 1),
                     cond_example=cond_ex)
    rnd["first_stage"] = ae_state.params_g  # same decoder; only prior random
    l1_rnd_matched, l1_rnd_mismatched = run_eval(rnd, 200)

    # the two natural ceilings that scale the separation:
    # - AE round-trip L1 = the floor any matched sample can reach
    # - data-mismatch L1 = what a PERFECT conditional model scores on a
    #   mismatched map (it reconstructs the map's true scene, which is then
    #   compared against this scene)
    @jax.jit
    def ae_roundtrip(ps, imgs):
        return model.decode_first_stage(ps, model.encode_first_stage(ps, imgs))

    rec = np.asarray(ae_roundtrip(trained, jnp.asarray(ref_img)))
    l1_floor = float(np.mean([masked_l1(rec[j], ref_img[j])
                              for j in range(args.n_eval)]))
    rolled = np.roll(ref_img, 1, axis=0)
    l1_data_mis = float(np.mean([masked_l1(rolled[j], ref_img[j])
                                 for j in range(args.n_eval)]))

    sep_model = l1_mismatched - l1_matched
    sep_max = max(l1_data_mis - l1_floor, 1e-9)
    report["eval"] = {
        "n_samples": args.n_eval,
        "trained": {"l1_matched": round(l1_matched, 4),
                    "l1_mismatched": round(l1_mismatched, 4)},
        "random_weights": {"l1_matched": round(l1_rnd_matched, 4),
                           "l1_mismatched": round(l1_rnd_mismatched, 4)},
        "ae_recon_floor": round(l1_floor, 4),
        "data_mismatch_l1": round(l1_data_mis, 4),
        "separation_fraction": round(sep_model / sep_max, 4),
    }
    # learned = the matched/mismatched gap covers a real fraction of the
    # maximum achievable gap AND matched beats the unconditional-prior score
    report["conditioning_learned"] = bool(
        sep_model > 0.3 * sep_max and l1_matched < l1_rnd_matched)
    report["total_seconds"] = round(time.perf_counter() - t_start, 1)
    report["hardware"] = str(jax.devices()[0].platform)
    report["description"] = (
        "Map-conditioned LiDM (concat conditioning via SpatialRescaler'd "
        "one-hot semantic range maps). Samples conditioned on a held-out "
        "scene's map must match that scene's range image (masked L1) better "
        "than samples conditioned on a mismatched map and better than a "
        "random-weights prior.")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
