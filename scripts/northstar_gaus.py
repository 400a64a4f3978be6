#!/usr/bin/env python
"""Gaus-family north star: prove VQModel_Gaus (gaussian decoder) LEARNS.

Trains VQModelGaus — the VQ-GAN whose second decoder tower emits per-pixel
3D-gaussian splat parameters that are re-rendered into the panorama
(reference lidm/models/ae/model_lidm.py:419-566 Gaus_Decoder +
lidm/modules/losses/vqperceptual.py:217-273 forward_s2, here
models/autoencoder_gaus.py over ops/gaussian_raster) on projected synthetic
scenes, then reports the held-out RENDERED-range L1 (the s2 quantity: encode
-> decode gaussians -> rasterize -> compare in model space) for trained vs
random weights, plus the plain decode reconstruction L1.
Writes NORTHSTAR_GAUS.json.
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
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--pool", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n-eval", type=int, default=32)
    p.add_argument("--out", default="NORTHSTAR_GAUS.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.losses.vq_loss import VQLossConfig
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.autoencoder_gaus import (
        VQModelGaus, render_range_from_gaussians)
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.ops.lidar import LidarGeometry, depth_to_model
    from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                   make_ae_optimizers,
                                                   make_chunked_ae_train_step)

    if args.tiny:
        args.steps, args.chunk, args.pool, args.n_eval = 20, 5, 16, 4
        geom = LidarGeometry(size=(16, 128))
        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=2, num_res_blocks=1)
        n_points = 16384
    else:
        geom = LidarGeometry(size=(32, 512))
        ae_cfg = AEConfig(ch=32, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=2, num_res_blocks=2)
        n_points = 60000
    h, w = geom.size

    t_start = time.perf_counter()
    print(f"[gaus-ns] building {args.pool}-scene pool at {h}x{w}...",
          flush=True)

    @jax.jit
    def project(pts):
        img, _ = L.pcd2range(pts, geom)
        return L.process_scan(img, geom)

    def build(n, seed0):
        imgs = np.zeros((n, h, w, 1), np.float32)
        msks = np.zeros((n, h, w, 1), np.float32)
        for i in range(n):
            im, mk = project(jnp.asarray(synthetic_scene(
                np.random.default_rng(seed0 + i), n_points)))
            imgs[i, ..., 0] = np.asarray(im)
            msks[i, ..., 0] = np.asarray(mk)
        return imgs, msks

    pool, pool_mask = build(args.pool, 0)
    held, held_mask = build(args.n_eval, 80_000)

    model = VQModelGaus(ae_cfg, n_embed=1024, embed_dim=8, use_mask=True)
    loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0, curve_length=1,
                            disc_start=max(args.steps // 2, 10),
                            disc_weight=0.3)
    geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
    disc = LiDARNLayerDiscriminator()
    tx_g, tx_d = make_ae_optimizers(2e-4, 2e-4)
    state = create_ae_state(model, disc, jax.random.key(0), (h, w, 1),
                            tx_g, tx_d, loss_cfg, geo)

    def batch_fn(rng, data):
        idx = jax.random.randint(rng, (args.batch,), 0, args.pool)
        return {"image": jnp.take(data["image"], idx, axis=0),
                "mask": jnp.take(data["mask"], idx, axis=0)}

    chunk = max(min(args.chunk, args.steps), 1)
    n_chunks = max(args.steps // chunk, 1)
    step = make_chunked_ae_train_step(model, disc, loss_cfg, geo, tx_g, tx_d,
                                      batch_fn, chunk, s2_render=True,
                                      s2_geom=geom)
    data = {"image": jnp.asarray(pool), "mask": jnp.asarray(pool_mask)}

    print(f"[gaus-ns] training {n_chunks * chunk} steps (s2 render loss "
          f"on)...", flush=True)
    t0 = time.perf_counter()
    first = last = None
    for c in range(n_chunks):
        state, logs = step(state, jax.random.key(c), data)
        if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
            cur = float(logs["s2_loss"])
            first = cur if first is None else first
            last = cur
            print(f"  step {(c + 1) * chunk}: s2={cur:.4f} "
                  f"nll={float(logs['nll_loss']):.4f} "
                  f"rec={float(logs['rec_loss']):.4f}", flush=True)
    train_secs = time.perf_counter() - t0

    # held-out: rendered-range L1 (the s2 quantity) + plain decode L1
    @jax.jit
    def eval_batch(params_g, x, m):
        dec, _, _, gaus = model.apply(params_g, x)
        rend = render_range_from_gaussians(dec[..., :1], gaus, geom)
        rend_model = depth_to_model(rend["rendered_range"], geom)[..., None]
        l1_rend = jnp.abs(rend_model - x)
        l1_dec = jnp.abs(dec[..., :1] - x)
        denom = jnp.maximum(m.sum(), 1.0)
        return (jnp.sum(l1_rend * m) / denom, jnp.sum(l1_dec * m) / denom)

    def scores(params_g):
        rends, decs = [], []
        eb = 4
        for i in range(0, args.n_eval, eb):
            r, d = eval_batch(params_g, jnp.asarray(held[i: i + eb]),
                              jnp.asarray(held_mask[i: i + eb] > 0))
            rends.append(float(r))
            decs.append(float(d))
        return float(np.mean(rends)), float(np.mean(decs))

    rend_tr, dec_tr = scores(state.params_g)
    rand = create_ae_state(model, disc, jax.random.key(123), (h, w, 1),
                           tx_g, tx_d, loss_cfg, geo)
    rend_rd, dec_rd = scores(rand.params_g)

    report = {
        "train": {"steps": n_chunks * chunk, "seconds": round(train_secs, 1),
                  "s2_first": round(first, 4), "s2_last": round(last, 4)},
        "eval": {"n_scenes": args.n_eval,
                 "rendered_l1_trained": round(rend_tr, 4),
                 "rendered_l1_random_weights": round(rend_rd, 4),
                 "decode_l1_trained": round(dec_tr, 4),
                 "decode_l1_random_weights": round(dec_rd, 4)},
        "trained_beats_random": bool(rend_tr < rend_rd and dec_tr < dec_rd),
        "geometry": [h, w],
        "hardware": str(jax.devices()[0].platform),
        "total_seconds": round(time.perf_counter() - t_start, 1),
        "description": (
            "VQModelGaus (VQ-GAN + per-pixel gaussian splat decoder) trained "
            "with the forward_s2 rendered-range loss on projected synthetic "
            "scenes; held-out masked L1 of the rasterized panorama and of "
            "the plain decode, trained vs random weights."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
