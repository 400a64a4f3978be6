#!/usr/bin/env python
"""Stage-A (VQ-GAN AE) diagnostic harness for the north-star recon ceiling.

VERDICT r2 weak #1: the trained LiDM's JSD saturates the AE-reconstruction
ceiling (0.609 vs a 0.205 held-out floor), so all attainable quality is gated
by stage A. This script trains ONLY stage A on the north-star synthetic
distribution and reports a battery that pins the failure mode:

  * jsd / mmd of full recon (VQ path + predicted ray-drop) vs held-out scenes
  * jsd with the TRUE hit mask substituted      -> isolates mask-head error
  * jsd with quantization bypassed (continuous) -> isolates codebook error
  * model-space depth MAE on true-hit pixels    -> pure regression error
  * mask precision / recall / IoU
  * codebook perplexity + fraction of codes used

Baselines per CPU simulation (this round): JSD is saturated by tiny iid depth
noise (sigma 0.005 -> 0.41 at 64v64 where the seed floor is 0.43), while edge
blur across depth discontinuities pushes ABOVE the floor (0.49-0.52) and does
not average out with more clouds — the structural failure to hunt is flying
pixels, not iid blur.

Loss recipe parity: lidm/modules/losses/vqperceptual.py:87-151; the flagship
reference AE trains with disc_start=1 + the 'until' gate quirk, i.e. GAN
effectively OFF (configs/autoencoder/kitti/autoencoder_c2_p4.yaml:14).
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pool", type=int, default=512)
    p.add_argument("--n-eval", type=int, default=64)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--ch", type=int, default=32)
    p.add_argument("--n-embed", type=int, default=2048)
    p.add_argument("--embed-dim", type=int, default=8)
    p.add_argument("--disc-start", type=int, default=2000)
    p.add_argument("--disc-weight", type=float, default=0.3)
    p.add_argument("--geo-factor", type=float, default=1.0)
    p.add_argument("--mask-factor", type=float, default=1.0)
    p.add_argument("--curve-length", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--no-mask", action="store_true",
                   help="reference flagship recipe: no ray-drop head, pure "
                        "pixel L1 (+smooth/normal), mask_factor=0 "
                        "(autoencoder_c2_p4.yaml use_mask: False)")
    p.add_argument("--vq-init", default="taming",
                   help="taming | normal (see nn/quantize.py)")
    p.add_argument("--perceptual-factor", type=float, default=0.0,
                   help="rangenet_dec perceptual loss weight (the northstar "
                        "r4 recipe uses 1.0; vqperceptual.py:109-114)")
    p.add_argument("--perceptual-stages", default="",
                   help="comma list of rangenet stages for the perceptual "
                        "loss (default: all of dec_0..dec_4); e.g. "
                        "'dec_3,dec_4' weights the deep stages the FRID "
                        "probe blames")
    p.add_argument("--descriptor-factor", type=float, default=0.0,
                   help="weight of an L2 match on the FRID descriptor "
                        "itself (deepest perceptual layer: final logits, "
                        "depth-aggregated)")
    p.add_argument("--workdir", default="./runs/ae_diag")
    p.add_argument("--out", default="AE_DIAG.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.eval.metrics import compute_jsd, compute_mmd
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.losses.vq_loss import VQLossConfig
    from lidar_layout_tpu.models.autoencoder import AEConfig, VQModel
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, LidarGeometry
    from lidar_layout_tpu.train.ae_trainer import (create_ae_state,
                                                   make_ae_optimizers,
                                                   make_chunked_ae_train_step)
    from lidar_layout_tpu.train.checkpoint import (latest_step,
                                                   restore_checkpoint,
                                                   save_checkpoint)

    os.makedirs(args.workdir, exist_ok=True)
    report = {"config": {k: getattr(args, k.replace("-", "_"))
                         for k in ("steps", "batch", "pool", "ch", "n_embed",
                                   "embed_dim", "disc_start", "geo_factor",
                                   "mask_factor", "curve_length", "no_mask",
                                   "vq_init", "perceptual_factor",
                                   "perceptual_stages", "descriptor_factor",
                                   "n_eval")}}

    if args.tiny:
        geom = LidarGeometry(size=(16, 128))
        n_points = 16384
        ae_cfg = AEConfig(ch=16, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=1 if args.no_mask else 2, num_res_blocks=1)
    else:
        geom = KITTI_GEOMETRY
        n_points = 120000
        ae_cfg = AEConfig(ch=args.ch, ch_mult=(1, 2, 2, 4),
                          strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                          out_ch=1 if args.no_mask else 2, num_res_blocks=2)
    h, w = geom.size

    from lidar_layout_tpu.data.device_synthetic import (host_range2pcd,
                                                        scene_image_batch)

    # scenes are generated AND projected on device: the raw 1.4 MB clouds of
    # the numpy generator never cross the ~300 KB/s relay (a 512-scene pool
    # upload alone was ~40 min the old way)
    print(f"[ae_diag] building {args.pool}-scene pool on device...",
          flush=True)
    gen_b = 64
    t0 = time.perf_counter()
    chunks = []
    for i in range(0, args.pool, gen_b):
        im, mk = scene_image_batch(jax.random.key(1_000_000 + i), gen_b,
                                   n_points, geom)
        chunks.append((im[..., None], mk[..., None]))
    pool_data = {"image": jnp.concatenate([c[0] for c in chunks])[:args.pool],
                 "mask": jnp.concatenate([c[1] for c in chunks])[:args.pool]}
    jax.block_until_ready(pool_data)
    print(f"  pool built in {time.perf_counter() - t0:.1f}s", flush=True)

    # held-out eval scenes: download compact f16 images once, reproject on host
    ev = []
    for i in range(0, args.n_eval, gen_b):
        im, mk = scene_image_batch(jax.random.key(9_000_000 + i), gen_b,
                                   n_points, geom)
        ev.append((np.asarray(im.astype(jnp.float16)),
                   np.asarray(mk, np.int8)))
    eval_imgs = np.concatenate([e[0] for e in ev]).astype(np.float32)[
        :args.n_eval][..., None]
    eval_hits = np.concatenate([e[1] for e in ev]).astype(np.float32)[
        :args.n_eval]
    ref_clouds = [host_range2pcd(eval_imgs[i, ..., 0], geom)
                  for i in range(args.n_eval)]

    # ------------------------------- train ------------------------------
    ae = VQModel(ae_cfg, n_embed=args.n_embed, embed_dim=args.embed_dim,
                 use_mask=not args.no_mask, vq_init=args.vq_init)
    loss_cfg = VQLossConfig(mask_factor=0.0 if args.no_mask
                            else args.mask_factor,
                            geo_factor=args.geo_factor,
                            curve_length=args.curve_length,
                            disc_start=args.disc_start,
                            disc_weight=args.disc_weight)
    perceptual_fn = None
    if args.perceptual_factor > 0 or args.descriptor_factor > 0:
        import dataclasses as _dc
        loss_cfg = _dc.replace(loss_cfg,
                               perceptual_factor=max(args.perceptual_factor,
                                                     1e-9))
        from lidar_layout_tpu.losses.perceptual import (DEFAULT_STAGES,
                                                        make_perceptual_fn)
        stages = (tuple(args.perceptual_stages.split(","))
                  if args.perceptual_stages else DEFAULT_STAGES)
        # descriptor term rides inside perceptual_fn, scaled so that
        # perceptual_factor * (stage terms + desc/pf) = stages + descriptor
        pf = max(args.perceptual_factor, 1e-9)
        perceptual_fn = make_perceptual_fn(
            geom, stages=stages,
            descriptor_weight=args.descriptor_factor / pf)
    geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
    disc = LiDARNLayerDiscriminator()
    tx_g, tx_d = make_ae_optimizers(args.lr, args.lr)
    state = create_ae_state(ae, disc, jax.random.key(0), (h, w, 1),
                            tx_g, tx_d, loss_cfg, geo)

    ckpt_dir = os.path.join(args.workdir, "ckpt_ae")
    chunk = max(min(args.chunk, args.steps), 1)
    n_chunks = max(args.steps // chunk, 1)

    def batch_fn(rng, data):
        idx = jax.random.randint(rng, (args.batch,), 0, args.pool)
        return {"image": jnp.take(data["image"], idx, axis=0),
                "mask": jnp.take(data["mask"], idx, axis=0)}

    step_fn = make_chunked_ae_train_step(ae, disc, loss_cfg, geo, tx_g, tx_d,
                                         batch_fn, chunk,
                                         perceptual_fn=perceptual_fn)
    start_c = 0
    saved = latest_step(ckpt_dir)
    if saved is not None:
        state = restore_checkpoint(ckpt_dir, state)
        start_c = saved // chunk
        print(f"[ae_diag] resumed at step {saved}", flush=True)
    t0 = time.perf_counter()
    nll_last = None
    for c in range(start_c, n_chunks):
        state, logs = step_fn(state, jax.random.key(c), pool_data)
        if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
            nll_last = float(logs["nll_loss"])
            print(f"  step {(c + 1) * chunk}: nll={nll_last:.4f}"
                  f" q={float(logs['quant_loss']):.4f}", flush=True)
        if (c + 1) % max(n_chunks // 4, 1) == 0 and c != n_chunks - 1:
            save_checkpoint(ckpt_dir, (c + 1) * chunk, state)
    trained_this_run = start_c < n_chunks
    if trained_this_run:
        save_checkpoint(ckpt_dir, n_chunks * chunk, state)
    train_secs = time.perf_counter() - t0
    # provenance (VERDICT r4 task 8): a restored-complete stage must not
    # masquerade as a training run
    report["train"] = {"steps": n_chunks * chunk,
                       "seconds": round(train_secs, 1),
                       "trained_this_run": trained_this_run,
                       "restored_from": ckpt_dir if saved is not None
                       else None,
                       "nll_last": None if nll_last is None
                       else round(nll_last, 4)}

    # ---------------------------- diagnostics ---------------------------
    params = state.params_g

    @jax.jit
    def recon_batch(x):
        dec, _, ind = ae.apply(params, x)
        return dec.astype(jnp.float16), ind

    @jax.jit
    def recon_noquant(x):
        h_pre = ae.apply(params, x, method=lambda m, xx: m.encode_to_prequant(xx))
        dec = ae.apply(params, h_pre, method=lambda m, hh: m.decode(hh))
        return dec.astype(jnp.float16)

    B = 16
    full_clouds, truemask_clouds, noq_clouds = [], [], []
    variants = []  # cached (im_full, im_tm, im_nq) per batch for the probes
    mae_n = mae_d = 0.0
    tp = fp = fn = 0.0
    code_hist = np.zeros(args.n_embed, np.int64)
    for i in range(0, args.n_eval, B):
        x = jnp.asarray(eval_imgs[i:i + B])
        # process_scan's mask is the +1/-1 model-space convention; diagnostics
        # need {0,1}
        hit = (eval_hits[i:i + B] > 0).astype(np.float32)
        dec, ind = jax.tree.map(np.asarray, recon_batch(x))
        dec = dec.astype(np.float32)
        noq = np.asarray(recon_noquant(x)).astype(np.float32)
        code_hist += np.bincount(ind.reshape(-1), minlength=args.n_embed)
        pred_depth = dec[..., 0]
        if args.no_mask:
            # implicit ray-drop: depth below the in-range threshold
            pred_hit = (pred_depth >= geom.depth_thresh).astype(np.float32)
        else:
            pred_hit = (dec[..., 1] >= 0.0).astype(np.float32)
        # depth error on true hits, model space
        mae_n += float((np.abs(pred_depth - x[..., 0]) * hit).sum())
        mae_d += float(hit.sum())
        tp += float((pred_hit * hit).sum())
        fp += float((pred_hit * (1 - hit)).sum())
        fn += float(((1 - pred_hit) * hit).sum())
        im_full_b = np.where(pred_hit > 0, pred_depth, -1.0)
        im_tm_b = np.where(hit > 0, pred_depth, -1.0)
        if args.no_mask:
            im_nq_b = noq[..., 0]
        else:
            im_nq_b = np.where(noq[..., 1] >= 0, noq[..., 0], -1.0)
        variants.append((im_full_b, im_tm_b, im_nq_b))
        for k in range(dec.shape[0]):
            for im, dst in ((im_full_b[k], full_clouds),
                            (im_tm_b[k], truemask_clouds),
                            (im_nq_b[k], noq_clouds)):
                dst.append(host_range2pcd(im, geom))

    probs = code_hist / max(code_hist.sum(), 1)
    nz = probs[probs > 0]
    report["diag"] = {
        "jsd_recon": round(compute_jsd(ref_clouds, full_clouds), 4),
        "jsd_recon_truemask": round(compute_jsd(ref_clouds, truemask_clouds), 4),
        "jsd_recon_noquant": round(compute_jsd(ref_clouds, noq_clouds), 4),
        "mmd_recon": float(compute_mmd(ref_clouds, full_clouds)),
        "depth_mae_hits": round(mae_n / max(mae_d, 1.0), 5),
        "mask_precision": round(tp / max(tp + fp, 1.0), 4),
        "mask_recall": round(tp / max(tp + fn, 1.0), 4),
        "mask_iou": round(tp / max(tp + fp + fn, 1.0), 4),
        "codebook_perplexity": round(float(np.exp(-(nz * np.log(nz)).sum())), 1),
        "codebook_used_frac": round(float((code_hist > 0).mean()), 4),
    }
    # context rows: the floor for this n_eval (disjoint seeds)
    floor_clouds = []
    for i in range(0, args.n_eval, gen_b):
        im, _ = scene_image_batch(jax.random.key(5_000_000 + i), gen_b,
                                  n_points, geom)
        im = np.asarray(im.astype(jnp.float16)).astype(np.float32)
        floor_clouds += [host_range2pcd(im[k], geom) for k in range(gen_b)]
    report["diag"]["jsd_floor_disjoint"] = round(
        compute_jsd(ref_clouds, floor_clouds[:args.n_eval]), 4)

    # ------------------ feature-space probes (VERDICT r3 #4) ------------------
    # FRID lives in DarkNet21 feature space while the battery above is BEV/
    # range space — r3's recon ceiling (FRID 198 vs floor 2.5) was invisible
    # to it. Probe WHERE the AE loses feature mass:
    #   * FRID of recon/true-mask/no-quant variants vs GT on this eval set
    #   * per-stage channel-normalized feature L1 (which DarkNet stages diverge)
    #   * edge vs interior split of the full-res stage (flying-pixel locality)
    from lidar_layout_tpu.eval.device_metrics import \
        rangenet_input_from_model_imgs
    from lidar_layout_tpu.eval.metrics import frechet_distance
    from lidar_layout_tpu.eval.registry import build_range_feature_net
    from lidar_layout_tpu.losses.perceptual import normalize_channels

    net, net_params = build_range_feature_net("64")

    # All feature comparisons REDUCE ON DEVICE (r5): full-res DarkNet stage
    # maps are ~8 MB/image — staging them out through the ~300 KB/s relay
    # (the r4 version's layout) costs minutes per batch; the probes only
    # need per-stage scalar sums + (B, D) descriptor rows.
    @jax.jit
    def probe_batch(x, im_full, im_tm, im_nq):
        rin = lambda im: rangenet_input_from_model_imgs(im[..., 0], geom)
        f_gt = net.apply(net_params, rin(x), return_features=True)
        f_rc = net.apply(net_params, rin(im_full), return_features=True)
        desc = {k: net.apply(net_params, rin(v), return_final_logits=True,
                             agg_type="depth")
                for k, v in (("gt", x), ("recon", im_full),
                             ("truemask", im_tm), ("noquant", im_nq))}
        # edge mask from GT: horizontal depth discontinuity (model space),
        # dilated 1 px each side — the flying-pixel locus
        d0 = x[..., 0]
        dx = jnp.abs(jnp.diff(d0, axis=-1, append=d0[..., -1:]))
        edge = (dx > 0.05).astype(jnp.float32)
        edge = jnp.maximum(edge, jnp.roll(edge, 1, -1))
        edge = jnp.maximum(edge, jnp.roll(edge, -1, -1))
        stats = {}
        ei = jnp.zeros((4,))  # edge_sum, edge_px, int_sum, int_px
        for s in sorted(f_gt.keys()):
            a = normalize_channels(f_gt[s])
            bfeat = normalize_channels(f_rc[s])
            diff = jnp.abs(a - bfeat).mean(-1)         # (B, H, W')
            stats[s] = jnp.asarray([diff.sum(), float(diff.size)])
            if diff.shape[1:] == edge.shape[1:]:       # full-res stage only
                ei = ei + jnp.asarray([(diff * edge).sum(), edge.sum(),
                                       (diff * (1 - edge)).sum(),
                                       (1 - edge).sum()])
        return desc, stats, ei

    stage_l1 = None
    ei_tot = np.zeros(4)
    descs = {"gt": [], "recon": [], "truemask": [], "noquant": []}
    for bi, i in enumerate(range(0, args.n_eval, B)):
        x = jnp.asarray(eval_imgs[i:i + B])
        im_full_b, im_tm_b, im_nq_b = variants[bi]  # cached from the diag loop
        desc, stats, ei = jax.tree.map(np.asarray, probe_batch(
            x, jnp.asarray(im_full_b[..., None]),
            jnp.asarray(im_tm_b[..., None]),
            jnp.asarray(im_nq_b[..., None])))
        for k in descs:
            descs[k].append(desc[k])
        if stage_l1 is None:
            stage_l1 = {s: [0.0, 0.0] for s in stats}
        for s, v in stats.items():
            stage_l1[s][0] += float(v[0])
            stage_l1[s][1] += float(v[1])
        ei_tot += ei
    stage_l1_edge, edge_px, stage_l1_int, int_px = ei_tot

    descs = {k: np.concatenate(v).astype(np.float64) for k, v in descs.items()}
    half = args.n_eval // 2
    # Frechet = ||mu1-mu2||^2 + Tr(C1+C2-2(C1 C2)^0.5): the mean term is a
    # per-sample-matchable offset (a descriptor/perceptual loss can drive it
    # down); the covariance term is a diversity/structure mismatch
    mean_term = float(((descs["gt"].mean(0) - descs["recon"].mean(0))**2).sum())
    report["feature_probes"] = {
        "frid_recon": round(frechet_distance(descs["gt"], descs["recon"]), 2),
        "frid_recon_mean_term": round(mean_term, 2),
        "frid_recon_truemask": round(
            frechet_distance(descs["gt"], descs["truemask"]), 2),
        "frid_recon_noquant": round(
            frechet_distance(descs["gt"], descs["noquant"]), 2),
        "frid_self_floor": round(
            frechet_distance(descs["gt"][:half], descs["gt"][half:]), 2),
        "stage_l1": {s: round(v[0] / max(v[1], 1.0), 5)
                     for s, v in stage_l1.items()},
        "edge_vs_interior_l1": {
            "edge": round(stage_l1_edge / max(edge_px, 1.0), 5),
            "interior": round(stage_l1_int / max(int_px, 1.0), 5),
            "note": "full-res DarkNet stages; edge = |dW depth|>0.05 dilated 1px",
        },
    }
    print(json.dumps(report["feature_probes"], indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
