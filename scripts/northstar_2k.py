#!/usr/bin/env python
"""BASELINE.json north-star: 2,000 samples generated AND scored end-to-end.

The reference computes its published tables on 2,000 samples
(README.md:107-111); BASELINE.md's throughput note sets the TPU rebuild's
target as "2k unconditional 64-beam samples generated **and** FRID/FSVD-scored
end-to-end on a v5e-8 in under 10 minutes". This script runs that loop on the
hardware we have (one v5e chip): restore the trained north-star LiDM
(runs/northstar_r02b), draw 2,000 EMA samples (50-step DDIM + VQ decode +
reprojection, one compiled program per batch), and score JSD + MMD + FRID
against 2,000 held-out scenes. Metric featurization is FUSED into the
generation program (eval/device_metrics): the chip emits sufficient
statistics (histogram, occupancy bitmaps, feature rows), so the relay never
carries clouds. Compile time is reported separately from the steady-state
clock (the target describes a serving loop, not a cold start).

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
    p.add_argument("--workdir", default="./runs/northstar_r04")
    p.add_argument("--n-samples", type=int, default=2000)
    p.add_argument("--batch", type=int, default=125)
    p.add_argument("--sampler", default="dpm", choices=("dpm", "ddim"),
                   help="dpm = DPM-Solver++(2M), the serving default since "
                        "DPM_QUALITY showed 20-step quality parity with "
                        "ddim50 on the trained model")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="NORTHSTAR_2K.json")
    p.add_argument("--smoke", action="store_true",
                   help="CPU logic check: random weights, tiny counts")
    p.add_argument("--ae-ch", type=int, default=48,
                   help="stage-A base width — must match the restored "
                        "northstar_train run's --ae-ch")
    p.add_argument("--n-embed", type=int, default=8192,
                   help="VQ codebook size — must match the run's --n-embed")
    p.add_argument("--lidm-steps", type=int, default=24000,
                   help="the run's --lidm-steps (fixes the cosine-schedule "
                        "opt-state tree for orbax restore)")
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.n_samples, args.batch, args.steps = 4, 2, 2
    rb = min(25, args.n_samples)  # ref scoring batch
    assert args.n_samples % args.batch == 0 and args.n_samples % rb == 0, \
        "n-samples must divide by the gen batch and the ref batch"
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.eval.device_metrics import (
        bev_hist_accumulate, bev_occupancy_packed, jsd_from_hists,
        mmd_from_packed, rangenet_input_from_model_imgs)
    from lidar_layout_tpu.eval.metrics import frechet_distance
    from lidar_layout_tpu.eval.registry import build_range_feature_net
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion,
                                                   apply_scale_by_std)
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
                      out_ch=2, num_res_blocks=2)
    unet_cfg = UNetConfig(in_channels=8, model_channels=128, out_channels=8,
                          num_res_blocks=2, attention_resolutions=(4, 2, 1),
                          channel_mult=(1, 2, 4), num_head_channels=32)
    diff_cfg = DiffusionConfig(timesteps=1024, linear_start=0.0015,
                               linear_end=0.0195, latent_shape=(16, 128, 8),
                               scale_by_std=True)
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=args.n_embed, embed_dim=8, use_mask=True)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    # the optimizer must match the training run's TREE STRUCTURE for orbax to
    # restore: northstar_train --cosine wraps lr in a schedule, whose
    # scale_by_learning_rate state is ScaleByScheduleState, not EmptyState
    from lidar_layout_tpu.train.lr_schedule import lambda_warmup_cosine_optax
    lr = lambda_warmup_cosine_optax(base_lr=2e-4, warm_up_steps=1000,
                                    lr_min=0.1, lr_max=1.0, lr_start=0.01,
                                    max_decay_steps=args.lidm_steps)
    tx = make_optimizer(lr)
    dstate = create_train_state(model, params, tx)
    if not args.smoke:
        dstate = restore_checkpoint(os.path.join(args.workdir, "ckpt_lidm"),
                                    dstate)
    trained = ema_params(model, dstate)
    print(f"[2k] restored step {int(dstate.step)}", flush=True)
    n_pts = 8000 if args.smoke else 120000

    # scale_factor is config-side, not checkpointed: recalibrate exactly as
    # northstar_train did (same first pool scenes -> encode -> 1/std)
    @jax.jit
    def project(pts):
        img, _ = L.pcd2range(pts, geom)
        model_img, mask = L.process_scan(img, geom)
        return model_img, mask

    n_probe = 4 if args.smoke else 16
    probe = np.zeros((n_probe, h, w, 1), np.float32)
    for i in range(n_probe):
        img, _ = project(jnp.asarray(
            synthetic_scene(np.random.default_rng(i), n_pts)))
        probe[i, ..., 0] = np.asarray(img)
    s = apply_scale_by_std(model, trained, jnp.asarray(probe))
    print(f"[2k] scale_factor={float(s):.4f} (train log: 0.2302)", flush=True)

    lh, lw, lc = diff_cfg.latent_shape
    b = args.batch
    net, net_params = build_range_feature_net("64")

    def _rangenet_feats(pm, rin, chunk=25):
        """Bounded-activation DarkNet21 features inside one program: scan
        over fixed chunks (a 384-image batch once hit 21.8 GB activations)."""
        n = rin.shape[0]
        k = max(n // chunk, 1)
        body = lambda _, x: (0.0, net.apply(pm, x, return_final_logits=True,
                                            agg_type="depth"))
        _, out = jax.lax.scan(body, 0.0, rin.reshape(k, n // k, *rin.shape[1:]))
        return out.reshape(n, -1)

    def _solve(ps, key):
        if args.sampler == "dpm":
            return dpm_solver_sample(model, ps, key, (b, lh, lw, lc),
                                     steps=args.steps)
        return ddim_sample(model, ps, key, (b, lh, lw, lc), steps=args.steps)

    def _featurize(pm, imgs, hist):
        xyz, valid = jax.vmap(lambda im: L.range2pcd(im, geom))(imgs)
        hist = hist + bev_hist_accumulate(xyz, valid, "64", 0.05)
        # packed uint8 bitmaps: 8x smaller stage-out through the ~300 KB/s
        # relay — the bulk of r3's ~5.9 s/batch solver-independent cost
        bits = bev_occupancy_packed(xyz, valid, "64", 0.5)
        feats = _rangenet_feats(pm, rangenet_input_from_model_imgs(imgs, geom))
        return hist, bits, feats.astype(jnp.float16)

    @jax.jit
    def gen_batch(ps, pm, key, hist):
        """Sample + decode + ALL metric featurization on device. Readback is
        packed bitmaps (B, 5 KB) + f16 features (B, D) — not clouds."""
        z = _solve(ps, key)
        imgs = model.decode_first_stage(ps, z)[..., 0]
        return _featurize(pm, imgs, hist)

    @jax.jit
    def ref_batch(pm, pts, hist):
        # Reference side goes through the SAME range roundtrip as generated
        # samples: the reference evaluates against example['reproj'] — range-
        # projected + reprojected clouds (kitti.py:75-77, sample.py:298-300)
        # — never raw scans. Raw-vs-reproj is apples-to-oranges (~+0.13 JSD,
        # ~2x MMD on 32-scene probes: 82% of points are dropped by the
        # 64x1024 projection).
        imgs, _ = jax.vmap(lambda p: project(p))(pts)
        return _featurize(pm, imgs, hist)

    # ---- phase attribution (VERDICT r3 #3): where does a serving batch's
    # device time go? Each phase is its own compiled program; readback of one
    # scalar forces completion; stage-out is measured as the FULL gen_batch
    # minus its scalar-only twin.
    @jax.jit
    def ph_solver(ps, key):
        return jnp.sum(_solve(ps, key).astype(jnp.float32))

    @jax.jit
    def ph_solver_decode(ps, key):
        z = _solve(ps, key)
        return jnp.sum(model.decode_first_stage(ps, z).astype(jnp.float32))

    @jax.jit
    def ph_full_scalar(ps, pm, key, hist):
        hist, bits, feats = gen_batch.__wrapped__(ps, pm, key, hist)
        return (jnp.sum(hist) + jnp.sum(bits.astype(jnp.float32))
                + jnp.sum(feats.astype(jnp.float32)))

    # held-out references (the "dataset" side of the loop; built + scored
    # once, outside the serving clock, like the reference's cached val split)
    print(f"[2k] building + scoring {args.n_samples} held-out reference "
          f"scenes...", flush=True)
    t0 = time.perf_counter()
    hist_ref = jnp.zeros((2000, 2000), jnp.float32)
    ref_bits, ref_feats = [], []
    for i in range(0, args.n_samples, rb):
        pts = np.stack([synthetic_scene(np.random.default_rng(100_000 + j),
                                        n_pts) for j in range(i, i + rb)])
        hist_ref, bits, feats = ref_batch(net_params, jnp.asarray(pts),
                                          hist_ref)
        ref_bits.append(np.asarray(bits))
        ref_feats.append(np.asarray(feats))
        if (i + rb) % 500 == 0:
            print(f"  ref {i + rb}/{args.n_samples} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    ref_bits = np.concatenate(ref_bits)
    ref_feats = np.concatenate(ref_feats)
    hist_ref = np.asarray(hist_ref)
    ref_seconds = time.perf_counter() - t0

    # compile outside the timed region (steady-state serving clock)
    t0 = time.perf_counter()
    h0 = jnp.zeros((2000, 2000), jnp.float32)
    _ = jax.tree.map(np.asarray,
                     gen_batch(trained, net_params, jax.random.key(0), h0))
    compile_seconds = time.perf_counter() - t0

    # ---- the timed end-to-end loop: generate 2k + score ------------------
    t_gen0 = time.perf_counter()
    hist = jnp.zeros((2000, 2000), jnp.float32)
    smp_bits, smp_feats = [], []
    n_batches = (args.n_samples + b - 1) // b
    for i in range(n_batches):
        hist, bits, feats = gen_batch(trained, net_params,
                                      jax.random.key(40_000 + i), hist)
        smp_bits.append(np.asarray(bits))
        smp_feats.append(np.asarray(feats))
        if (i + 1) % 4 == 0:
            print(f"  gen {(i + 1) * b}/{args.n_samples} "
                  f"({time.perf_counter() - t_gen0:.0f}s)", flush=True)
    smp_bits = np.concatenate(smp_bits)[: args.n_samples]
    smp_feats = np.concatenate(smp_feats)[: args.n_samples]
    hist = np.asarray(hist)
    gen_seconds = time.perf_counter() - t_gen0

    t_eval0 = time.perf_counter()
    metrics = {"jsd": jsd_from_hists(hist_ref, hist),
               "mmd": mmd_from_packed(ref_bits, smp_bits),
               "frid": frechet_distance(ref_feats.astype(np.float64),
                                        smp_feats.astype(np.float64))}
    eval_seconds = time.perf_counter() - t_eval0
    total = gen_seconds + eval_seconds

    # ---- phase attribution on one steady-state batch ----------------------
    def _timed(fn, *a, reps=2):
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            _ = float(fn(*a))
            ts.append(time.perf_counter() - t)
        return min(ts)

    key_p = jax.random.key(77)
    h0p = jnp.zeros((2000, 2000), jnp.float32)
    _ = float(ph_solver(trained, key_p))            # compile
    _ = float(ph_solver_decode(trained, key_p))
    _ = float(ph_full_scalar(trained, net_params, key_p, h0p))
    t_solver = _timed(ph_solver, trained, key_p)
    t_sol_dec = _timed(ph_solver_decode, trained, key_p)
    t_full_dev = _timed(ph_full_scalar, trained, net_params, key_p, h0p)

    def _full_with_stageout():
        h2, bits2, feats2 = gen_batch(trained, net_params, key_p, h0p)
        np.asarray(bits2), np.asarray(feats2)
        return 0.0
    t_full_out = _timed(lambda: _full_with_stageout())

    phases = {
        "solver": round(t_solver, 3),
        "decode": round(t_sol_dec - t_solver, 3),
        "featurize": round(t_full_dev - t_sol_dec, 3),
        "stage_out": round(t_full_out - t_full_dev, 3),
        "total_per_batch": round(t_full_out, 3),
    }
    print(f"[2k] phase split (s/batch of {b}): {phases}", flush=True)

    report = {
        "n_samples": args.n_samples,
        "batch": b,
        "sampler": args.sampler,
        "phase_seconds_per_batch": phases,
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
            "per compiled batch, solver (DPM-Solver++(2M) default) + VQ "
            "decode + reprojection + ALL metric featurization on device "
            "(JSD count-histogram accumulation, MMD BEV occupancy bitmaps "
            "packed to uint8, DarkNet21 FRID features in f16) — readback is "
            "~0.8 MB/batch, not clouds. Host closes with distance transforms "
            "+ matmuls + Frechet. Steady-state clock; compile and "
            "reference-set scoring reported separately."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
