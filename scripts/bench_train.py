#!/usr/bin/env python
"""Training-step throughput + MFU for both flagship training stages.

The reference publishes no training throughput (BASELINE.md "Throughput");
this records ours as evidence: steps/s, samples/s and model-FLOP utilization
for (A) the VQ-GAN range AE (gen+disc step, 64x1024 scans) and (B) the latent
DDPM (256-ch U-Net over 16x128x8 latents) — the two stages of
`scripts/northstar_train.py` at production size.

Methodology per PERF.md pitfalls: scan-chunked steps (K per dispatch) with a
device-resident pool passed as a jit argument, one scalar readback to force
completion, FLOPs from lowering a SINGLE raw step (cost_analysis counts a
scan body once, so single-step flops x K / wall time is the honest rate).

One TPU job at a time (CLAUDE.md). Prints a JSON dict; PERF.md records it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_BF16 = 197e12  # v5e


def _flops_of(lowered) -> float:
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--pool", type=int, default=64)
    p.add_argument("--ae-batch", type=int, default=8)
    p.add_argument("--lidm-batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="f32", choices=("f32", "bf16"),
                   help="training compute dtype (params/norms stay f32 — the "
                        "models' mixed-precision policy). The r4 baseline "
                        "trained f32; bf16 is the VERDICT r4 task-4 lever")
    p.add_argument("--phases", action="store_true",
                   help="additionally time fwd-only and fwd+bwd programs per "
                        "stage (attribution of the optimizer/disc residue)")
    p.add_argument("--out", default="",
                   help="also write the JSON to this path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.synthetic import synthetic_scene
    from lidar_layout_tpu.losses.discriminator import LiDARNLayerDiscriminator
    from lidar_layout_tpu.losses.geometric import GeoConverter
    from lidar_layout_tpu.losses.vq_loss import VQLossConfig
    from lidar_layout_tpu.models.autoencoder import AEConfig, VQModel
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.unet import UNetConfig
    from lidar_layout_tpu.ops import lidar as L
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY
    from lidar_layout_tpu.train.ae_trainer import (
        _make_raw_ae_step, create_ae_state, make_ae_optimizers,
        make_chunked_ae_train_step)
    from lidar_layout_tpu.train.diffusion_trainer import (
        _make_raw_step, create_train_state, make_chunked_train_step,
        make_optimizer)

    geom = KITTI_GEOMETRY
    h, w = geom.size
    ae_cfg = AEConfig(ch=32, ch_mult=(1, 2, 2, 4),
                      strides=((1, 2), (2, 2), (2, 2)), z_channels=8,
                      out_ch=2, num_res_blocks=2)
    unet_cfg = UNetConfig(in_channels=8, model_channels=128, out_channels=8,
                          num_res_blocks=2, attention_resolutions=(4, 2, 1),
                          channel_mult=(1, 2, 4), num_head_channels=32)
    diff_cfg = DiffusionConfig(timesteps=1024, linear_start=0.0015,
                               linear_end=0.0195, latent_shape=(16, 128, 8))

    # ---- small device pool, uploaded once ----
    @jax.jit
    def project(pts):
        img, _ = L.pcd2range(pts, geom)
        model_img, mask = L.process_scan(img, geom)
        return model_img, mask

    pool = np.zeros((args.pool, h, w, 1), np.float32)
    pool_mask = np.zeros((args.pool, h, w, 1), np.float32)
    for i in range(args.pool):
        img, hit = project(jnp.asarray(
            synthetic_scene(np.random.default_rng(i), 120000)))
        pool[i, ..., 0] = np.asarray(img)
        pool_mask[i, ..., 0] = np.asarray(hit).astype(np.float32)
    data = {"image": jnp.asarray(pool), "mask": jnp.asarray(pool_mask)}

    def make_batch_fn(bs):
        def batch_fn(rng, d):
            idx = jax.random.randint(rng, (bs,), 0, args.pool)
            return {"image": jnp.take(d["image"], idx, axis=0),
                    "mask": jnp.take(d["mask"], idx, axis=0)}
        return batch_fn

    def timed(fn, state, data, reps):
        st, _ = fn(state, jax.random.key(0), data)
        _ = float(jnp.sum(st.step))  # readback: forces the warmup chunk
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            st, _ = fn(st, jax.random.key(i + 1), data)
            _ = float(jnp.sum(st.step))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    out = {"chunk": args.chunk, "dtype": args.dtype, "device":
           getattr(jax.devices()[0], "device_kind", "unknown")}
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    def timed_phase(body_fn, payload, reps):
        """Scan-chunked phase probe: body(carry, rng, payload) -> carry, K
        inner iterations per dispatch, scalar readback. The carry feeds each
        iteration so XLA cannot hoist the body (PERF.md pitfall 3)."""
        @jax.jit
        def run(carry, rng, pl):
            def body(c, i):
                return body_fn(c, jax.random.fold_in(rng, i), pl), 0.0
            c, _ = jax.lax.scan(body, carry, jnp.arange(args.chunk))
            return c

        c = float(run(jnp.zeros((), jnp.float32), jax.random.key(0), payload))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            _ = float(run(jnp.asarray(c), jax.random.key(i + 1), payload))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] / args.chunk

    # ------------------------- stage A: VQ-GAN AE -------------------------
    ae = VQModel(ae_cfg, n_embed=2048, embed_dim=8, use_mask=True, dtype=cdt)
    loss_cfg = VQLossConfig(mask_factor=1.0, geo_factor=1.0, curve_length=1,
                            disc_start=0, disc_weight=0.3)
    geo = GeoConverter(geom, curve_length=loss_cfg.curve_length)
    disc = LiDARNLayerDiscriminator()
    tx_g, tx_d = make_ae_optimizers(2e-4, 2e-4)
    ae_state = create_ae_state(ae, disc, jax.random.key(0), (h, w, 1),
                               tx_g, tx_d, loss_cfg, geo)

    raw_ae = _make_raw_ae_step(ae, disc, loss_cfg, geo, tx_g, tx_d)
    batch = make_batch_fn(args.ae_batch)(jax.random.key(9), data)
    ae_flops = _flops_of(jax.jit(raw_ae).lower(ae_state, batch,
                                               jax.random.key(0)))

    ae_chunked = make_chunked_ae_train_step(ae, disc, loss_cfg, geo, tx_g,
                                            tx_d, make_batch_fn(args.ae_batch),
                                            args.chunk)
    dt = timed(ae_chunked, ae_state, data, args.reps)
    out["ae"] = {
        "batch": args.ae_batch,
        "steps_per_sec": round(args.chunk / dt, 2),
        "samples_per_sec": round(args.chunk * args.ae_batch / dt, 1),
        "step_tflops": round(ae_flops / 1e12, 3),
        "mfu": round(ae_flops * args.chunk / dt / PEAK_BF16, 4),
    }
    if args.phases:
        import optax

        from lidar_layout_tpu.losses.vq_loss import reconstruction_nll
        bfn = make_batch_fn(args.ae_batch)

        def ae_gen_loss(pg, b):
            dec, qloss, _ = ae.apply(pg, b["image"])
            nll, _ = reconstruction_nll(loss_cfg, geo, b["image"], dec,
                                        b["mask"])
            return (nll + qloss).astype(jnp.float32)

        def ae_fwd(c, r, pl):
            st, d = pl
            return c + ae_gen_loss(st.params_g, bfn(r, d))

        def ae_fwdbwd(c, r, pl):
            st, d = pl
            g = jax.grad(ae_gen_loss)(st.params_g, bfn(r, d))
            return c + optax.global_norm(g).astype(jnp.float32)

        import optax
        t_fwd = timed_phase(ae_fwd, (ae_state, data), args.reps)
        t_fb = timed_phase(ae_fwdbwd, (ae_state, data), args.reps)
        out["ae"]["phase_ms_per_step"] = {
            "gen_fwd": round(t_fwd * 1e3, 2),
            "gen_fwd_bwd": round(t_fb * 1e3, 2),
            "full_step": round(dt / args.chunk * 1e3, 2),
            "residue_disc_opt_ema": round((dt / args.chunk - t_fb) * 1e3, 2),
            "note": ("gen_fwd/gen_fwd_bwd probe the generator's nll+quant "
                     "path only (no adaptive-weight disc term); full_step "
                     "is the production gen+disc+optimizers+EMA step"),
        }
    print(json.dumps(out["ae"]), flush=True)
    del ae_state, ae_chunked

    # ------------------------- stage B: latent DDPM -----------------------
    model = LatentDiffusion(diff_cfg, unet_cfg, first_stage_cfg=ae_cfg,
                            n_embed=2048, embed_dim=8, use_mask=True,
                            dtype=cdt)
    params = model.init(jax.random.key(1), image_shape=(h, w, 1))
    tx = make_optimizer(2e-4)
    dstate = create_train_state(model, params, tx)

    raw = _make_raw_step(model, tx, 0.9999, None)
    batch = make_batch_fn(args.lidm_batch)(jax.random.key(9), data)
    lidm_flops = _flops_of(jax.jit(raw).lower(dstate, batch,
                                              jax.random.key(0)))

    dchunked = make_chunked_train_step(model, tx,
                                       make_batch_fn(args.lidm_batch),
                                       args.chunk)
    dt = timed(dchunked, dstate, data, args.reps)
    out["lidm"] = {
        "batch": args.lidm_batch,
        "steps_per_sec": round(args.chunk / dt, 2),
        "samples_per_sec": round(args.chunk * args.lidm_batch / dt, 1),
        "step_tflops": round(lidm_flops / 1e12, 3),
        "mfu": round(lidm_flops * args.chunk / dt / PEAK_BF16, 4),
    }
    if args.phases:
        bfn_l = make_batch_fn(args.lidm_batch)

        def lidm_loss(unet_p, full_p, r, d):
            loss, _ = model.training_loss({**full_p, "unet": unet_p},
                                          jax.random.fold_in(r, 1),
                                          bfn_l(r, d))
            return loss.astype(jnp.float32)

        def l_fwd(c, r, pl):
            st, d = pl
            return c + lidm_loss(st.params["unet"], st.params, r, d)

        def l_fwdbwd(c, r, pl):
            import optax
            st, d = pl
            g = jax.grad(lidm_loss)(st.params["unet"], st.params, r, d)
            return c + optax.global_norm(g).astype(jnp.float32)

        t_fwd = timed_phase(l_fwd, (dstate, data), args.reps)
        t_fb = timed_phase(l_fwdbwd, (dstate, data), args.reps)
        out["lidm"]["phase_ms_per_step"] = {
            "fwd": round(t_fwd * 1e3, 2),
            "fwd_bwd": round(t_fb * 1e3, 2),
            "full_step": round(dt / args.chunk * 1e3, 2),
            "residue_opt_ema": round((dt / args.chunk - t_fb) * 1e3, 2),
        }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
