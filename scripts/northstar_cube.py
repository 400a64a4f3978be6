#!/usr/bin/env python
"""Cube-family north star: prove the sparse-voxel VAE + latent diffusion LEARN.

Stage A trains the XCube-style SparseVAE (reference
lidm/models/ae/autoencoder_cube.py:16 CubeAEModel over
lidm/modules/xcube/sunet.py:230 StructPredictionNet, here
models/sparse_vae.py over ops/voxel fixed-capacity grids) on a synthetic
distribution of bounded street scenes; evidence = held-out child-occupancy
structure prediction (BCE + F1) for trained vs random weights.

Stage B trains CubeDiffusion (reference lidm/models/diffusion/ddpm_cube.py:12
via models/cube_diffusion.py) on the trained VAE's coarse-grid latents;
evidence = Fréchet distance between held-out encoder latents and DDIM-sampled
latents, for the trained denoiser vs a random-weights denoiser vs raw N(0,1)
noise. Writes NORTHSTAR_CUBE.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cube_scene(rng, n_points: int, extent: float = 4.8):
    """Bounded street block: ground patch + boxes + poles, all inside
    [-extent, extent]^2 (so the finest 0.2 m grid fits a fixed capacity)."""
    import numpy as np

    n_ground = n_points // 2
    g = np.stack([rng.uniform(-extent, extent, n_ground),
                  rng.uniform(-extent, extent, n_ground),
                  rng.normal(0.05, 0.02, n_ground)], -1)

    parts = [g]
    n_box = int(rng.integers(3, 7))
    n_box_pts = int(n_points * 0.4)
    per = n_box_pts // n_box
    for _ in range(n_box):
        cx, cy = rng.uniform(-extent + 1.2, extent - 1.2, 2)
        l, w, h = rng.uniform(1.0, 2.4), rng.uniform(0.8, 1.6), \
            rng.uniform(0.8, 2.0)
        yaw = rng.uniform(0, np.pi)
        u = np.stack([rng.uniform(-l / 2, l / 2, per),
                      rng.uniform(-w / 2, w / 2, per),
                      rng.uniform(0.0, h, per)], -1)
        rot = np.asarray([[np.cos(yaw), -np.sin(yaw), 0],
                          [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        parts.append(u @ rot.T + [cx, cy, 0.0])

    n_pole = n_points - n_ground - per * n_box
    px, py = rng.uniform(-extent, extent, (2, max(n_pole, 1)))
    parts.append(np.stack([px, py,
                           rng.uniform(0.0, 3.0, max(n_pole, 1))], -1))
    pts = np.concatenate(parts).astype(np.float32)[:n_points]
    return pts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ae-steps", type=int, default=2000)
    p.add_argument("--diff-steps", type=int, default=3000)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--pool", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n-points", type=int, default=8192)
    p.add_argument("--n-eval", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", default="NORTHSTAR_CUBE.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.eval.metrics import frechet_distance
    from lidar_layout_tpu.models.cube_diffusion import (CubeDiffusion,
                                                        CubeDiffusionConfig,
                                                        SparseUNetConfig)
    from lidar_layout_tpu.models.sparse_vae import (SparseVAE, SparseVAEConfig,
                                                    struct_loss)
    from lidar_layout_tpu.train.diffusion_trainer import chunk_steps

    if args.tiny:
        args.ae_steps, args.diff_steps, args.chunk = 20, 20, 5
        args.pool, args.n_eval, args.n_points, args.batch = 16, 4, 512, 2
        cfg = SparseVAEConfig(base_capacity=512, channels=(16, 32, 64),
                              latent_dim=8, voxel_size=0.4)
        ucfg = SparseUNetConfig(in_channels=8, model_channels=32,
                                num_blocks=2, num_heads=2)
    else:
        cfg = SparseVAEConfig(base_capacity=4096, channels=(32, 64, 128),
                              latent_dim=8, voxel_size=0.2)
        ucfg = SparseUNetConfig(in_channels=8, model_channels=96,
                                num_blocks=4, num_heads=4)

    model = SparseVAE(cfg)
    t_start = time.perf_counter()

    pool = np.stack([cube_scene(np.random.default_rng(i), args.n_points)
                     for i in range(args.pool)])
    heldout = np.stack([
        cube_scene(np.random.default_rng(70_000 + i), args.n_points)
        for i in range(args.n_eval)])
    allmask = jnp.ones((args.n_points,), bool)

    def apply_scene(params, pts, rng):
        return model.apply(params, pts, pts, allmask, rng)

    params = model.init(jax.random.key(0), jnp.asarray(pool[0]),
                        jnp.asarray(pool[0]), allmask, jax.random.key(1))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))

    # ---------------- stage A: structure VAE ------------------------------
    def ae_step(state, batch, rng):
        params, opt = state

        def loss_fn(p):
            keys = jax.random.split(rng, batch.shape[0])
            outs = jax.vmap(lambda x, r: apply_scene(p, x, r))(batch, keys)
            losses = jax.vmap(lambda o: struct_loss(o, cfg.kl_weight))(outs)
            return losses[0].mean(), jax.tree.map(jnp.mean, losses[1])

        (l, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), logs

    def batch_fn(rng, data):
        idx = jax.random.randint(rng, (args.batch,), 0, args.pool)
        return jnp.take(data, idx, axis=0)

    chunk = max(min(args.chunk, args.ae_steps), 1)
    n_chunks = max(args.ae_steps // chunk, 1)
    step = chunk_steps(ae_step, batch_fn, chunk)

    print(f"[cube-ns] stage A: {n_chunks * chunk} VAE steps...", flush=True)
    t0 = time.perf_counter()
    state = (params, tx.init(params))
    pool_dev = jnp.asarray(pool)
    first = last = None
    for c in range(n_chunks):
        state, logs = step(state, jax.random.key(c), pool_dev)
        if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
            cur = float(logs["loss"])
            first = cur if first is None else first
            last = cur
            print(f"  step {(c + 1) * chunk}: loss={cur:.4f} "
                  f"kl={float(logs['kl']):.3f}", flush=True)
    ae_secs = time.perf_counter() - t0
    trained = state[0]

    # held-out structure prediction: per-level BCE + finest-level F1
    def structure_scores(p, scenes):
        @jax.jit
        def one(pts):
            out = apply_scene(p, pts, jax.random.key(7))
            bces, f1s = [], []
            L = cfg.num_levels
            for i, (lg, tg) in enumerate(zip(out["struct_logits"],
                                             out["struct_targets"])):
                pm = out["grids"][L - 1 - i].mask
                w = pm[:, None].astype(jnp.float32)
                bce = -(tg * jax.nn.log_sigmoid(lg)
                        + (1 - tg) * jax.nn.log_sigmoid(-lg))
                bces.append(jnp.sum(bce * w) / jnp.maximum(w.sum() * 8, 1.0))
                pred = (lg > 0) & pm[:, None]
                tp = jnp.sum(pred & (tg > 0.5))
                f1s.append(2 * tp / jnp.maximum(
                    jnp.sum(pred) + jnp.sum(tg > 0.5), 1.0))
            return jnp.stack(bces), jnp.stack(f1s)

        bb, ff = [], []
        for s in scenes:
            b, f = one(jnp.asarray(s))
            bb.append(np.asarray(b))
            ff.append(np.asarray(f))
        return np.mean(bb, 0), np.mean(ff, 0)

    bce_tr, f1_tr = structure_scores(trained, heldout)
    rand_params = model.init(jax.random.key(99), jnp.asarray(pool[0]),
                             jnp.asarray(pool[0]), allmask, jax.random.key(1))
    bce_rd, f1_rd = structure_scores(rand_params, heldout)
    print(f"[cube-ns] struct BCE trained={bce_tr.round(4).tolist()} "
          f"random={bce_rd.round(4).tolist()}", flush=True)

    # ---------------- stage B: latent diffusion ---------------------------
    diff = CubeDiffusion(CubeDiffusionConfig(latent_dim=cfg.latent_dim), ucfg)

    @jax.jit
    def encode(pts):
        out = apply_scene(trained, pts, jax.random.key(3))
        return out["latent_grid"], out["latent_mean"]

    def encode_all(scenes):
        grids, zs = [], []
        for s in scenes:
            g, z = encode(jnp.asarray(s))
            grids.append(jax.tree.map(np.asarray, g))
            zs.append(np.asarray(z))
        grid = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *grids)
        return grid, jnp.asarray(np.stack(zs))

    pool_grid, pool_z = encode_all(pool)
    held_grid, held_z = encode_all(heldout)
    zm = np.asarray(pool_grid.mask)
    scale = float(1.0 / (np.asarray(pool_z)[zm].std() + 1e-8))
    pool_z = pool_z * scale
    held_z = held_z * scale
    print(f"[cube-ns] latent scale={scale:.3f}", flush=True)

    dparams = diff.init(jax.random.key(5),
                        jax.tree.map(lambda x: x[0], pool_grid))
    dtx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))

    def diff_step(state, batch, rng):
        params, opt = state
        grid, z0 = batch

        def loss_fn(p):
            keys = jax.random.split(rng, z0.shape[0])
            losses = jax.vmap(
                lambda g, z, r: diff.p_losses(p, r, g, z)[0])(grid, z0, keys)
            return losses.mean()

        l, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = dtx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), {"loss": l}

    def diff_batch_fn(rng, data):
        grid, z0 = data
        idx = jax.random.randint(rng, (args.batch,), 0, args.pool)
        take = lambda x: jnp.take(x, idx, axis=0)
        return jax.tree.map(take, grid), take(z0)

    chunk_d = max(min(args.chunk, args.diff_steps), 1)
    n_chunks_d = max(args.diff_steps // chunk_d, 1)
    dstep = chunk_steps(diff_step, diff_batch_fn, chunk_d)

    print(f"[cube-ns] stage B: {n_chunks_d * chunk_d} diffusion steps...",
          flush=True)
    t0 = time.perf_counter()
    dstate = (dparams, dtx.init(dparams))
    dfirst = dlast = None
    for c in range(n_chunks_d):
        dstate, logs = dstep(dstate, jax.random.key(10_000 + c),
                             (pool_grid, pool_z))
        if c % max(n_chunks_d // 10, 1) == 0 or c == n_chunks_d - 1:
            cur = float(logs["loss"])
            dfirst = cur if dfirst is None else dfirst
            dlast = cur
            print(f"  step {(c + 1) * chunk_d}: eps-mse={cur:.4f}", flush=True)
    diff_secs = time.perf_counter() - t0

    # FD(held-out encoder latents, sampled latents) on held-out grids
    @jax.jit
    def sample_latents(p, grid, keys):
        return jax.vmap(lambda g, r: diff.ddim_sample(p, r, g, steps=50)
                        )(grid, keys)

    keys = jax.random.split(jax.random.key(77), args.n_eval)
    hm = np.asarray(held_grid.mask)
    real = np.asarray(held_z)[hm]

    def fd_of(params):
        z = np.asarray(sample_latents(params, held_grid, keys))
        return frechet_distance(real, z[hm])

    fd_trained = fd_of(dstate[0])
    rand_d = diff.init(jax.random.key(123),
                       jax.tree.map(lambda x: x[0], pool_grid))
    fd_random = fd_of(rand_d)
    noise = np.random.default_rng(3).standard_normal(real.shape
                                                     ).astype(np.float32)
    fd_noise = frechet_distance(real, noise)

    report = {
        "stage_a": {"steps": n_chunks * chunk, "seconds": round(ae_secs, 1),
                    "loss_first": round(first, 4), "loss_last": round(last, 4),
                    "heldout_struct_bce_trained":
                        [round(float(x), 4) for x in bce_tr],
                    "heldout_struct_bce_random":
                        [round(float(x), 4) for x in bce_rd],
                    "heldout_struct_f1_trained":
                        [round(float(x), 4) for x in f1_tr],
                    "heldout_struct_f1_random":
                        [round(float(x), 4) for x in f1_rd]},
        "stage_b": {"steps": n_chunks_d * chunk_d,
                    "seconds": round(diff_secs, 1),
                    "eps_mse_first": round(dfirst, 4),
                    "eps_mse_last": round(dlast, 4),
                    "latent_fd_trained": round(float(fd_trained), 4),
                    "latent_fd_random_weights": round(float(fd_random), 4),
                    "latent_fd_pure_noise": round(float(fd_noise), 4)},
        "trained_beats_random": bool(
            f1_tr[-1] > f1_rd[-1] and fd_trained < min(fd_random, fd_noise)),
        "n_eval": args.n_eval,
        "hardware": str(jax.devices()[0].platform),
        "total_seconds": round(time.perf_counter() - t_start, 1),
        "description": (
            "Sparse-voxel VAE trained on bounded synthetic street blocks "
            "(struct BCE/F1 per level, finest last) + latent diffusion over "
            "its coarse-grid latents (Fréchet distance of DDIM samples vs "
            "held-out encoder latents; random-weights and pure-noise "
            "baselines)."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
