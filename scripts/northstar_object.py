#!/usr/bin/env python
"""Object-AE north star: prove the G2SD folding autoencoder LEARNS.

Trains VQModelObject (CdwExtractor -> [VQ] -> two-stage FoldingDecoder,
reference lidm/modules/encoders/object_encoder.py:199-248 via
models/object_ae.py) on a synthetic distribution of box-surface "car" crops
(unit-normalized like the reference's per-object crops,
nuscenes_object_detaset.py:41-148), then reports held-out chamfer distance
for trained vs random weights. Writes NORTHSTAR_OBJECT.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sample_box_surface(rng, n, size):
    """Points on the surface of an axis-aligned box (a crude car crop)."""
    import numpy as np

    l, w, h = size
    faces = rng.integers(0, 6, n)
    u = rng.uniform(-0.5, 0.5, n)
    v = rng.uniform(-0.5, 0.5, n)
    pts = np.zeros((n, 3), np.float32)
    for f in range(6):
        m = faces == f
        axis, sign = divmod(f, 2)
        fixed = (0.5 if sign else -0.5)
        dims = [d for d in range(3) if d != axis]
        pts[m, axis] = fixed
        pts[m, dims[0]] = u[m]
        pts[m, dims[1]] = v[m]
    pts *= np.asarray([l, w, h], np.float32)
    pts += rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    # unit-normalize (reference crop normalization: center + max-extent scale)
    pts -= pts.mean(0)
    pts /= max(np.abs(pts).max(), 1e-6)
    return pts.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--pool", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-points", type=int, default=256)
    p.add_argument("--n-eval", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4,
                   help="1e-3 collapses the folding decoder (dead "
                        "ReLU/LayerNorm constant-output plateau)")
    p.add_argument("--vq", action="store_true",
                   help="quantize the codeword (VQ1D path)")
    p.add_argument("--out", default="NORTHSTAR_OBJECT.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.models.object_ae import (ObjectAEConfig,
                                                   VQModelObject,
                                                   object_ae_loss)
    from lidar_layout_tpu.ops.chamfer import chamfer_loss
    from lidar_layout_tpu.train.diffusion_trainer import chunk_steps

    if args.tiny:
        args.steps, args.chunk = min(args.steps, 20), min(args.chunk, 5)
        args.pool, args.n_eval = 32, 8
        cfg = ObjectAEConfig(num_points=64, num_grids=64, num_neighbors=8,
                             cdw_dim=128, quantize_latent=args.vq)
        args.n_points = 64
    else:
        cfg = ObjectAEConfig(num_points=args.n_points, num_grids=256,
                             cdw_dim=512, quantize_latent=args.vq)
    model = VQModelObject(cfg)

    t_start = time.perf_counter()
    rng_np = np.random.default_rng(0)

    def draw_size(r):
        return np.asarray([4.5, 1.9, 1.7]) * (1 + r.normal(0, 0.15, 3))

    pool = np.stack([
        sample_box_surface(np.random.default_rng(i), args.n_points,
                           draw_size(np.random.default_rng(i)))
        for i in range(args.pool)])
    heldout = np.stack([
        sample_box_surface(np.random.default_rng(50_000 + i), args.n_points,
                           draw_size(np.random.default_rng(50_000 + i)))
        for i in range(args.n_eval)])

    params = model.init(jax.random.key(0), jnp.asarray(pool[0]))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    opt = tx.init(params)

    def batch_fn(rng, data):
        idx = jax.random.randint(rng, (args.batch,), 0, args.pool)
        return jnp.take(data, idx, axis=0)

    def raw_step(state, batch, rng):
        params, opt = state

        def loss_fn(p):
            rec, qloss, _ = jax.vmap(
                lambda x: model.apply(p, x))(batch)
            losses = jax.vmap(object_ae_loss)(
                rec, batch, jnp.broadcast_to(qloss, (batch.shape[0],)))
            return losses[0].mean(), jax.tree.map(jnp.mean, losses[1])

        (l, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), logs

    chunk = max(min(args.chunk, args.steps), 1)
    n_chunks = max(args.steps // chunk, 1)
    step = chunk_steps(raw_step, batch_fn, chunk)

    print(f"[object-ns] training {n_chunks * chunk} steps...", flush=True)
    t0 = time.perf_counter()
    state = (params, opt)
    first_loss = last_loss = None
    pool_dev = jnp.asarray(pool)
    for c in range(n_chunks):
        state, logs = step(state, jax.random.key(c), pool_dev)
        if c % max(n_chunks // 10, 1) == 0 or c == n_chunks - 1:
            cur = float(logs["rec_loss"])
            if first_loss is None:
                first_loss = cur
            last_loss = cur
            print(f"  step {(c + 1) * chunk}: chamfer={cur:.5f}", flush=True)
    train_secs = time.perf_counter() - t0

    @jax.jit
    def recon_cd(p, clouds):
        rec, _, _ = jax.vmap(lambda x: model.apply(p, x))(clouds)
        return jax.vmap(chamfer_loss)(rec, clouds)

    held_dev = jnp.asarray(heldout)
    cd_trained = float(jnp.mean(recon_cd(state[0], held_dev)))
    random_params = model.init(jax.random.key(99), jnp.asarray(pool[0]))
    cd_random = float(jnp.mean(recon_cd(random_params, held_dev)))

    report = {
        "train": {"steps": n_chunks * chunk, "seconds": round(train_secs, 1),
                  "chamfer_first": round(first_loss, 5),
                  "chamfer_last": round(last_loss, 5)},
        "eval": {"n_objects": args.n_eval,
                 "chamfer_trained": round(cd_trained, 5),
                 "chamfer_random_weights": round(cd_random, 5)},
        "trained_beats_random": bool(cd_trained < cd_random),
        "quantized": bool(args.vq),
        "hardware": str(jax.devices()[0].platform),
        "total_seconds": round(time.perf_counter() - t_start, 1),
        "description": (
            "G2SD folding object autoencoder trained on synthetic "
            "unit-normalized box-surface crops; held-out chamfer distance "
            "vs a random-weights model."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
