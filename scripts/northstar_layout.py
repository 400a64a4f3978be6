#!/usr/bin/env python
"""Layout north star: prove the scene-graph-conditioned box diffusion LEARNS.

Trains LayoutDiffusion (full layout_nusc.yaml size) on the structured
synthetic "traffic" distribution (`data/layout_synthetic.traffic_graph_batch`:
cars on two lanes, pedestrians on sidewalks, scene-graph triples encoding the
TRUE geometric relations), then scores held-out-graph samples on metrics a
random-weights model cannot fake:

  - relation satisfaction: fraction of graph triples (a FRONT_OF b,
    p LEFT_OF_EGO ego, ...) geometrically satisfied by the sampled boxes —
    directly measures graph conditioning; chance is ~0.5.
  - car-lane JSD: JSD between histograms of sampled vs held-out car
    y-positions (the data's is bimodal at ±2 m) and x-positions.
  - car size MAE vs the data's mean car size.

Writes NORTHSTAR_LAYOUT.json. Reference evidence story: sample_layout.py +
eval (SURVEY §4.5); relations follow nuscenes_layout_dataset.py triples.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def jsd_hist(a, b, bins, lo, hi):
    import numpy as np

    pa, _ = np.histogram(a, bins=bins, range=(lo, hi))
    pb, _ = np.histogram(b, bins=bins, range=(lo, hi))
    pa = pa / max(pa.sum(), 1)
    pb = pb / max(pb.sum(), 1)
    m = 0.5 * (pa + pb)

    def kl(p, q):
        mask = p > 0
        return float(np.sum(p[mask] * np.log2(p[mask] / q[mask])))

    return 0.5 * kl(pa, m) + 0.5 * kl(pb, m)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--pool", type=int, default=1024, help="train graph batches")
    p.add_argument("--n-scenes", type=int, default=8, help="scenes per batch")
    p.add_argument("--n-eval", type=int, default=64, help="held-out batches")
    p.add_argument("--sample-steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--manipulate", action="store_true",
                   help="with_changes supervision: the encoder graph omits "
                        "one node per scene, the model must synthesize it "
                        "from its relations; adds the added-node relation "
                        "satisfaction metric (the manipulation story)")
    p.add_argument("--out", default="NORTHSTAR_LAYOUT.json")
    p.add_argument("--workdir", default="./runs/northstar_layout")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="128-ch model, 256 timesteps (CPU-budget)")
    p.add_argument("--tiny", action="store_true", help="CI-sized smoke")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.data.layout_synthetic import (
        CAR, added_relation_satisfaction, denormalize_boxes7,
        relation_satisfaction, traffic_graph_batch)
    from lidar_layout_tpu.models.layout_diffusion import (
        LayoutDiffusion, LayoutDiffusionConfig)
    from lidar_layout_tpu.models.unet1d import UNet1DConfig
    from lidar_layout_tpu.train.diffusion_trainer import chunk_steps

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.perf_counter()

    if args.tiny:
        args.steps, args.chunk = min(args.steps, 40), min(args.chunk, 10)
        args.pool, args.n_eval = min(args.pool, 16), min(args.n_eval, 4)
        args.sample_steps = min(args.sample_steps, 10)
        unet_cfg = UNet1DConfig(model_channels=64, num_res_blocks=1,
                                num_preds=8)
        cfg = LayoutDiffusionConfig(timesteps=64)
    elif args.small:
        # CPU-budget model at full training scale (timesteps 256)
        unet_cfg = UNet1DConfig(model_channels=128, num_res_blocks=1,
                                num_preds=8)
        cfg = LayoutDiffusionConfig(timesteps=256)
    else:
        unet_cfg = UNet1DConfig(num_preds=8)  # layout_nusc.yaml size
        cfg = LayoutDiffusionConfig()

    model = LayoutDiffusion(cfg, unet_cfg, num_objs=8, num_preds=8,
                            use_clip=True)

    # ---- pool of pre-generated structured graph batches, device-resident ----
    print(f"[layout-ns] building {args.pool}-batch training pool...",
          flush=True)
    batches = [traffic_graph_batch(np.random.default_rng(i),
                                   n_scenes=args.n_scenes,
                                   with_changes=args.manipulate)
               for i in range(args.pool)]
    heldout = [traffic_graph_batch(np.random.default_rng(100_000 + i),
                                   n_scenes=args.n_scenes,
                                   with_changes=args.manipulate)
               for i in range(args.n_eval)]
    n_scenes_static = int(batches[0]["n_scenes"])

    pool = {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0] if k != "n_scenes"}

    def batch_fn(rng, data):
        i = jax.random.randint(rng, (), 0, args.pool)
        g = jax.tree.map(lambda a: a[i], data)
        return {**g, "n_scenes": n_scenes_static}

    # ------------------------------- training -----------------------------
    g0 = {**{k: jnp.asarray(v) for k, v in batches[0].items()
             if k != "n_scenes"}, "n_scenes": n_scenes_static}
    params = model.init(jax.random.key(0), g0)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    opt = tx.init(params)

    def raw_step(state, graph, rng):
        params, opt = state
        (loss, logs), grads = jax.value_and_grad(
            model.p_losses, has_aux=True)(params, rng, graph)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), logs

    chunk = max(min(args.chunk, args.steps), 1)
    n_chunks = max(args.steps // chunk, 1)
    step = chunk_steps(raw_step, batch_fn, chunk)

    print(f"[layout-ns] training {n_chunks * chunk} steps "
          f"({n_chunks} chunks x {chunk})...", flush=True)
    t0 = time.perf_counter()
    state = (params, opt)
    first_loss = last_loss = None
    for c in range(n_chunks):
        state, logs = step(state, jax.random.key(c), pool)
        if c % max(n_chunks // 20, 1) == 0 or c == n_chunks - 1:
            cur = float(logs["loss"])
            if first_loss is None:
                first_loss = cur
            last_loss = cur
            print(f"  step {(c + 1) * chunk}: loss={cur:.4f}", flush=True)
    trained_params = state[0]
    train_secs = time.perf_counter() - t0

    # ------------------------------- eval ---------------------------------
    print("[layout-ns] sampling held-out graphs...", flush=True)

    def jit_sampler():
        @jax.jit
        def sample(ps, key, graph_arrays):
            graph = {**graph_arrays, "n_scenes": n_scenes_static}
            x = model.ddim_sample(ps, key, graph, steps=args.sample_steps)
            return model.postprocess_boxes(x)
        return sample

    sample = jit_sampler()

    def draw(ps, seed):
        outs = []
        for i, g in enumerate(heldout):
            ga = {k: jnp.asarray(v) for k, v in g.items() if k != "n_scenes"}
            boxes = np.asarray(sample(ps, jax.random.key(seed + i), ga))
            outs.append(denormalize_boxes7(boxes))
        return outs

    t0 = time.perf_counter()
    trained_boxes = draw(trained_params, 5_000)
    gen_secs = time.perf_counter() - t0
    random_params = model.init(jax.random.key(99), g0)
    random_boxes = draw(random_params, 6_000)

    def score(box_list):
        rel = float(np.mean([relation_satisfaction(b, g)
                             for b, g in zip(box_list, heldout)]))
        car_xy, sizes = [], []
        for b, g in zip(box_list, heldout):
            sel = (g["dec_objs"] == CAR) & g["obj_mask"]
            car_xy.append(b[sel][:, 3:5])
            sizes.append(b[sel][:, :3])
        xy = np.concatenate(car_xy)
        return rel, xy, np.concatenate(sizes)

    data_boxes = [denormalize_boxes7(g["dec_boxes"]) for g in heldout]
    rel_data, xy_data, size_data = score(data_boxes)
    rel_tr, xy_tr, size_tr = score(trained_boxes)
    rel_rd, xy_rd, size_rd = score(random_boxes)

    added_rel = None
    if args.manipulate:
        def added_score(box_list):
            vals = [added_relation_satisfaction(b, g)
                    for b, g in zip(box_list, heldout)]
            return round(float(np.mean(vals)), 4)
        added_rel = {"data_ceiling": added_score(data_boxes),
                     "trained": added_score(trained_boxes),
                     "random_weights": added_score(random_boxes)}

    def lane_metrics(xy):
        return {"jsd_y": round(jsd_hist(xy[:, 1], xy_data[:, 1], 40, -10, 10), 4),
                "jsd_x": round(jsd_hist(xy[:, 0], xy_data[:, 0], 40, -35, 35), 4)}

    mean_size = size_data.mean(axis=0)
    report = {
        "train": {"steps": n_chunks * chunk, "seconds": round(train_secs, 1),
                  "loss_first": round(first_loss, 4),
                  "loss_last": round(last_loss, 4)},
        "eval": {
            "n_graphs": args.n_eval, "n_scenes": args.n_eval * n_scenes_static,
            "gen_seconds": round(gen_secs, 1),
            "relation_satisfaction": {
                "data_ceiling": round(rel_data, 4),
                "trained": round(rel_tr, 4), "random_weights": round(rel_rd, 4)},
            "car_lane": {"trained": lane_metrics(xy_tr),
                         "random_weights": lane_metrics(xy_rd)},
            "car_size_mae": {
                "trained": round(float(np.abs(size_tr - mean_size).mean()), 4),
                "random_weights": round(
                    float(np.abs(size_rd - mean_size).mean()), 4)},
            **({"added_node_relation_satisfaction": added_rel}
               if added_rel else {}),
        },
        "hardware": str(jax.devices()[0].platform),
        "total_seconds": round(time.perf_counter() - t_start, 1),
        "description": (
            "LayoutDiffusion (layout_nusc.yaml size) trained on a structured "
            "synthetic traffic distribution; held-out scene-graph samples "
            "scored on relation satisfaction (graph conditioning), car-lane "
            "position JSD, and car-size MAE vs a random-weights model."),
    }
    report["trained_beats_random"] = bool(
        rel_tr > rel_rd
        and report["eval"]["car_lane"]["trained"]["jsd_y"]
        < report["eval"]["car_lane"]["random_weights"]["jsd_y"])

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
