#!/usr/bin/env python
"""Train the scene-graph-conditioned box diffusion (LayoutDiffusion).

Config-driven parity with the reference ``scripts/train_layout.py``:
``-b config.yaml -t -d data_root``. The dataset's vocab is injected into the
model config like the reference (train_layout.py:600). Falls back to synthetic
padded scene graphs (explicitly logged) when the nuScenes infos pickle is
absent.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs",
                              "layout_diffusion", "nuscenes",
                              "layout_nusc.yaml")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", default=DEFAULT_CONFIG, help="YAML config")
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--workdir", default=None)
    p.add_argument("--batch-scenes", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast local smoke runs)")
    args, unknown = p.parse_known_args()
    bad = [u for u in unknown if "=" not in u]
    if bad:
        p.error(f"unrecognized arguments: {' '.join(bad)}")
    args.overrides = unknown

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.factory import build_batches
    from lidar_layout_tpu.train.build import _simple_state, _simple_update
    from lidar_layout_tpu.train.lr_schedule import scale_lr
    from lidar_layout_tpu.train.trainer import (CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer)

    cfg = load_yaml(args.base)
    if args.overrides:
        from lidar_layout_tpu.config import apply_dotlist
        apply_dotlist(cfg, args.overrides)
        print(f"dotlist overrides: {args.overrides}")
    model_cfg = cfg["model"]
    data_cfg = cfg.get("data", {}).get("params", {})
    train_blk = data_cfg.get("train", {"target": "nusc_layout_graph",
                                       "params": {}})
    batch_scenes = args.batch_scenes or data_cfg.get("batch_size", 8)
    name = os.path.splitext(os.path.basename(args.base))[0]
    workdir = args.workdir or f"./runs/{name}"

    # dataset first: its vocab sizes parameterize the scene-graph encoder
    batches = build_batches(train_blk.get("target", "nusc_layout_graph"),
                            train_blk.get("params", {}),
                            data_cfg.get("dataset", {}), args.data_root,
                            batch_scenes, seed=args.seed,
                            force_synthetic=args.synthetic)
    g0 = next(batches)
    num_objs = int(max(np.max(g0["enc_objs"]) + 1, 32))
    num_preds = int(max(np.max(g0["enc_triples"][:, 1]) + 1, 16))
    model_cfg.setdefault("params", {})["vocab"] = {
        "num_objs": num_objs, "num_preds": num_preds}

    # n_scenes parameterizes static shapes (per-scene t gather): keep it a
    # jit-time constant via closure, never a traced batch leaf
    n_scenes_static = int(g0.get("n_scenes", batch_scenes))

    def to_device(g):
        return {k: jnp.asarray(v) for k, v in g.items() if k != "n_scenes"}

    model = instantiate_from_config(model_cfg)
    g0 = {**to_device(g0), "n_scenes": n_scenes_static}
    params = model.init(jax.random.key(args.seed), g0)

    base_lr = model_cfg.get("base_learning_rate", 1e-6)
    lr = scale_lr(base_lr, batch_scenes, 1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    # EMA tracked like every other family (reference LayoutDiffusion is a
    # DDPM subclass with use_ema; LitEma warmup semantics in _simple_update)
    state0 = _simple_state(params, tx)

    @jax.jit
    def step_fn(state, batch, key):
        graph = {**batch, "n_scenes": n_scenes_static}
        (l, logs), grads = jax.value_and_grad(model.p_losses, has_aux=True)(
            state.params, key, graph)
        return _simple_update(state, grads, tx), logs

    def jbatches():
        for b in batches:
            yield to_device(b)

    trainer = Trainer(step_fn, state0, jbatches(), workdir=workdir,
                      max_steps=args.steps,
                      hooks=[IterationTimer(), InformationWriter(),
                             CheckpointSaver(max(args.steps // 5, 1))],
                      seed=args.seed)
    trainer.train()
    print(f"done -> {workdir}")


if __name__ == "__main__":
    main()
