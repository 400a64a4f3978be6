#!/usr/bin/env python
"""Sample object layouts from a scene graph (parity: scripts/sample_layout.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-n", "--n-scenes", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--outdir", default="./samples_layout")
    p.add_argument("-s", "--seed", type=int, default=42)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.data.layout_synthetic import synthetic_graph_batch
    from lidar_layout_tpu.models.layout_diffusion import (LayoutDiffusion,
                                                          LayoutDiffusionConfig)
    from lidar_layout_tpu.models.unet1d import UNet1DConfig

    model = LayoutDiffusion(
        LayoutDiffusionConfig(timesteps=1000),
        UNet1DConfig(model_channels=512, num_res_blocks=2,
                     channel_mult=(1, 1, 1, 1), attention_resolutions=(4, 2),
                     num_heads=8, concat_dim=1280, crossattn_dim=1280,
                     enable_t_emb=True),
        num_objs=32, num_preds=16, sg_embedding_dim=64)

    g = {k: jnp.asarray(v) for k, v in synthetic_graph_batch(
        np.random.default_rng(args.seed), n_scenes=args.n_scenes).items()}
    params = model.init(jax.random.key(0), g)
    if args.resume:
        from lidar_layout_tpu.train.build import _simple_state
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        import optax
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
        state = restore_checkpoint(os.path.join(args.resume, "ckpt"),
                                   _simple_state(params, tx))
        params = state.ema  # sample with EMA weights (reference ema_scope)
        print(f"loaded EMA weights from {args.resume}")
    else:
        print("WARNING: sampling from randomly initialized weights")

    boxes8 = model.ddim_sample(params, jax.random.key(args.seed), g,
                               steps=args.steps)
    boxes7 = np.asarray(model.postprocess_boxes(boxes8))
    os.makedirs(args.outdir, exist_ok=True)
    np.savez(os.path.join(args.outdir, "layouts.npz"),
             boxes=boxes7,
             scene_ids=np.asarray(g["dec_objs_to_scene"]),
             classes=np.asarray(g["dec_objs"]),
             obj_mask=np.asarray(g["obj_mask"]))
    print(f"wrote {boxes7.shape[0]} boxes over {args.n_scenes} scenes "
          f"-> {args.outdir}/layouts.npz")


if __name__ == "__main__":
    main()
