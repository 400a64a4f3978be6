#!/usr/bin/env python
"""Zero-shot text -> LiDAR via CLIP text conditioning.

Parity: ``scripts/text2lidar.py`` — reuses a camera-conditioned checkpoint and
swaps in the multi-view text embedder (FrozenClipMultiTextEmbedder), since CLIP
aligns the text and image spaces.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", default="a busy intersection with cars")
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-n", "--n-samples", type=int, default=2)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg-scale", type=float, default=1.0)
    p.add_argument("--outdir", default="./samples_text")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.encoders.modules import (FrozenClipMultiTextEmbedder,
                                                   simple_tokenize)
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.models.unet import UNetConfig

    latent = (4, 16, 8) if args.tiny else (16, 128, 8)
    image_shape = (16, 128, 1) if args.tiny else (64, 1024, 1)
    mc, mult, nrb = (32, (1, 2), 1) if args.tiny else (256, (1, 2, 4), 2)

    cond_stage = FrozenClipMultiTextEmbedder(n_views=2)
    unet_cfg = UNetConfig(in_channels=latent[2], model_channels=mc,
                          out_channels=latent[2], num_res_blocks=nrb,
                          attention_resolutions=(4, 2, 1), channel_mult=mult,
                          num_head_channels=32, use_spatial_transformer=True,
                          context_dim=768)
    model = LatentDiffusion(
        DiffusionConfig(timesteps=1024, linear_start=0.0015, linear_end=0.0195,
                        conditioning_key="crossattn", latent_shape=latent),
        unet_cfg,
        first_stage_cfg=AEConfig(ch=16 if args.tiny else 64,
                                 ch_mult=(1, 2, 2, 4),
                                 strides=((1, 2), (2, 2), (2, 2)),
                                 z_channels=8, out_ch=2, num_res_blocks=nrb),
        use_mask=True, cond_stage=cond_stage)

    tokens = jnp.asarray(simple_tokenize([args.prompt]))
    params = model.init(jax.random.key(0), image_shape=image_shape,
                        cond_example=tokens)
    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        params = restore_checkpoint(os.path.join(args.resume, "ckpt"), params)
    else:
        print("WARNING: sampling from randomly initialized weights "
              "(CLIP weights load from disk when available)")

    c = model.get_learned_conditioning(
        params, jnp.tile(tokens, (args.n_samples, 1)))
    uc = model.get_learned_conditioning(
        params, jnp.asarray(simple_tokenize([""] * args.n_samples)))

    h, w, ch = latent
    z = ddim_sample(model, params, jax.random.key(1),
                    (args.n_samples, h, w, ch), steps=args.steps,
                    cond={"c_crossattn": c}, uncond={"c_crossattn": uc},
                    cfg_scale=args.cfg_scale)
    imgs = np.asarray(model.decode_first_stage(params, z))
    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, "text2lidar_samples.npy"), imgs)
    print(f"prompt={args.prompt!r} -> {imgs.shape} -> {args.outdir}")


if __name__ == "__main__":
    main()
