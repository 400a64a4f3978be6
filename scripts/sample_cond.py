#!/usr/bin/env python
"""Conditional sampling: semantic-map or camera -> LiDAR.

Parity: ``scripts/sample_cond.py`` — loops validation batches through the
conditional LatentDiffusion's sampling path (map2lidar via concat of the
SpatialRescaler'd one-hot map; cam2lidar via multi-view CLIP cross-attention).
Runs with synthetic conditions when no dataset root is given.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["map2lidar", "cam2lidar"],
                   default="map2lidar")
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-n", "--n-samples", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--outdir", default="./samples_cond")
    p.add_argument("--tiny", action="store_true", help="CPU-sized model")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.encoders.modules import (FrozenClipMultiImageEmbedder,
                                                   SpatialRescaler)
    from lidar_layout_tpu.models.autoencoder import AEConfig
    from lidar_layout_tpu.models.diffusion import (DiffusionConfig,
                                                   LatentDiffusion)
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.models.unet import UNetConfig

    num_sem = 19
    if args.tiny:
        latent = (4, 16, 8)
        image_shape = (16, 128, 1)
        mc, mult, nrb = 32, (1, 2), 1
    else:
        latent = (16, 128, 8)
        image_shape = (64, 1024, 1)
        mc, mult, nrb = 256, (1, 2, 4), 2

    if args.task == "map2lidar":
        # semantic map -> downsampled one-hot concat conditioning; the latent
        # is H/4 x W/8 of the image (curve-wise c2 + patch-wise p4 strides),
        # so one asymmetric stage lands exactly on the latent grid
        cond_stage = SpatialRescaler(n_stages=1, out_channels=num_sem,
                                     wh_factors=(0.25, 0.125))
        cond_key = "concat"
        in_ch = latent[2] + num_sem
        cond_example = jnp.zeros((1, image_shape[0], image_shape[1], num_sem))
    else:
        cond_stage = FrozenClipMultiImageEmbedder(out_dim=512)
        cond_key = "crossattn"
        in_ch = latent[2]
        cond_example = jnp.zeros((1, 2, 224, 224, 3))

    unet_cfg = UNetConfig(in_channels=in_ch, model_channels=mc,
                          out_channels=latent[2], num_res_blocks=nrb,
                          attention_resolutions=(4, 2, 1), channel_mult=mult,
                          num_head_channels=32,
                          use_spatial_transformer=(cond_key == "crossattn"),
                          context_dim=512 if cond_key == "crossattn" else None)
    model = LatentDiffusion(
        DiffusionConfig(timesteps=1024, linear_start=0.0015, linear_end=0.0195,
                        conditioning_key=cond_key, latent_shape=latent),
        unet_cfg,
        first_stage_cfg=AEConfig(ch=16 if args.tiny else 64,
                                 ch_mult=(1, 2, 2, 4),
                                 strides=((1, 2), (2, 2), (2, 2)),
                                 z_channels=8, out_ch=2,
                                 num_res_blocks=nrb),
        use_mask=True, cond_stage=cond_stage)

    params = model.init(jax.random.key(0), image_shape=image_shape,
                        cond_example=cond_example)
    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        params = restore_checkpoint(os.path.join(args.resume, "ckpt"), params)
    else:
        print("WARNING: sampling from randomly initialized weights")

    # synthetic conditions
    rng = np.random.default_rng(0)
    if args.task == "map2lidar":
        sem = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, num_sem,
                                     (args.n_samples, *image_shape[:2]))),
            num_sem)
        cond_in = sem
    else:
        cond_in = jnp.asarray(rng.standard_normal(
            (args.n_samples, 2, 224, 224, 3)), jnp.float32)

    c = model.get_learned_conditioning(params, cond_in)
    if args.task == "map2lidar":
        cond = {"c_concat": c}
    else:
        cond = {"c_crossattn": c}

    h, w, ch = latent
    z = ddim_sample(model, params, jax.random.key(1),
                    (args.n_samples, h, w, ch), steps=args.steps, cond=cond)
    imgs = np.asarray(model.decode_first_stage(params, z))

    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, f"{args.task}_samples.npy"), imgs)
    print(f"wrote {imgs.shape} -> {args.outdir}")


if __name__ == "__main__":
    main()
