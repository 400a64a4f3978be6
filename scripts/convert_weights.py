#!/usr/bin/env python
"""Convert reference PyTorch checkpoints into this framework's checkpoints.

The migration entry point for users of the reference (MIGRATING.md): take a
published LiDAR-Diffusion/LiDAR-Layout ``model.ckpt`` plus its YAML config and
produce a run directory whose ``ckpt/`` this repo's scripts restore directly:

  # first-stage VQ autoencoder (reference autoencoder_c2_p4.yaml ckpt)
  python scripts/convert_weights.py -b configs/autoencoder/kitti/autoencoder_c2_p4.yaml \
      --ckpt /path/model.ckpt -o runs/converted_ae
  python scripts/eval_ae.py -b ... -r runs/converted_ae -d /data/kitti360

  # full latent-diffusion run (model.diffusion_model.* + first_stage_model.*)
  python scripts/convert_weights.py -b configs/lidar_diffusion/kitti/uncond_c2_p4.yaml \
      --ckpt /path/model.ckpt -o runs/converted_lidm
  python scripts/sample.py -b ... -r runs/converted_lidm -n 8

Uses utils.torch_convert (name-keyed, parity-tested in
tests/test_torch_parity.py) and reports conversion coverage (loaded /
missing / shape-mismatched tensors) per sub-tree. The reference's in-ckpt
EMA ("model_ema.*", torch LitEma's mangled flat names) is not mapped; the
EMA slot of the converted state is seeded from the converted online weights,
which is what ``ema_scope`` sampling then uses.

Eval feature nets (rangenet/minkowskinet/spvcnn for FRID/FSVD/FPVD) are NOT
handled here — they load + convert transparently from
``./pretrained_weights/<dataset>/<model>/`` via eval.registry (see
eval/rangenet.load_torch_weights, eval/sparse_seg_nets).

Reference workflow being replaced: lidm's scripts load torch checkpoints via
``load_state_dict`` inside each script (scripts/sample.py:268-273).
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="translated YAML config")
    p.add_argument("--ckpt", required=True, help="reference torch checkpoint")
    p.add_argument("-o", "--outdir", required=True, help="output run dir")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.models.autoencoder import (AutoencoderKL, VQModel)
    from lidar_layout_tpu.models.diffusion import LatentDiffusion
    from lidar_layout_tpu.train.checkpoint import save_checkpoint
    from lidar_layout_tpu.utils.torch_convert import (
        convert_unet, convert_vq_autoencoder, load_torch_state_dict,
        merge_into)

    cfg = load_yaml(args.base)
    model = instantiate_from_config(cfg["model"])
    sd = load_torch_state_dict(args.ckpt)
    print(f"[convert] {len(sd)} tensors in {args.ckpt}")

    data_p = cfg.get("data", {}).get("params", {})
    h, w = data_p.get("dataset", {}).get("size", (64, 1024))

    os.makedirs(args.outdir, exist_ok=True)
    if isinstance(model, (VQModel, AutoencoderKL)):
        x0 = jnp.zeros((1, h, w, model.cfg.in_channels))
        params = model.init(jax.random.key(0), x0)
        conv = convert_vq_autoencoder(sd)
        print("[convert] autoencoder tree:")
        merged = merge_into(params, conv)
        save_checkpoint(os.path.join(args.outdir, "ckpt"), 0,
                        {"params_g": merged})
    elif isinstance(model, LatentDiffusion):
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer)

        fs_cfg = cfg["model"]["params"].get("first_stage_config", {})
        in_ch = fs_cfg.get("params", {}).get("ddconfig", {}) \
                      .get("in_channels", 1)
        params = model.init(jax.random.key(0), image_shape=(h, w, in_ch))

        up = cfg["model"]["params"]["unet_config"]["params"]
        conv_unet = convert_unet(
            sd, num_res_blocks=up["num_res_blocks"],
            channel_mult=tuple(up["channel_mult"]),
            num_head_channels=up.get("num_head_channels", 32),
            prefix="model.diffusion_model.")
        print("[convert] unet tree:")
        params["unet"] = merge_into(params["unet"], conv_unet)
        if "first_stage" in params and any(
                k.startswith("first_stage_model.") for k in sd):
            conv_fs = convert_vq_autoencoder(
                {k[len("first_stage_model."):]: v for k, v in sd.items()
                 if k.startswith("first_stage_model.")})
            print("[convert] first-stage tree:")
            params["first_stage"] = merge_into(params["first_stage"], conv_fs)
        state = create_train_state(model, params, make_optimizer(1e-4))
        save_checkpoint(os.path.join(args.outdir, "ckpt"), 0, state)
    else:
        raise SystemExit(f"no converter for model family {type(model).__name__}"
                         " — supported: VQModel/AutoencoderKL/LatentDiffusion")

    shutil.copy(args.base, os.path.join(args.outdir, "config.yaml"))
    print(f"[convert] wrote {args.outdir}/ckpt (+config.yaml)")


if __name__ == "__main__":
    main()
