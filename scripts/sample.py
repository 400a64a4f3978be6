#!/usr/bin/env python
"""Unconditional sampling + optional evaluation.

CLI parity with the reference ``scripts/sample.py``: -r ckpt/run dir, -d
dataset type, -n n_samples, --eval (JSD/MMD + FRID when features available);
writes range-image .npy and point-cloud .npz outputs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="model YAML config")
    p.add_argument("-r", "--resume", default=None, help="run dir with ckpt/")
    p.add_argument("-d", "--dataset", default="64", choices=["32", "64"])
    p.add_argument("-n", "--n-samples", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "plms", "ddpm", "dpm"])
    p.add_argument("--eval", action="store_true")
    p.add_argument("-f", "--file", default=None,
                   help="pre-generated samples (.npz of pcd_* clouds or "
                        ".npy of range images) — evaluate these instead of "
                        "sampling (the reference's --baseline flow)")
    p.add_argument("--metrics", default="jsd,mmd,frid",
                   help="comma list: jsd,mmd,cd,emd,frid,fsvd,fpvd")
    p.add_argument("--data-root", default=None,
                   help="real scans for the --eval reference set")
    p.add_argument("--weights-root", default="./pretrained_weights")
    p.add_argument("--outdir", default="./samples")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--html", action="store_true",
                   help="also write an interactive viewer.html of the first "
                        "16 samples (the reference's gradio generate+view "
                        "flow, scripts/vis_tools/lidar_generate_gradio_ui.py)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.models.samplers import (ddim_sample, ddpm_sample,
                                                  dpm_solver_sample,
                                                  plms_sample)
    from lidar_layout_tpu.ops.lidar import range2pcd

    cfg = load_yaml(args.base)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = instantiate_from_config(cfg["model"], dtype=dtype)
    geom = _geometry(args)

    if args.file:
        # eval-only on pre-generated samples (reference sample.py:227-250,
        # 393-396: baselines / other methods' outputs)
        all_pcds = []
        if args.file.endswith(".npz"):
            data = np.load(args.file)
            all_pcds = [np.asarray(data[k], np.float32)
                        for k in sorted(data.files)]
        elif args.file.endswith(".npy"):
            for img in np.load(args.file)[..., 0]:
                xyz, valid = range2pcd(jnp.asarray(img), geom)
                all_pcds.append(np.asarray(xyz)[np.asarray(valid)])
        else:
            raise SystemExit(f"unsupported sample file {args.file!r} "
                             "(.npz of clouds or .npy of range images)")
        print(f"loaded {len(all_pcds)} pre-generated samples from {args.file}")
        _evaluate(args, all_pcds)
        return

    params = model.init(jax.random.key(0), image_shape=(*geom.size, 1))
    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        from lidar_layout_tpu.train.diffusion_trainer import (
            create_train_state, make_optimizer, ema_params)
        tx = make_optimizer(1e-4)
        state = create_train_state(model, params, tx)
        state = restore_checkpoint(os.path.join(args.resume, "ckpt"), state)
        params = ema_params(model, state)  # ema_scope for sampling
        print(f"loaded EMA weights from {args.resume}")
    else:
        print("WARNING: sampling from randomly initialized weights")

    h, w, c = model.cfg.latent_shape
    sampler = {"ddim": lambda p, r: ddim_sample(model, p, r,
                                                (args.batch, h, w, c),
                                                steps=args.steps, eta=args.eta),
               "plms": lambda p, r: plms_sample(model, p, r,
                                                (args.batch, h, w, c),
                                                steps=args.steps),
               "dpm": lambda p, r: dpm_solver_sample(model, p, r,
                                                     (args.batch, h, w, c),
                                                     steps=args.steps),
               "ddpm": lambda p, r: ddpm_sample(model, p, r,
                                                (args.batch, h, w, c))}[args.sampler]

    @jax.jit
    def sample_batch(params, rng):
        z = sampler(params, rng)
        return model.decode_first_stage(params, z)

    os.makedirs(args.outdir, exist_ok=True)
    all_imgs, all_pcds = [], []
    rng = jax.random.key(42)
    n_batches = (args.n_samples + args.batch - 1) // args.batch
    for i in range(n_batches):
        t0 = time.perf_counter()
        imgs = np.asarray(sample_batch(params, jax.random.fold_in(rng, i)))
        dt = time.perf_counter() - t0
        print(f"batch {i + 1}/{n_batches}: {imgs.shape[0] / dt:.2f} samples/s",
              flush=True)
        all_imgs.append(imgs)
        for img in imgs[..., 0]:
            xyz, valid = range2pcd(jnp.asarray(img), geom)
            all_pcds.append(np.asarray(xyz)[np.asarray(valid)])

    imgs = np.concatenate(all_imgs)[: args.n_samples]
    np.save(os.path.join(args.outdir, "samples_range.npy"), imgs)
    np.savez(os.path.join(args.outdir, "samples_pcd.npz"),
             **{f"pcd_{i}": p for i, p in enumerate(all_pcds[: args.n_samples])})
    print(f"wrote {len(imgs)} samples to {args.outdir}")
    if args.html:
        from lidar_layout_tpu.utils.vis import save_scene_grid_html
        out = save_scene_grid_html(os.path.join(args.outdir, "viewer.html"),
                                   all_pcds[:16])
        print(f"interactive viewer: {out}")

    if args.eval:
        _evaluate(args, all_pcds)


def _geometry(args):
    """Projection geometry: the config's dataset block if present, else the
    per-dataset default (reference wires dataset_config into everything,
    main.py:558-559)."""
    from lidar_layout_tpu.config import load_yaml
    from lidar_layout_tpu.ops.lidar import (KITTI_GEOMETRY, LidarGeometry,
                                            NUSCENES_GEOMETRY)

    dset_cfg = {}
    if getattr(args, "base", None):
        cfg = load_yaml(args.base)
        dset_cfg = cfg.get("data", {}).get("params", {}).get("dataset", {})
    if dset_cfg:
        return LidarGeometry(
            size=tuple(dset_cfg.get("size", (64, 1024))),
            fov=tuple(dset_cfg.get("fov", (3, -25))),
            depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
            depth_scale=dset_cfg.get("depth_scale", 5.84),
            log_scale=dset_cfg.get("log_scale", True))
    return KITTI_GEOMETRY if args.dataset == "64" else NUSCENES_GEOMETRY


def _evaluate(args, all_pcds):
    """The reference's quality gate (lidm/eval/eval_utils.py evaluate):
    score samples against REAL held-out scans, with perceptual FRID/
    FSVD/FPVD features from the frozen extractor registry."""
    import json
    import os

    import numpy as np

    from lidar_layout_tpu.eval.metrics import evaluate
    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]

    ref = []
    if args.data_root and os.path.isdir(args.data_root):
        from lidar_layout_tpu.data.datasets import (list_kitti360_scans,
                                                    list_semantic_kitti_scans,
                                                    read_velodyne_bin)
        from lidar_layout_tpu.data.readers import (list_nuscenes_sweeps,
                                                   read_nuscenes_bin)
        files = (list_kitti360_scans(args.data_root, "val")
                 or list_semantic_kitti_scans(args.data_root, "val"))
        reader = lambda f: read_velodyne_bin(f)[:, :3]
        if not files:
            files = list_nuscenes_sweeps(args.data_root, "val", "samples")
            reader = lambda f: read_nuscenes_bin(f)[:, :3]
        for f in files[: len(all_pcds)]:
            ref.append(reader(f))
    if not ref:
        from lidar_layout_tpu.data.synthetic import synthetic_scene
        print("[eval] no --data-root scans found — synthetic reference "
              "set (relative comparisons only, NOT the published tables)")
        ref = [synthetic_scene(np.random.default_rng(i))
               for i in range(len(all_pcds))]

    # Range-roundtrip the references: the reference evaluates samples against
    # example['reproj'] = range2pcd(pcd2range(scan)) (kitti.py:75-77,
    # sample.py:298-300), NOT raw scans — both sides of evaluate() live in
    # range-image space. Fixed-capacity padding keeps this one compile for
    # ragged scans (each new shape would be a fresh remote TPU compile).
    import jax
    import jax.numpy as jnp

    from lidar_layout_tpu.ops import lidar as L

    geom = _geometry(args)
    cap = 1 << int(np.ceil(np.log2(max(len(p) for p in ref))))

    @jax.jit
    def _reproj(pts, mask):
        img, _ = L.pcd2range(pts, geom, mask=mask)
        model_img, _ = L.process_scan(img, geom)
        return L.range2pcd(model_img, geom)

    rref = []
    for p in ref:
        pad = np.zeros((cap, 3), np.float32)
        pad[: len(p)] = p[:cap]
        m = np.zeros((cap,), bool)
        m[: len(p)] = True
        xyz, valid = jax.tree.map(np.asarray,
                                  _reproj(jnp.asarray(pad), jnp.asarray(m)))
        rref.append(xyz[valid])
    ref = rref

    feature_fn = {}
    modalities = {"frid": "range", "fsvd": "voxel", "fpvd": "point_voxel"}
    for m in metrics:
        if m in modalities:
            from lidar_layout_tpu.eval.registry import build_feature_fn
            feature_fn[m] = build_feature_fn(
                args.dataset, modalities[m], weights_root=args.weights_root)

    out = evaluate(ref, all_pcds, metrics, args.dataset,
                   feature_fn=feature_fn)
    print(json.dumps(out))
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "eval.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
