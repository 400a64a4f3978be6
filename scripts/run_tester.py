#!/usr/bin/env python
"""Evaluation driver over the TESTERS registry.

Parity: pointcept ``tools/test.py`` + ``engines/test.py`` — pick a tester,
build the model + dataset from a YAML config, run the metered eval loop.

  python scripts/run_tester.py -b config.yaml --tester ReconTester \
      -d /data/kitti360 --n-batches 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="model YAML config")
    p.add_argument("--tester", default="ReconTester",
                   help="SemSegTester | DINOSemSegTester | ClsTester | "
                        "ClsVotingTester | PartSegTester | ReconTester")
    p.add_argument("-d", "--data-root", default=None)
    p.add_argument("-r", "--resume", default=None, help="run dir with ckpt/")
    p.add_argument("--n-batches", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import itertools

    import jax.numpy as jnp

    from lidar_layout_tpu.config import instantiate_from_config, load_yaml
    from lidar_layout_tpu.data.datasets import RangeImageDataset
    from lidar_layout_tpu.ops.lidar import LidarGeometry
    from lidar_layout_tpu.train.tester import TESTERS

    cfg = load_yaml(args.base)
    dset_cfg = cfg.get("data", {}).get("params", {}).get("dataset", {})
    geom = LidarGeometry(
        size=tuple(dset_cfg.get("size", (64, 1024))),
        fov=tuple(dset_cfg.get("fov", (3, -25))),
        depth_range=tuple(dset_cfg.get("depth_range", (1.0, 56.0))),
        depth_scale=dset_cfg.get("depth_scale", 5.84),
        log_scale=dset_cfg.get("log_scale", True))

    model = instantiate_from_config(cfg["model"])
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, *geom.size, model.cfg.in_channels))) \
        if hasattr(model, "cfg") and hasattr(model.cfg, "in_channels") else \
        model.init(jax.random.key(0), image_shape=(*geom.size, 1))

    if args.resume:
        from lidar_layout_tpu.train.checkpoint import restore_checkpoint
        params = restore_checkpoint(os.path.join(args.resume, "ckpt"), params)

    if args.tester == "ReconTester":
        @jax.jit
        def apply_fn_jit(image):
            out = model.apply(params, image)
            return out[0] if isinstance(out, tuple) else out

        apply_fn = lambda b: apply_fn_jit(jnp.asarray(b["image"]))
        tester = TESTERS[args.tester](apply_fn)
    else:
        @jax.jit
        def apply_fn_jit(batch):
            return model.apply(params, batch)

        apply_fn = lambda b: apply_fn_jit(b)
        tester = TESTERS[args.tester](apply_fn, num_classes=args.num_classes)

    ds = RangeImageDataset(None if args.synthetic else args.data_root,
                           batch_size=args.batch_size, geom=geom, seed=0)
    batches = itertools.islice(ds.batches(), args.n_batches)
    out = tester.test(batches)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
