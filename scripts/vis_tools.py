#!/usr/bin/env python
"""Interactive visualization of generated samples.

Parity with the reference ``scripts/vis_tools`` (polyscope window /
``lidar_generate_gradio_ui.py``): loads sample outputs (the ``samples_pcd.npz``
/ ``samples_range.npy`` files that ``sample*.py`` writes, or raw ``.bin``
velodyne scans) and writes a dependency-free interactive HTML orbit viewer —
the headless-TPU-box replacement for a GUI window. Optionally generates fresh
samples from a checkpoint first (the gradio UI's "Generate" button).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-f", "--file", default=None,
                   help=".npz (pcd_*), .npy range images, .bin scan, or a "
                        "sample.py outdir")
    p.add_argument("-b", "--base", default=None,
                   help="model YAML — generate fresh samples instead "
                        "(needs -r)")
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("-n", "--n-samples", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("-o", "--out", default="./vis.html")
    p.add_argument("--grid", action="store_true",
                   help="tile all clouds in one scene grid")
    args = p.parse_args()

    import numpy as np

    from lidar_layout_tpu.utils.vis import save_pcd_html, save_scene_grid_html

    clouds = []
    if args.base:  # generate path (the UI's buttons)
        import subprocess
        outdir = os.path.join(os.path.dirname(args.out) or ".", "_vis_samples")
        cmd = [sys.executable,
               os.path.join(os.path.dirname(__file__), "sample.py"),
               "-b", args.base, "-n", str(args.n_samples),
               "--batch", str(min(args.n_samples, 4)),
               "--steps", str(args.steps), "--outdir", outdir]
        if args.resume:
            cmd += ["-r", args.resume]
        subprocess.run(cmd, check=True)
        args.file = os.path.join(outdir, "samples_pcd.npz")

    if not args.file:
        raise SystemExit("need -f samples or -b config")

    path = args.file
    if os.path.isdir(path):
        npz = os.path.join(path, "samples_pcd.npz")
        path = npz if os.path.isfile(npz) else \
            (glob.glob(os.path.join(path, "*.npz")) + [None])[0]
        if path is None:
            raise SystemExit(f"no .npz found under {args.file}")

    if path.endswith(".npz"):
        data = np.load(path)
        clouds = [np.asarray(data[k], np.float32) for k in sorted(data.files)]
    elif path.endswith(".npy"):
        import jax.numpy as jnp

        from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, range2pcd
        for img in np.load(path)[..., 0]:
            xyz, valid = range2pcd(jnp.asarray(img), KITTI_GEOMETRY)
            clouds.append(np.asarray(xyz)[np.asarray(valid)])
    elif path.endswith(".bin"):
        pts = np.fromfile(path, np.float32).reshape(-1, 4)[:, :3]
        clouds = [pts]
    else:
        raise SystemExit(f"unsupported input {path!r}")

    clouds = clouds[: args.n_samples]
    if args.grid and len(clouds) > 1:
        out = save_scene_grid_html(args.out, clouds)
    else:
        out = save_pcd_html(args.out, np.concatenate(clouds, 0)
                            if len(clouds) > 1 else clouds[0])
    print(f"wrote {out} ({sum(len(c) for c in clouds)} points, "
          f"{len(clouds)} clouds) — open in any browser")


if __name__ == "__main__":
    main()
