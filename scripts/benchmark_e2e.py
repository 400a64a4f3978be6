#!/usr/bin/env python
"""North-star benchmark (BASELINE.json): generate N unconditional 64-beam
samples AND score them (JSD/MMD device-side) end-to-end, reporting wall time.

Reference context: 2k samples at the reference's 50 s/sample class would take
~28 hours; the target is "generated and scored on a v5e-8 in under 10 minutes".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--n-samples", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--skip-eval", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from lidar_layout_tpu.models.samplers import ddim_sample
    from lidar_layout_tpu.ops.lidar import KITTI_GEOMETRY, LidarGeometry, range2pcd

    model, image_shape = _flagship(tiny=args.tiny, dtype=jnp.bfloat16)
    geom = (LidarGeometry(size=(16, 128)) if args.tiny else KITTI_GEOMETRY)
    params = model.init(jax.random.key(0), image_shape=image_shape)
    h, w, c = model.cfg.latent_shape

    @jax.jit
    def sample_batch(params, rng):
        z = ddim_sample(model, params, rng, (args.batch, h, w, c),
                        steps=args.steps)
        imgs = model.decode_first_stage(params, z)
        # reproject on-device too: ONE readback per batch, no per-sample trips
        xyz, valid = jax.vmap(lambda im: range2pcd(im, geom))(imgs[..., 0])
        return xyz, valid

    # warmup/compile outside the timed region (the reference also excludes
    # model build; sampling throughput is the metric)
    jax.tree.map(np.asarray, sample_batch(params, jax.random.key(0)))

    t0 = time.perf_counter()
    clouds = []
    n_batches = (args.n_samples + args.batch - 1) // args.batch
    rng = jax.random.key(42)
    for i in range(n_batches):
        xyz, valid = jax.tree.map(np.asarray,
                                  sample_batch(params, jax.random.fold_in(rng, i)))
        for p, v in zip(xyz, valid):
            clouds.append(p[v])
    t_gen = time.perf_counter() - t0

    result = {"n_samples": len(clouds[: args.n_samples]),
              "gen_seconds": round(t_gen, 1),
              "samples_per_sec": round(args.n_samples / t_gen, 2)}

    if not args.skip_eval:
        from lidar_layout_tpu.data.synthetic import synthetic_scene
        from lidar_layout_tpu.eval.metrics import evaluate
        ref = [synthetic_scene(np.random.default_rng(i))
               for i in range(min(len(clouds), 64))]
        t1 = time.perf_counter()
        metrics = evaluate(ref, clouds[: len(ref)], ["jsd", "mmd"], "64")
        result["eval_seconds"] = round(time.perf_counter() - t1, 1)
        result.update({k: round(v, 6) for k, v in metrics.items()})

    result["total_seconds"] = round(time.perf_counter() - t0, 1)
    result["under_10_min"] = result["total_seconds"] < 600
    print(json.dumps(result))


if __name__ == "__main__":
    main()
