"""Benchmark: unconditional 64-beam LiDM sampling throughput on one TPU chip.

Mirrors the reference's measured quantity (scripts/sample.py:107 logs
samples/(t1-t0) per batch): full 50-step DDIM over the 16x128x8 latent with the
256-channel U-Net, followed by VQ decode to the 64x1024 range image — the
entire loop one compiled XLA program.

Baseline: the reference README's sampling-time class for LiDM is "50 s" per
sample at 50 steps on an RTX 3090 (README.md:101-104, batch-1 measurement the
paper reports) => 0.02 samples/sec. vs_baseline = ours / 0.02.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from lidar_layout_tpu.models.samplers import ddim_sample

    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0),
                        image_shape=(64, 1024, 1))

    batch = 64  # best throughput in the batch sweep (16: 6.1, 32: 6.0, 64: 10.2 samples/s)
    steps = 50
    h, w, c = model.cfg.latent_shape

    @jax.jit
    def sample(params, rng):
        z = ddim_sample(model, params, rng, (batch, h, w, c), steps=steps)
        dec = model.decode_first_stage(params, z)
        # reduce to a scalar on-device so one tiny readback forces completion
        # (block_until_ready does not truly block through the axon relay)
        return jnp.sum(dec.astype(jnp.float32))

    # compile + warmup (float() forces the full round trip)
    rng = jax.random.key(1)
    _ = float(sample(params, rng))

    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        _ = float(sample(params, jax.random.fold_in(rng, i)))
    dt = (time.perf_counter() - t0) / n_rep

    samples_per_sec = batch / dt
    baseline = 0.02  # reference: 50 s/sample class, 50-step DDIM, RTX 3090
    result = {
        "metric": "uncond 64-beam LiDM 50-step DDIM + VQ decode, samples/sec/chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / baseline, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
