#!/usr/bin/env python
"""Attribute the jax-0.9 sampler regression (VERDICT r2 weak #2).

Times the flagship denoiser step and ablates the two custom Pallas kernels
against their XLA fallbacks so the ~5-12% toolchain loss can be localized
(kernel block configs were tuned under jax 0.5's Mosaic VMEM accounting;
0.9 charges ~25 B/elem for bf16 blocks — CLAUDE.md). One TPU job at a time.

Prints a JSON dict of median ms per variant (batch 16, 50 reps folded into
one scan so the ~35 ms relay readback amortizes away).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), image_shape=(64, 1024, 1))
    h, w, c = model.cfg.latent_shape
    batch = 16
    z0 = jax.random.normal(jax.random.key(1), (batch, h, w, c), jnp.float32)
    t0 = jnp.full((batch,), 512, jnp.int32)

    def reps_program(n):
        @jax.jit
        def run(params, z):
            def body(zz, i):
                out = model.apply_model(params, zz, t0, None)
                return out.astype(jnp.float32), 0
            zf, _ = jax.lax.scan(body, z, jnp.arange(n))
            return jnp.sum(zf)
        return run

    def timeit(fn, *args, reps=3):
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2]

    N = 50
    results = {}

    def measure(tag):
        run = reps_program(N)
        float(run(params, z0))  # compile+warm
        dt = timeit(run, params, z0)
        results[tag] = round(dt / N * 1000, 2)
        print(f"{tag}: {results[tag]} ms/step", flush=True)

    # baseline: both kernels on (the fused GN is default-off since r4 —
    # force it on here so the ablation keeps measuring it)
    from lidar_layout_tpu.ops import pallas_groupnorm as gn
    orig_enable = gn._fused_enabled
    gn._fused_enabled = lambda: True
    measure("unet_step_full")

    # ablate the fused GroupNorm kernel -> XLA reference path
    orig_gate = gn._supports_fused
    gn._supports_fused = lambda x: False
    measure("unet_step_xla_groupnorm")
    gn._supports_fused = orig_gate

    # ablate the Pallas flash attention -> XLA dot_product_attention
    # (pallas GN still forced on, so this row is GN=pallas / attn=XLA)
    from lidar_layout_tpu.ops import pallas_attention as pa
    orig_flash = pa._supports_flash
    pa._supports_flash = lambda q, k: False
    measure("unet_step_xla_attention")
    pa._supports_flash = orig_flash
    gn._fused_enabled = orig_enable

    # both off
    gn._supports_fused = lambda x: False
    pa._supports_flash = lambda q, k: False
    measure("unet_step_all_xla")
    gn._supports_fused = orig_gate
    pa._supports_flash = orig_flash

    results["batch"] = batch
    results["note"] = ("ms per denoiser apply_model (batch 16, bf16); "
                      "PERF.md r2 context: full sampler 33 ms/step-equiv "
                      "on jax0.5, ~35 on 0.9")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
