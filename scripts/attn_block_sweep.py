#!/usr/bin/env python
"""Retune the flash-attention q-block size under the jax-0.9 Mosaic toolchain
(VERDICT r3 #2: 'retune the Pallas block configs under 0.9's VMEM accounting').

Times ops/pallas_attention.flash_attention at the flagship denoiser's three
attention shapes (latent 16x128 -> ds1 2048 / ds2 512 / ds4 128 tokens) for
bq in {128, 256, 512}, 50 reps folded into one scan. Prints a JSON table;
PERF.md records it. One TPU job at a time.
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

    from lidar_layout_tpu.ops import pallas_attention as pa

    shapes = [  # (B, H, S, D): ds1 / ds2 / ds4 of the flagship at batch 16
        (16, 8, 2048, 32),
        (16, 16, 512, 32),
        (16, 32, 128, 32),
    ]
    N = 50
    results = {}
    for shape in shapes:
        b, h, s, d = shape
        q = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), shape, jnp.bfloat16)
        for bq in (128, 256, 512):
            if s % bq:
                continue
            os.environ["LLT_ATTN_BQ"] = str(bq)

            @jax.jit
            def run(q, k, v):
                def body(qq, _):
                    o = pa._flash_fwd_tpu(qq, k, v)
                    return o, 0
                o, _ = jax.lax.scan(body, q, jnp.arange(N))
                return jnp.sum(o.astype(jnp.float32))

            float(run(q, k, v))  # compile+warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(q, k, v))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            ms = ts[1] / N * 1000
            tflops = 4 * b * h * s * s * d / (ms / 1000) / 1e12
            results[f"s{s}_bq{bq}"] = {"ms": round(ms, 3),
                                       "tflops": round(tflops, 1)}
            print(f"S={s} bq={bq}: {ms:.3f} ms  {tflops:.1f} TF/s",
                  flush=True)
    os.environ.pop("LLT_ATTN_BQ", None)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
