#!/usr/bin/env python
"""On-chip ablation of the two Pallas kernels in the flagship U-Net step.

Times one full denoiser apply (batch 16 and 128, bf16) in three variants:
  full        — fused groupnorm+SiLU kernel AND flash attention (production)
  xla_norm    — groupnorm forced onto the XLA fallback path
  xla_attn    — attention forced onto the XLA fallback path

Prints a JSON dict; PERF.md records the numbers. One TPU job at a time
(CLAUDE.md) — run only when the chip is idle.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    import lidar_layout_tpu.ops.pallas_groupnorm as gn
    import lidar_layout_tpu.ops.pallas_attention as pa

    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), image_shape=(64, 1024, 1))
    h, w, c = model.cfg.latent_shape

    def timed_apply(batch, reps=20):
        z0 = jax.random.normal(jax.random.key(1), (batch, h, w, c),
                               jnp.bfloat16)
        t0 = jnp.full((batch,), 512, jnp.int32)

        @jax.jit
        def loop(z):
            def body(zc, _):
                out = model.apply_model(params, zc, t0, None)
                return (zc * 0.5 + out.astype(zc.dtype) * 0.5), ()
            zf, _ = jax.lax.scan(body, z, None, length=reps)
            return jnp.sum(zf.astype(jnp.float32))

        _ = float(loop(z0))  # compile + warm
        t = time.perf_counter()
        _ = float(loop(z0))
        return (time.perf_counter() - t) / reps

    results = {}
    orig_gn, orig_attend = gn.group_norm, pa.attend

    for batch in (16, 128):
        # production path
        results[f"full_b{batch}_ms"] = round(timed_apply(batch) * 1e3, 2)
        # norm ablation
        gn.group_norm = functools.partial(orig_gn, force_ref=True)
        results[f"xla_norm_b{batch}_ms"] = round(timed_apply(batch) * 1e3, 2)
        gn.group_norm = orig_gn
        # attention ablation
        pa.attend = lambda q, k, v, mask=None: jax.nn.dot_product_attention(
            q, k, v, mask=mask)
        try:
            results[f"xla_attn_b{batch}_ms"] = round(
                timed_apply(batch) * 1e3, 2)
        except Exception as e:  # b128 f32-logits path can OOM at compile
            results[f"xla_attn_b{batch}_ms"] = f"failed: {type(e).__name__}"
        pa.attend = orig_attend

    print(json.dumps(results))


if __name__ == "__main__":
    main()
