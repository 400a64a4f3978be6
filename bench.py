"""Benchmark: unconditional 64-beam LiDM sampling throughput on one TPU chip.

Mirrors the reference's measured quantity (scripts/sample.py:107 logs
samples/(t1-t0) per batch): full 50-step DDIM over the 16x128x8 latent with the
256-channel U-Net, followed by VQ decode to the 64x1024 range image — the
entire loop one compiled XLA program.

Baseline: the reference README's sampling-time class for LiDM is "50 s" per
sample at 50 steps on an RTX 3090 (README.md:101-104, batch-1 measurement the
paper reports) => 0.02 samples/sec. vs_baseline = ours / 0.02.

Beyond the headline number the JSON carries the evidence VERDICT r1 #7 asked
for: model FLOP utilization against the chip's bf16 peak, a U-Net-vs-decode
phase split, the measured per-dispatch overhead of the axon relay (which
explains the round-1 batch-16/32/64 "cliff": at small batches the fixed
~0.5-2 s relay round trip dominates), and a batch sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

PEAK_BF16_FLOPS = {
    "v5e": 197e12, "v5litepod": 197e12, "v5p": 459e12,
    "v4": 275e12, "v6e": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, val in PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return 197e12  # assume v5e (the graft target)


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _timeit(fn, *args, reps=3):
    """Median wall time; float() readback forces completion through the relay
    (block_until_ready does not truly block through axon)."""
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from lidar_layout_tpu.models.samplers import ddim_sample

    dev = jax.devices()[0]
    model, _ = _flagship(tiny=False, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), image_shape=(64, 1024, 1))

    batch = 16  # careful 3-rep sweep r2: 8: 10.4, 16: 10.8, 32: 10.6,
    # 64: 10.2, 128: 9.7, 256: 9.5 samples/s — flat; 16 is the knee, and
    # small-batch latency (1.5 s / 16 samples) is the serving-relevant point
    steps = 50
    h, w, c = model.cfg.latent_shape
    rng = jax.random.key(1)

    def make_sample(b, micro=0):
        """micro > 0: run the full sampler per micro-batch via lax.map inside
        ONE program. The 16->128 batch decline (PERF.md r4) is conv-trunk
        activation residency — at batch 16 the resblock chain stays fused/
        resident, at 128 its per-sample HBM traffic grows. Micro-batching
        keeps each sequentially-mapped chain at the residency sweet spot
        while still amortizing dispatch over the big batch (VERDICT r4
        task 5)."""
        @jax.jit
        def sample(params, rng):
            if micro and b > micro:
                keys = jax.random.split(rng, b // micro)

                def one(key):
                    z = ddim_sample(model, params, key,
                                    (micro, h, w, c), steps=steps)
                    return model.decode_first_stage(params, z)
                dec = jax.lax.map(one, keys)
            else:
                z = ddim_sample(model, params, rng, (b, h, w, c), steps=steps)
                dec = model.decode_first_stage(params, z)
            # scalar readback: one tiny transfer forces completion
            return jnp.sum(dec.astype(jnp.float32))
        return sample

    # ---- phase programs: denoise-only and decode-only ----
    @jax.jit
    def unet_only(params, rng):
        z = ddim_sample(model, params, rng, (batch, h, w, c), steps=steps)
        return jnp.sum(z.astype(jnp.float32))

    @jax.jit
    def decode_only(params, z):
        return jnp.sum(model.decode_first_stage(params, z).astype(jnp.float32))

    @jax.jit
    def null_prog(x):
        return x + 1.0

    # ---- compile + measure ----
    sample = make_sample(batch)

    # FLOPs: cost_analysis undercounts lax.scan bodies (counted once, not
    # x length), so lower the unrolled pieces: one denoiser apply x steps
    # + one decode. (measured r2: 37.4T "program flops" vs ~640T actual.)
    t0_ = jnp.zeros((batch,), jnp.int32)
    z0_ = jnp.zeros((batch, h, w, c), jnp.bfloat16)
    unet_flops = _flops_of(
        jax.jit(lambda p, z, t: model.apply_model(p, z, t, None))
        .lower(params, z0_, t0_).compile())
    dec_flops = _flops_of(
        jax.jit(lambda p, z: model.decode_first_stage(p, z))
        .lower(params, z0_).compile())
    flops = unet_flops * steps + dec_flops

    _ = float(sample(params, rng))  # warmup/execute once
    dt = _timeit(sample, params, rng)

    z0 = jax.random.normal(jax.random.key(2), (batch, h, w, c), jnp.bfloat16)
    _ = float(unet_only(params, rng))
    _ = float(decode_only(params, z0))
    dt_unet = _timeit(unet_only, params, rng)
    dt_dec = _timeit(decode_only, params, z0)
    x1 = jnp.zeros((), jnp.float32)
    _ = float(null_prog(x1))
    dt_null = _timeit(null_prog, x1, reps=5)

    samples_per_sec = batch / dt
    peak = _peak_flops(dev)
    mfu = flops / dt / peak if flops else None

    # ---- batch sweep (compile excluded); large batches also try the
    # micro-batched program (residency fix, VERDICT r4 task 5) ----
    sweep = {str(batch): round(samples_per_sec, 2)}
    sweep_detail = {}
    for b in (64, 128):
        fn = make_sample(b)
        _ = float(fn(params, rng))
        plain = b / _timeit(fn, params, rng, reps=2)
        try:
            fnm = make_sample(b, micro=16)
            _ = float(fnm(params, rng))
            mic = b / _timeit(fnm, params, rng, reps=2)
        except Exception as e:  # never let the variant sink the headline
            mic, e_msg = 0.0, f"{type(e).__name__}: {e}"[:120]
        else:
            e_msg = None
        sweep[str(b)] = round(max(plain, mic), 2)
        sweep_detail[str(b)] = {"plain": round(plain, 2),
                                "micro16_laxmap": round(mic, 2) or e_msg}

    baseline = 0.02  # reference: 50 s/sample class, 50-step DDIM, RTX 3090
    result = {
        "metric": "uncond 64-beam LiDM 50-step DDIM + VQ decode, samples/sec/chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / baseline, 1),
        "batch": batch,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "program_tflops": round(flops / 1e12, 2) if flops else None,
        "device": getattr(dev, "device_kind", str(dev)),
        "phase_seconds": {"sample_total": round(dt, 3),
                          "unet_50step": round(dt_unet, 3),
                          "vq_decode": round(dt_dec, 3),
                          "dispatch_null": round(dt_null, 3)},
        "batch_sweep_samples_per_sec": sweep,
        "batch_sweep_detail": sweep_detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
