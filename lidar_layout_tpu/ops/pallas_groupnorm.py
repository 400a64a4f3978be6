"""Fused GroupNorm(+SiLU) kernel for the diffusion U-Net (Pallas/TPU).

Why this exists: every guided-diffusion ResBlock runs GroupNorm->SiLU twice
(openaimodel.py:163-266 -> models/unet.ResBlock here), and ``Normalize``
computes in f32 for stability. Under XLA that is a cast-to-f32 round trip
through HBM per norm (2x bytes of the bf16 activation) plus separate
reduce / normalize / SiLU passes — at the flagship sampler's ~45 norms per
U-Net step this is the largest remaining HBM sink after the attention kernel
(PERF.md: whole sampler ~25% of bf16 peak vs 61% for attention, 40% for the
conv trunk).

Design (TPU-first):
  * One grid step per batch row; the (N=H*W, C) activation block lives in
    VMEM once — stats, normalize, affine, and SiLU all happen on that single
    residency. bf16 in HBM stays bf16; only the VMEM-resident math is f32.
  * Group statistics via column sums: sum/sumsq over N (a sublane reduce)
    give (1, C) vectors; a tiny (C, G) one-hot matmul folds them into group
    sums and its transpose broadcasts the per-group mean/rstd back to
    channels. No cross-lane reshapes of the big block.
  * Fused-path gate: C % 128 == 0 (Mosaic garbage-lane rule, CLAUDE.md) and
    the block fits VMEM. Everything else falls back to the plain XLA path
    (`_ref`), as does the backward (analytic jnp GroupNorm vjp — training
    keeps XLA's fused bwd behavior; sampling, the bench target, never
    differentiates).

Feeds ``nn/blocks.Normalize(act=...)`` / ``models/unet.ResBlock``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Scoped-VMEM accounting for one grid step. jax 0.9's Mosaic allocates
# ~25.3 B/element for a bf16 block (observed: bf16 (1, 512, 1536) block =
# 786k elements -> 18.98 MB stack; the jax 0.5 compiler charged the same
# block <16 MB) — double-buffered in+out plus several materialized f32
# intermediates (xf, xf*xf, y, sigmoid(y)). Estimate conservatively at
# 4*itemsize + 20 B/elem (28 B bf16 / 36 B f32) and raise the kernel's
# scoped-vmem limit from the 16 MB default to _VMEM_LIMIT via
# CompilerParams.vmem_limit_bytes — v5e has 128 MB VMEM, and this kernel
# wants big single-residency blocks (that's the whole point: one HBM
# read + one write). Blocks whose estimate exceeds _VMEM_BUDGET (1.33x
# headroom under the limit) fall back to the plain XLA path.
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024


def _vmem_estimate(n: int, c: int, itemsize: int) -> int:
    return n * c * (4 * itemsize + 20)


def _ref(x: Array, gamma: Array, beta: Array, num_groups: int, eps: float,
         act: bool) -> Array:
    """Plain-XLA GroupNorm(+SiLU), f32 stats; the semantic spec for the kernel."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xhat.reshape(b, -1, c) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape).astype(x.dtype)


def _kernel(x_ref, g_ref, b_ref, o_ref, *, num_groups: int, eps: float,
            act: bool, n: int):
    x = x_ref[0]                                   # (N, C), input dtype
    c = x.shape[-1]
    cg = c // num_groups
    xf = x.astype(jnp.float32)

    s1 = jnp.sum(xf, axis=0, keepdims=True)        # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)   # (1, C)

    # (C, G) one-hot group membership: col c -> group c // cg
    col_g = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (col_g == grp).astype(jnp.float32)

    # f32 operands: force multi-pass MXU (Mosaic's default is 1-pass bf16,
    # ~1e-2 relative error — fatal for stats summed over N*cg elements)
    hi = jax.lax.Precision.HIGHEST
    inv_cnt = 1.0 / (n * cg)
    gmean = jnp.dot(s1, onehot, preferred_element_type=jnp.float32,
                    precision=hi) * inv_cnt
    gsq = jnp.dot(s2, onehot, preferred_element_type=jnp.float32,
                  precision=hi) * inv_cnt
    # E[x^2]-E[x]^2 can go slightly negative from f32 cancellation on
    # near-constant large-mean blocks (the two-pass _ref formula cannot);
    # clamp so rsqrt stays finite
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)   # (1, G)

    mean_c = jnp.dot(gmean, onehot.T, preferred_element_type=jnp.float32,
                     precision=hi)
    rstd_c = jnp.dot(jax.lax.rsqrt(gvar + eps), onehot.T,
                     preferred_element_type=jnp.float32,
                     precision=hi)  # (1, C)

    scale = g_ref[0] * rstd_c                      # (1, C) f32
    shift = b_ref[0] - mean_c * scale
    y = xf * scale + shift
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _supports_fused(x: Array) -> bool:
    if x.ndim < 2:
        return False
    c = x.shape[-1]
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    if c % 128 or n < 8:
        return False
    return _vmem_estimate(n, c, x.dtype.itemsize) <= _VMEM_BUDGET


def _compiler_params(interpret: bool):
    if interpret:
        return None  # interpreter mode ignores (and may reject) TPU params
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _fused_fwd(x: Array, gamma: Array, beta: Array, num_groups: int,
               eps: float, act: bool, interpret: bool = False) -> Array:
    from jax.experimental import pallas as pl

    b, c = x.shape[0], x.shape[-1]
    n = int(np_prod(x.shape[1:-1]))
    x3 = x.reshape(b, n, c)
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps, act=act,
                          n=n),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        compiler_params=_compiler_params(interpret),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * c,
            bytes_accessed=2 * b * n * c * x.dtype.itemsize,
            transcendentals=b * n * c if act else 0),
        interpret=interpret,
    )(x3, g2, b2)
    return out.reshape(x.shape)


def np_prod(shape) -> int:
    p = 1
    for d in shape:
        p *= int(d)
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x: Array, gamma: Array, beta: Array, num_groups: int, eps: float,
           act: bool) -> Array:
    return _fused_fwd(x, gamma, beta, num_groups, eps, act)


def _fused_vjp_fwd(x, gamma, beta, num_groups, eps, act):
    return _fused(x, gamma, beta, num_groups, eps, act), (x, gamma, beta)


def _fused_vjp_bwd(num_groups, eps, act, res, g):
    # Analytic GroupNorm(+SiLU) backward in plain jnp: XLA fuses these
    # reductions the same way it fuses its own autodiff of `_ref`, so the
    # training path is cost-neutral while the forward gets the fused kernel.
    x, gamma, beta = res
    b = x.shape[0]
    c = x.shape[-1]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, cg)
    n = xf.shape[1] * cg
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = ((xf - mean) * rstd).reshape(b, -1, c)
    gf = gamma.astype(jnp.float32)
    dy = g.astype(jnp.float32).reshape(b, -1, c)
    if act:
        y = xhat * gf + beta.astype(jnp.float32)
        sig = jax.nn.sigmoid(y)
        dy = dy * (sig * (1.0 + y * (1.0 - sig)))   # d silu(y)/dy
    dgamma = jnp.sum(dy * xhat, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(dy, axis=(0, 1)).astype(beta.dtype)
    dxhat = (dy * gf).reshape(b, -1, num_groups, cg)
    xhat4 = xhat.reshape(b, -1, num_groups, cg)
    m1 = jnp.mean(dxhat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dxhat * xhat4, axis=(1, 3), keepdims=True)
    del n
    dx = (dxhat - m1 - xhat4 * m2) * rstd
    return dx.reshape(x.shape).astype(x.dtype), dgamma, dbeta


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _fused_enabled() -> bool:
    """Default OFF since the jax-0.9 toolchain: perf_probe r4 measured the
    flagship denoiser at 31.6 ms/step with this kernel vs 28.85 ms/step on
    XLA's groupnorm path (batch 16, bf16) — 0.9's Mosaic VMEM accounting
    and XLA's improved norm fusion flipped the r2 win into a ~9% loss.
    Re-enable for experiments with LLT_FUSED_GROUPNORM=1."""
    import os

    return os.environ.get("LLT_FUSED_GROUPNORM", "0") == "1"


def group_norm(x: Array, gamma: Array, beta: Array, num_groups: int = 32,
               eps: float = 1e-6, act: bool = False,
               force_ref: bool = False) -> Array:
    """GroupNorm with f32 statistics, optionally fused with SiLU.

    Uses the VMEM-resident Pallas kernel on TPU when the shape qualifies
    (C % 128 == 0, block fits VMEM) AND the kernel is enabled (see
    ``_fused_enabled``); plain XLA otherwise / off-TPU.
    """
    if (not force_ref and _fused_enabled() and _supports_fused(x)
            and jax.default_backend() == "tpu"):
        return _fused(x, gamma, beta, num_groups, eps, act)
    return _ref(x, gamma, beta, num_groups, eps, act)


def group_norm_interpret(x: Array, gamma: Array, beta: Array,
                         num_groups: int = 32, eps: float = 1e-6,
                         act: bool = False) -> Array:
    """Interpreter-mode kernel path for CPU parity tests."""
    return _fused_fwd(x, gamma, beta, num_groups, eps, act, interpret=True)
