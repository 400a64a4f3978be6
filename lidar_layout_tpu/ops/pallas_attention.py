"""VMEM-resident self-attention kernel for the diffusion U-Net (Pallas/TPU).

Why this exists: ``jax.nn.dot_product_attention``'s XLA path materializes the
f32 logits tensor in HBM — at the flagship's full-res attention
(B=128, H=8, S=2048) that is a 16 GB round trip per layer, which measured out
at ~1.4% MFU for the 50-step DDIM sampler (BENCH r2 phase split). This kernel
keeps the whole softmax(QK^T)V block pipeline in VMEM.

Design (TPU-first):
  * **D-major layout**: blocks are carried as (D, S) — the last (lane) dim is
    the sequence, always a multiple of 128; the tiny head dim (32) sits in
    sublanes. No zero-padding of D to 128 lanes => no 4x wasted matmul FLOPs
    and no garbage-lane risk (CLAUDE.md: Mosaic blocks with last dim < 128).
  * **Chunked softmax, full-K**: K/V for one (batch, head) fit comfortably in
    VMEM (S<=2048, D<=64 => <=512 KB), so each grid step computes one
    (BQ, S) logits tile, softmaxes it in f32, and contracts with V — no
    online-softmax carry needed. Grid = (B*H, S/BQ); Mosaic skips the K/V
    re-DMA while the (bh) index is unchanged.
  * **Additive key bias**: an optional per-(batch, key) f32 bias row rides
    into the logits tile — this is how key-padding masks (PT-v3 serialized
    patches, ragged token sets) reach the fused path instead of falling back
    to the logits-materializing XLA masked attention.
  * **Fused backward**: dq/dk/dv are computed by a second VMEM-resident
    kernel that recomputes the softmax per q-block (no saved logits, no lse
    residual) and accumulates dk/dv across q-blocks in a revisited f32
    output block — the XLA vjp fallback materializes the f32 logits AND
    probability tensors in HBM (2x 4 GB at training batch 16, S=2048),
    which this removes. Off-TPU the vjp fallback remains.

Replaces the fused-attention role of the reference's flash-attn dependency
(SURVEY §2.8 ext) and feeds ``models/unet.AttnBlock`` / ``nn.attention`` /
``models/ptv3.PatchAttention``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _attend_ref(q: Array, k: Array, v: Array,
                kbias: Optional[Array] = None) -> Array:
    """Reference BHSD attention in plain jnp (f32 softmax).

    kbias: optional (B, S_k) f32 additive logit bias (e.g. -1e9 on padding).
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if kbias is not None:
        s = s + kbias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(q.dtype)


def _kernel(qt_ref, kt_ref, vt_ref, kb_ref, ot_ref):
    """One (bh, q-block) step: qt (1,D,BQ), kt/vt (1,D,S), kb (1,S) ->
    ot (1,D,BQ)."""
    qt = qt_ref[0]                     # (D, BQ) — already scaled by D^-0.5
    kt = kt_ref[0]                     # (D, S)
    # f32 data: multi-pass MXU (Mosaic default is 1-pass bf16, ~1e-2 err);
    # bf16 data: DEFAULT (fp32 contract precision is rejected on bf16)
    prec = (jax.lax.Precision.HIGHEST if qt.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # logits (BQ, S): contract the D (sublane) dim of both operands
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    s = s + kb_ref[0]                  # (1, S) broadcast over q rows
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # out^T (D, BQ) = V^T (D, S) @ P^T (S, BQ): contract S dims
    ot = jax.lax.dot_general(vt_ref[0], p.astype(vt_ref.dtype),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                            precision=prec)
    ot_ref[0] = ot.astype(ot_ref.dtype)


def _flash_fwd_tpu(q: Array, k: Array, v: Array,
                   kbias: Optional[Array] = None,
                   interpret: bool = False) -> Array:
    """(B,H,S,D) self-attention via the Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, d = q.shape
    # q-block: biggest divisor of S up to 512. Retuned under jax 0.9
    # (scripts/attn_block_sweep.py r4): S=2048 22.5/27.5/29.1 TF/s and
    # S=512 7.2/9.3/11.1 TF/s for bq 128/256/512 — bigger q-blocks win
    # at every shape that admits them (fewer grid steps re-reading K/V).
    # direct callers (e.g. attn_block_sweep) can bypass _supports_flash, so
    # guard here: a block with last dim < 128 hits the documented Mosaic
    # garbage-lane hazard (CLAUDE.md), and S not divisible by 128 has no
    # valid q-block at all
    assert s % 128 == 0, f"flash attention needs S % 128 == 0, got S={s}"
    bq = next((c for c in (512, 256, 128) if s % c == 0), 128)
    import os
    bq_env = int(os.environ.get("LLT_ATTN_BQ", "0"))  # retune experiments
    if bq_env >= 128 and bq_env % 128 == 0 and s % bq_env == 0:
        bq = bq_env
    scale = d ** -0.5
    # D-major: (BH, D, S)
    qt = (q * scale).reshape(b * h, s, d).swapaxes(1, 2)
    kt = k.reshape(b * h, s, d).swapaxes(1, 2)
    vt = v.reshape(b * h, s, d).swapaxes(1, 2)
    # (B, 1, S): Mosaic needs the sublane block dim to match the array
    kb = (jnp.zeros((b, 1, s), jnp.float32) if kbias is None
          else kbias.astype(jnp.float32)[:, None, :])

    grid = (b * h, s // bq)
    out_t = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, d, s), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, d, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(3 * b * h * s * d + b * h * s * d)
            * q.dtype.itemsize,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(qt, kt, vt, kb)
    return out_t.swapaxes(1, 2).reshape(b, h, s, d)


def _bwd_kernel(qt_ref, kt_ref, vt_ref, kb_ref, ot_ref, dot_ref,
                dqt_ref, dkt_ref, dvt_ref):
    """One (bh, q-block) backward step, D-major.

    qt (1,D,BQ) pre-scaled, kt/vt (1,D,S), kb (1,S), ot/dot (1,D,BQ) ->
    dqt (1,D,BQ) f32 (still in scaled-q units), dkt/dvt (1,D,S) f32
    accumulated across the j (q-block) grid dim.
    """
    from jax.experimental import pallas as pl

    qt = qt_ref[0]                     # (D, BQ)
    kt = kt_ref[0]                     # (D, S)
    # f32 data: multi-pass MXU (Mosaic default is 1-pass bf16, ~1e-2 err);
    # bf16 data: DEFAULT (fp32 contract precision is rejected on bf16)
    prec = (jax.lax.Precision.HIGHEST if qt.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    vt = vt_ref[0]
    ot = ot_ref[0]                     # (D, BQ)
    do = dot_ref[0]                    # (D, BQ)

    # recompute p = softmax(q k^T + kb) for this q-block (f32)
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)  # (BQ, S)
    s = s + kb_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # dp (BQ,S) = dO V^T ; delta (BQ,) = rowsum(dO * O) = rowsum(P * dP)
    dp = jax.lax.dot_general(do, vt, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                            precision=prec)
    delta = jnp.sum(do.astype(jnp.float32) * ot.astype(jnp.float32), axis=0)
    ds = p * (dp - delta[:, None])                     # (BQ, S) f32
    dsc = ds.astype(kt.dtype)
    pc = p.astype(vt.dtype)

    # dq^T (D,BQ) = K^T ds^T ; dk^T (D,S) = q^T ds ; dv^T (D,S) = dO^T p
    dqt_ref[0] = jax.lax.dot_general(
        kt, dsc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
                            precision=prec)
    dkt = jax.lax.dot_general(qt, dsc, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                            precision=prec)
    dvt = jax.lax.dot_general(do, pc, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                            precision=prec)

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dkt_ref[0] = dkt
        dvt_ref[0] = dvt

    @pl.when(j > 0)
    def _accum():
        dkt_ref[0] += dkt
        dvt_ref[0] += dvt


def _flash_bwd_tpu(q: Array, k: Array, v: Array, o: Array, do: Array,
                   kbias: Optional[Array] = None,
                   interpret: bool = False):
    """(B,H,S,D) self-attention backward via the Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, d = q.shape
    bq = 256 if s % 256 == 0 else 128
    scale = d ** -0.5

    def tilt(t):                       # (B,H,S,D) -> (BH, D, S)
        return t.reshape(b * h, s, d).swapaxes(1, 2)

    qt = tilt(q * scale)
    kb = (jnp.zeros((b, 1, s), jnp.float32) if kbias is None
          else kbias.astype(jnp.float32)[:, None, :])
    grid = (b * h, s // bq)
    blk_q = pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j))
    blk_s = pl.BlockSpec((1, d, s), lambda i, j: (i, 0, 0))
    blk_kb = pl.BlockSpec((1, 1, s), lambda i, j: (i // h, 0, 0))
    dqt, dkt, dvt = pl.pallas_call(
        _bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((b * h, d, s), jnp.float32)] * 3,
        grid=grid,
        in_specs=[blk_q, blk_s, blk_s, blk_kb, blk_q, blk_q],
        out_specs=[blk_q, blk_s, blk_s],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s * s * d,
            bytes_accessed=5 * b * h * s * d * q.dtype.itemsize
            + 3 * b * h * s * d * 4,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(qt, tilt(k), tilt(v), kb, tilt(o), tilt(do))

    def untilt(t):                     # (BH, D, S) -> (B,H,S,D)
        return t.swapaxes(1, 2).reshape(b, h, s, d)

    return ((untilt(dqt) * scale).astype(q.dtype),
            untilt(dkt).astype(k.dtype), untilt(dvt).astype(v.dtype))


@jax.custom_vjp
def _flash_core(q: Array, k: Array, v: Array, kbias: Array) -> Array:
    if jax.default_backend() == "tpu":
        return _flash_fwd_tpu(q, k, v, kbias)
    return _attend_ref(q, k, v, kbias)


def _core_fwd(q, k, v, kbias):
    out = _flash_core(q, k, v, kbias)
    return out, (q, k, v, kbias, out)


def _core_bwd(res, g):
    q, k, v, kbias, out = res
    if jax.default_backend() == "tpu":
        dq, dk, dv = _flash_bwd_tpu(q, k, v, out, g, kbias)
    else:
        _, vjp = jax.vjp(lambda a, b, c: _attend_ref(a, b, c, kbias), q, k, v)
        dq, dk, dv = vjp(g)
    # the key bias is a padding mask, never a learned quantity
    return dq, dk, dv, jnp.zeros_like(kbias)


_flash_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    kbias: Optional[Array] = None) -> Array:
    """Fused self-attention, (B, H, S, D) -> (B, H, S, D).

    kbias: optional (B, S) f32 additive key bias (key-padding masks).
    Constraints for the TPU kernel: S_q == S_kv, S % 128 == 0, D <= 128.
    Off-TPU (tests) it falls back to the reference jnp formula.
    """
    if kbias is None:
        kbias = jnp.zeros((q.shape[0], q.shape[-2]), jnp.float32)
    return _flash_core(q, k, v, kbias)


def _supports_flash(q: Array, k: Array) -> bool:
    """Gate on BSHD tensors: S in shape[-3], D in shape[-1].

    (Regression guard: callers must pass the UN-swapped BSHD q/k — gating on
    the BHSD-swapped views tests the heads axis against %128, which is never
    true, silently routing every model attention to the XLA fallback.)"""
    return (q.shape[-3] == k.shape[-3] and q.shape[-3] % 128 == 0
            and q.shape[-1] <= 128 and q.shape[-1] % 8 == 0)


def _key_padding_bias(mask, b: int, sk: int) -> Optional[Array]:
    """(B|1, 1, 1, S_k) boolean key-padding mask -> (B, S_k) additive bias;
    None for any other mask structure."""
    if mask is None or mask.ndim != 4:
        return None
    if mask.shape[1] != 1 or mask.shape[2] != 1 or mask.shape[3] != sk \
            or mask.shape[0] not in (1, b):
        return None
    m = jnp.broadcast_to(mask[:, 0, 0, :], (b, sk))
    return jnp.where(m, 0.0, -1e9).astype(jnp.float32)


def attend(q: Array, k: Array, v: Array, mask: Optional[Array] = None
           ) -> Array:
    """Drop-in for ``jax.nn.dot_product_attention`` with BSHD layout:
    routes self-attention-shaped inputs (incl. key-padding-masked ones)
    through the Pallas kernel on TPU, everything else (non-key-padding
    masks / cross-length / ragged-D) through XLA."""
    if _supports_flash(q, k):  # gate on BSHD: S at [-3], D at [-1]
        qh, kh, vh = (t.swapaxes(1, 2) for t in (q, k, v))
        if mask is None:
            return flash_attention(qh, kh, vh).swapaxes(1, 2)
        kb = _key_padding_bias(mask, qh.shape[0], kh.shape[-2])
        if kb is not None:
            return flash_attention(qh, kh, vh, kb).swapaxes(1, 2)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)
