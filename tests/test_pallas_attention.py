"""Pallas flash self-attention: kernel parity (interpret mode), gradient
equivalence via the custom VJP, and dispatch rules of ``attend``."""
import jax
import jax.numpy as jnp
import numpy as np

from lidar_layout_tpu.ops.pallas_attention import (_attend_ref,
                                                   _flash_bwd_tpu,
                                                   _flash_fwd_tpu, attend,
                                                   flash_attention)


def _qkv(b, h, s, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
    return mk(), mk(), mk()


def test_kernel_parity_interpret_mode():
    # 384 = divisible by 128 but not 256 (regression: tail query block)
    for shape in [(2, 4, 256, 32), (1, 8, 128, 32), (2, 2, 512, 64),
                  (1, 2, 384, 32)]:
        q, k, v = _qkv(*shape, seed=shape[2])
        ref = _attend_ref(q, k, v)
        out = _flash_fwd_tpu(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_flash_attention_grads_match_reference():
    q, k, v = _qkv(1, 2, 128, 32, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_attend_ref(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_bwd_kernel_parity_interpret_mode():
    """Pallas backward kernel == jax.vjp of the reference formula,
    including the dk/dv accumulation across >1 query blocks."""
    for shape in [(1, 2, 128, 32), (2, 2, 256, 32), (1, 1, 384, 64)]:
        q, k, v = _qkv(*shape, seed=11 + shape[2])
        rng = np.random.default_rng(5)
        out, vjp = jax.vjp(_attend_ref, q, k, v)
        g = jnp.asarray(rng.normal(size=out.shape), out.dtype)
        ref = vjp(g)
        got = _flash_bwd_tpu(q, k, v, out, g, interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)


def test_key_bias_kernel_parity_interpret_mode():
    """kbias (key-padding) path: fwd and bwd kernels == XLA masked attention
    and its vjp."""
    b, h, s, d = 2, 2, 256, 32
    q, k, v = _qkv(b, h, s, d, seed=21)
    rng = np.random.default_rng(6)
    valid = jnp.asarray(rng.uniform(size=(b, s)) > 0.25)
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    ref = _attend_ref(q, k, v, kb)
    xla = jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        mask=valid[:, None, None, :]).swapaxes(1, 2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(xla),
                               atol=2e-5, rtol=2e-5)
    out = _flash_fwd_tpu(q, k, v, kbias=kb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    o, vjp = jax.vjp(lambda a, b_, c: _attend_ref(a, b_, c, kb), q, k, v)
    g = jnp.asarray(rng.normal(size=o.shape), o.dtype)
    refg = vjp(g)
    gotg = _flash_bwd_tpu(q, k, v, o, g, kbias=kb, interpret=True)
    for a, b_ in zip(gotg, refg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_attend_key_padding_mask_routes_and_matches():
    """attend() with a (B,1,1,S) key-padding mask matches XLA's masked
    attention (CPU: both reduce to the reference math)."""
    b, s, h, d = 2, 128, 4, 32
    rng = np.random.default_rng(9)
    mk = lambda: jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(rng.uniform(size=(b, 1, 1, s)) > 0.3)
    np.testing.assert_allclose(
        np.asarray(attend(q, k, v, mask=mask)),
        np.asarray(jax.nn.dot_product_attention(q, k, v, mask=mask)),
        atol=2e-5, rtol=2e-5)


def test_attend_matches_xla_bshd():
    """attend() (BSHD) equals jax.nn.dot_product_attention on eligible
    shapes (on CPU both route through XLA math, exercising the dispatch)."""
    b, s, h, d = 2, 256, 4, 32
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    out = attend(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attend_dispatch_fallbacks():
    """masked / cross-length / odd-seq inputs use the XLA path unchanged."""
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 100, 4, 32  # s % 128 != 0 -> fallback
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(attend(q, k, v)),
        np.asarray(jax.nn.dot_product_attention(q, k, v)), atol=1e-6)

    # cross-attention (different kv length)
    k2 = jnp.asarray(rng.normal(size=(b, 13, h, d)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(b, 13, h, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(attend(q, k2, v2)),
        np.asarray(jax.nn.dot_product_attention(q, k2, v2)), atol=1e-6)

    # masked
    s = 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, 1, 1, s)) > 0.3)
    np.testing.assert_allclose(
        np.asarray(attend(q, k3, v3, mask=mask)),
        np.asarray(jax.nn.dot_product_attention(q, k3, v3, mask=mask)),
        atol=1e-6)


def test_unet_attention_block_still_correct():
    """SelfAttentionBlock output is finite and shape-stable through the new
    dispatch (CPU path)."""
    from lidar_layout_tpu.models.unet import SelfAttentionBlock

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 32, 64)),
                    jnp.float32)
    blk = SelfAttentionBlock(num_heads=2)
    params = blk.init(jax.random.key(0), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_supports_flash_gates_on_bshd_model_shapes():
    """The gate must accept the models' actual BSHD shapes (S%128==0, small
    heads) and attend must consult it BEFORE the BHSD swap (regression:
    gating on the swapped views tested the heads axis against %128, which is
    never true, silently sending all model attention to the XLA fallback)."""
    from lidar_layout_tpu.ops.pallas_attention import _supports_flash

    # flagship U-Net full-res self-attention: B=16, S=2048, H=8, D=32 (BSHD)
    q = jnp.zeros((16, 2048, 8, 32))
    assert _supports_flash(q, q)
    # PT-v3 patch attention: S=1024 patches
    q = jnp.zeros((4, 1024, 6, 32))
    assert _supports_flash(q, q)
    # the swapped (BHSD) views must NOT pass — that was the bug
    assert not _supports_flash(q.swapaxes(1, 2), q.swapaxes(1, 2))


def test_attend_routes_model_shapes_to_kernel(monkeypatch):
    """attend() must call the fused path for kernel-eligible BSHD inputs."""
    from lidar_layout_tpu.ops import pallas_attention as pa

    calls = {"flash": 0}
    real = pa.flash_attention

    def spy(q, k, v, kbias=None):
        calls["flash"] += 1
        return real(q, k, v, kbias)

    monkeypatch.setattr(pa, "flash_attention", spy)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 256, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 256, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 256, 4, 32)), jnp.float32)
    out = pa.attend(q, k, v)
    assert calls["flash"] == 1
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.dot_product_attention(q, k, v)),
        atol=2e-6)
