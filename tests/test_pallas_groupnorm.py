"""Fused GroupNorm(+SiLU) kernel parity (ops/pallas_groupnorm).

The Pallas kernel runs in interpreter mode on CPU; `_ref` is the semantic
spec (identical math to the previous flax nn.GroupNorm f32 path). The vjp
is checked against jax.grad of the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.ops.pallas_groupnorm import (_fused_vjp_bwd, _ref,
                                                   _supports_fused,
                                                   group_norm,
                                                   group_norm_interpret)


def _rand(shape, dtype, seed=0):
    return jax.random.normal(jax.random.key(seed), shape, jnp.float32).astype(
        dtype) * 2.0 + 0.3


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 128, 256), 32),   # U-Net full-res block
    ((3, 4, 16, 512), 32),     # ds=2 block
    ((2, 128, 1024), 32),      # 3D (B, N, C) layout
    ((2, 8, 8, 128), 32),      # minimum lane-aligned C
])
@pytest.mark.parametrize("act", [False, True])
def test_kernel_matches_ref(shape, groups, act):
    x = _rand(shape, jnp.bfloat16)
    c = shape[-1]
    gamma = _rand((c,), jnp.float32, 1) * 0.1 + 1.0
    beta = _rand((c,), jnp.float32, 2) * 0.1
    want = _ref(x, gamma, beta, groups, 1e-6, act)
    got = group_norm_interpret(x, gamma, beta, groups, 1e-6, act)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_kernel_matches_ref_f32_tight():
    x = _rand((2, 8, 64, 256), jnp.float32)
    gamma = _rand((256,), jnp.float32, 1)
    beta = _rand((256,), jnp.float32, 2)
    want = _ref(x, gamma, beta, 32, 1e-6, True)
    got = group_norm_interpret(x, gamma, beta, 32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("act", [False, True])
def test_vjp_matches_autodiff(act):
    x = _rand((2, 4, 8, 128), jnp.float32)
    gamma = _rand((128,), jnp.float32, 1)
    beta = _rand((128,), jnp.float32, 2)
    g = _rand(x.shape, jnp.float32, 3)

    def ref_loss(x, gamma, beta):
        return jnp.sum(_ref(x, gamma, beta, 32, 1e-6, act) * g)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(x, gamma, beta)
    got = _fused_vjp_bwd(32, 1e-6, act, (x, gamma, beta), g)
    for w, o in zip(want, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_supports_fused_gate():
    assert _supports_fused(jnp.zeros((2, 16, 128, 256), jnp.bfloat16))
    # C not lane-aligned -> XLA fallback
    assert not _supports_fused(jnp.zeros((2, 16, 128, 64), jnp.bfloat16))
    # block too large for VMEM -> fallback (65536x256 f32 ~ 600 MB estimate)
    assert not _supports_fused(jnp.zeros((1, 64, 1024, 256), jnp.float32))
    # dtype-aware boundary under the raised 64 MB scoped-vmem limit
    # (jax 0.9 Mosaic charges ~25 B/elem for a bf16 block — see _VMEM_LIMIT):
    # full-res out-block norms fit in both dtypes now (28 MB f32 / 22 MB bf16
    # estimates), while a 2048x2048 bf16 block (117 MB estimate) falls back.
    assert _supports_fused(jnp.zeros((125, 16, 128, 384), jnp.float32))
    assert _supports_fused(jnp.zeros((125, 16, 128, 384), jnp.bfloat16))
    assert not _supports_fused(jnp.zeros((8, 16, 128, 2048), jnp.bfloat16))


def test_group_norm_fallback_matches_old_normalize():
    """Off-TPU group_norm must reproduce the previous flax GroupNorm path."""
    import flax.linen as nn

    x = _rand((2, 8, 16, 96), jnp.bfloat16)  # C=96: 32 groups, non-aligned
    gamma = _rand((96,), jnp.float32, 1)
    beta = _rand((96,), jnp.float32, 2)
    got = group_norm(x, gamma, beta, num_groups=32, eps=1e-6, act=False)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    want = gn.apply({"params": {"scale": gamma, "bias": beta}},
                    x.astype(jnp.float32)).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_normalize_module_param_paths_unchanged():
    """Normalize keeps the GroupNorm_0/{scale,bias} tree (torch_convert keys)."""
    from lidar_layout_tpu.nn.blocks import Normalize

    m = Normalize(act=True)
    v = m.init(jax.random.key(0), jnp.zeros((1, 4, 8, 256)))
    assert set(v["params"].keys()) == {"GroupNorm_0"}
    assert set(v["params"]["GroupNorm_0"].keys()) == {"scale", "bias"}
    assert v["params"]["GroupNorm_0"]["scale"].shape == (256,)


def test_near_constant_large_mean_block_stays_finite():
    """E[x^2]-E[x]^2 cancellation on a near-constant large-mean block must
    not produce NaN via rsqrt of a negative variance."""
    x = (jnp.full((1, 8, 16, 128), 200.0, jnp.float32)
         + jax.random.normal(jax.random.key(0), (1, 8, 16, 128)) * 1e-3)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    got = group_norm_interpret(x, gamma, beta, 32, 1e-6, True)
    assert np.isfinite(np.asarray(got)).all()
