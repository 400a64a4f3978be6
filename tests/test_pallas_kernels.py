"""Pallas kernel equivalence tests (interpret mode on CPU), in the style of the
reference's pointops2 kernel-vs-reference scripts (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.ops.chamfer import chamfer_distance
from lidar_layout_tpu.ops.pallas_chamfer import chamfer_pallas, nn_dist_pallas


class TestPallasChamfer:
    def test_matches_xla_version(self, rng):
        x = jnp.asarray(rng.standard_normal((700, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((900, 3)), jnp.float32)
        ref_x, ref_y = chamfer_distance(x, y)
        got_x, got_y = chamfer_pallas(x, y, interpret=True)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                                   rtol=1e-4, atol=1e-4)

    def test_mask_semantics(self, rng):
        x = jnp.asarray(rng.standard_normal((100, 3)), jnp.float32)
        y = jnp.concatenate([x, jnp.full((40, 3), 50.0)], axis=0)
        ym = jnp.concatenate([jnp.ones(100, bool), jnp.zeros(40, bool)])
        d = nn_dist_pallas(x, y, ym, interpret=True)
        assert float(jnp.max(d)) < 1e-6  # masked far block never wins

    def test_non_tile_multiple_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((13, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((77, 3)), jnp.float32)
        ref_x, _ = chamfer_distance(x, y)
        got = nn_dist_pallas(x, y, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_x),
                                   rtol=1e-4, atol=1e-4)
