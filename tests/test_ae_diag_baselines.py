"""Executable form of ae_diag's CPU-simulation baselines (VERDICT r3 #8).

The r3 AE diagnosis (scripts/ae_diag.py:16-21) rests on a CPU simulation that
was recorded only as prose: on the synthetic-scene distribution, BEV JSD is
*saturated* by tiny iid depth noise (indistinguishable from the seed floor),
while edge blur across depth discontinuities — the range-image signature of
flying pixels — pushes JSD clearly ABOVE the floor and does not average out.
That asymmetry is what justified hunting flying pixels instead of iid blur.

This test re-runs the simulation so the lesson is asserted, not remembered:
    JSD(iid noise)  ~ JSD(clean heldout)   (within tolerance)
    JSD(edge blur)  > JSD(clean heldout) + margin
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_layout_tpu.data.device_synthetic import host_range2pcd
from lidar_layout_tpu.data.synthetic import synthetic_scene
from lidar_layout_tpu.eval.metrics import compute_jsd
from lidar_layout_tpu.ops import lidar as L

GEOM = L.KITTI_GEOMETRY
N_CLOUDS = 48
N_POINTS = 60_000


def _model_images(seed):
    """Model-space range images of synthetic scenes (host->device->host)."""
    rng = np.random.default_rng(seed)
    project = jax.jit(lambda p: L.process_scan(L.pcd2range(p, GEOM)[0], GEOM))
    imgs = []
    for _ in range(N_CLOUDS):
        pts = jnp.asarray(synthetic_scene(rng, N_POINTS))
        img, _ = project(pts)
        imgs.append(np.asarray(img))
    return np.stack(imgs)


def _clouds(imgs):
    return [host_range2pcd(im, GEOM) for im in imgs]


def _edge_blur(imgs):
    """Horizontal 3-tap blur: interpolates across depth discontinuities,
    synthesizing mid-depth 'flying pixels' at object boundaries while barely
    moving smooth regions."""
    left = np.roll(imgs, 1, axis=-1)
    right = np.roll(imgs, -1, axis=-1)
    return 0.25 * left + 0.5 * imgs + 0.25 * right


class TestFlyingPixelLesson:
    @pytest.fixture(scope="class")
    def jsds(self):
        ref = _clouds(_model_images(0))
        heldout_imgs = _model_images(1)
        rng = np.random.default_rng(2)
        iid_imgs = heldout_imgs + rng.normal(
            0.0, 0.005, heldout_imgs.shape).astype(np.float32)
        blur_imgs = _edge_blur(heldout_imgs)
        return {
            "floor": compute_jsd(ref, _clouds(heldout_imgs)),
            "iid": compute_jsd(ref, _clouds(iid_imgs)),
            "edge": compute_jsd(ref, _clouds(blur_imgs)),
        }

    def test_iid_noise_saturates_at_the_floor(self, jsds):
        # sigma=0.005 iid noise is invisible to BEV JSD (r3: 0.41 vs floor 0.43)
        assert abs(jsds["iid"] - jsds["floor"]) < 0.05, jsds

    def test_edge_blur_exceeds_the_floor(self, jsds):
        # flying-pixel-style structural error IS visible (r3: 0.49-0.52 vs 0.43)
        assert jsds["edge"] > jsds["floor"] + 0.02, jsds

    def test_structural_error_dominates_iid(self, jsds):
        assert jsds["edge"] > jsds["iid"] + 0.02, jsds
