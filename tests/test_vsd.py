"""Point-splat depth render + VSD metric tests (all units mm)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.eval.render import depth_to_dist, render_depth
from pyrapose_tpu.eval.metrics import visibility_mask, vsd_metric

CAM = jnp.asarray([100.0, 100.0, 32.0, 24.0])
SHAPE = (48, 64)
EYE = jnp.eye(3)


def _plane_points(z=1000.0, half=100.0, n=40):
    """Dense planar grid facing the camera at depth z (mm)."""
    g = np.linspace(-half, half, n)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(n * n)], axis=1)
    return jnp.asarray(pts, jnp.float32), jnp.asarray([0.0, 0.0, z], jnp.float32)


class TestRenderDepth:
    def test_single_point(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0]])
        depth = np.asarray(render_depth(pts, EYE, jnp.asarray([0.0, 0.0, 500.0]), CAM, SHAPE))
        assert depth[24, 32] == pytest.approx(500.0)
        assert (depth > 0).sum() == 1

    def test_nearest_wins(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -100.0]])
        depth = np.asarray(render_depth(pts, EYE, jnp.asarray([0.0, 0.0, 500.0]), CAM, SHAPE))
        # both project to the center; nearest (400) wins over 500
        assert depth[24, 32] == pytest.approx(400.0)

    def test_behind_camera_and_oob_dropped(self):
        pts = jnp.asarray([[0.0, 0.0, -2000.0], [1e6, 0.0, 0.0]])
        depth = np.asarray(render_depth(pts, EYE, jnp.asarray([0.0, 0.0, 500.0]), CAM, SHAPE))
        assert (depth == 0).all()

    def test_plane_fills_region(self):
        pts, t = _plane_points()
        depth = np.asarray(render_depth(pts, EYE, t, CAM, SHAPE))
        # 100mm half-extent at 1000mm with f=100 -> +-10px around center
        assert depth[24, 32] == pytest.approx(1000.0)
        assert depth[24 - 9, 32 - 9] > 0
        assert depth[0, 0] == 0


class TestDepthToDist:
    def test_center_pixel_equals_depth(self):
        depth = jnp.zeros(SHAPE).at[24, 32].set(700.0)
        dist = np.asarray(depth_to_dist(depth, CAM))
        assert dist[24, 32] == pytest.approx(700.0)

    def test_off_center_longer(self):
        depth = jnp.full(SHAPE, 700.0)
        dist = np.asarray(depth_to_dist(depth, CAM))
        assert dist[0, 0] > 700.0
        # exact: ray through pixel (0,0): x=(0-32)/100*700, y=(0-24)/100*700
        expect = np.sqrt((0.32 * 700) ** 2 + (0.24 * 700) ** 2 + 700.0**2)
        assert dist[0, 0] == pytest.approx(expect, rel=1e-6)


class TestVisibility:
    def test_occluded_not_visible(self):
        d_test = jnp.full(SHAPE, 500.0)  # scene surface at 500
        d_model = jnp.full(SHAPE, 600.0)  # model 100 behind
        vis = np.asarray(visibility_mask(d_test, d_model, 15.0))
        assert not vis.any()
        vis2 = np.asarray(visibility_mask(d_test, d_model, 150.0))
        assert vis2.all()


class TestVsd:
    def test_perfect_pose_zero(self):
        pts, t = _plane_points()
        depth_test = render_depth(pts, EYE, t, CAM, SHAPE)
        e = float(vsd_metric(EYE, t, EYE, t, pts, depth_test, CAM, 15.0, 20.0))
        assert e == pytest.approx(0.0)

    def test_small_shift_within_tau(self):
        pts, t = _plane_points()
        depth_test = render_depth(pts, EYE, t, CAM, SHAPE)
        t_est = t + jnp.asarray([0.0, 0.0, 10.0])  # 10mm < tau=20mm
        e = float(vsd_metric(EYE, t_est, EYE, t, pts, depth_test, CAM, 15.0, 20.0))
        assert e < 0.1

    def test_large_shift_fails(self):
        pts, t = _plane_points()
        depth_test = render_depth(pts, EYE, t, CAM, SHAPE)
        t_est = t + jnp.asarray([0.0, 0.0, 300.0])
        e = float(vsd_metric(EYE, t_est, EYE, t, pts, depth_test, CAM, 15.0, 20.0))
        assert e > 0.9

    def test_tlinear_between(self):
        pts, t = _plane_points()
        depth_test = render_depth(pts, EYE, t, CAM, SHAPE)
        t_est = t + jnp.asarray([0.0, 0.0, 10.0])
        e_lin = float(
            vsd_metric(EYE, t_est, EYE, t, pts, depth_test, CAM, 15.0, 20.0, "tlinear")
        )
        assert 0.2 < e_lin < 0.8  # ~10/20 truncated-linear cost

    def test_no_visible_surface_is_one(self):
        pts, t = _plane_points()
        depth_test = jnp.zeros(SHAPE)  # empty scene: nothing visible
        e = float(vsd_metric(EYE, t, EYE, t, pts, depth_test, CAM, 15.0, 20.0))
        assert e == pytest.approx(1.0)

    def test_unknown_cost_raises(self):
        pts, t = _plane_points()
        with pytest.raises(ValueError):
            vsd_metric(EYE, t, EYE, t, pts, jnp.zeros(SHAPE), CAM, 15.0, 20.0, "nope")
