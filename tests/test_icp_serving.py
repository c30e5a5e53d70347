"""ICP refinement and serving-engine tests (small shapes, CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import LINEMOD_SPEC
from pyrapose_tpu.pose.icp import (
    depth_to_points,
    estimate_normals_host,
    icp_point_to_plane,
)


def _cube_surface(n=6, half=0.05):
    """Points + outward normals on a cube surface."""
    g = np.linspace(-half, half, n)
    pts, nrm = [], []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uu, vv = np.meshgrid(g, g)
            face = np.zeros((n * n, 3))
            face[:, axis] = sign * half
            other = [a for a in range(3) if a != axis]
            face[:, other[0]] = uu.ravel()
            face[:, other[1]] = vv.ravel()
            normal = np.zeros(3)
            normal[axis] = sign
            pts.append(face)
            nrm.append(np.tile(normal, (n * n, 1)))
    return np.concatenate(pts).astype(np.float32), np.concatenate(nrm).astype(np.float32)


class TestDepthToPoints:
    def test_center_ray(self):
        cam = jnp.asarray([100.0, 100.0, 16.0, 12.0])
        depth = jnp.zeros((24, 32)).at[12, 16].set(0.8)
        pts, valid = depth_to_points(depth, cam)
        assert valid.sum() == 1
        idx = int(jnp.argmax(valid))
        np.testing.assert_allclose(np.asarray(pts[idx]), [0, 0, 0.8], atol=1e-6)

    def test_stride(self):
        cam = jnp.asarray([100.0, 100.0, 16.0, 12.0])
        depth = jnp.full((24, 32), 1.0)
        pts, valid = depth_to_points(depth, cam, stride=4)
        assert pts.shape == (6 * 8, 3)
        assert bool(valid.all())


class TestIcp:
    def test_recovers_small_offset(self):
        mp, mn = _cube_surface(8)
        true_rot = np.eye(3, dtype=np.float32)
        true_trans = np.array([0.02, -0.01, 0.8], np.float32)
        scene = mp @ true_rot.T + true_trans
        # start 8 mm off in z, 4 mm in x
        rot0 = jnp.eye(3)
        trans0 = jnp.asarray(true_trans + np.array([0.004, 0, -0.008], np.float32))
        rot, trans, rmse = icp_point_to_plane(
            rot0, trans0, jnp.asarray(mp), jnp.asarray(mn),
            jnp.asarray(scene), jnp.ones(len(scene), bool),
            iterations=15, max_corr_dist=0.03,
        )
        np.testing.assert_allclose(np.asarray(trans), true_trans, atol=1e-3)
        assert float(rmse) < 1e-3

    def test_no_valid_scene_is_stable(self):
        mp, mn = _cube_surface(4)
        rot0 = jnp.eye(3)
        trans0 = jnp.asarray([0.0, 0.0, 0.8])
        rot, trans, rmse = icp_point_to_plane(
            rot0, trans0, jnp.asarray(mp), jnp.asarray(mn),
            jnp.zeros((10, 3)), jnp.zeros(10, bool), iterations=3,
        )
        np.testing.assert_allclose(np.asarray(trans), [0, 0, 0.8], atol=1e-6)
        assert np.all(np.isfinite(np.asarray(rot)))

    def test_normal_estimation_plane(self):
        g = np.linspace(0, 1, 5)
        xx, yy = np.meshgrid(g, g)
        pts = np.stack([xx.ravel(), yy.ravel(), np.zeros(25)], axis=1)
        n = estimate_normals_host(pts, k=4)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
        assert np.all(n[:, 2] <= 0)  # oriented toward -z


class TestServingEngine:
    def test_estimate_shapes_and_gates(self):
        from pyrapose_tpu.models import ModelConfig
        from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig

        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(64, 64))
        mc = ModelConfig(num_classes=spec.num_classes, backbone="resnet10")
        import jax

        from pyrapose_tpu.models import PyraPose

        model = PyraPose(config=mc)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        est = PoseEstimator(
            spec, variables, ServingConfig(score_threshold=0.99), model_config=mc
        )
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        results = est.estimate(img)
        # untrained net + 0.99 threshold: no detections, but a clean run
        assert isinstance(results, list)
        for r in results:
            assert r["mask"].shape == (64, 64)
            assert r["rot"].shape == (3, 3)
