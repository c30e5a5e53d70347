import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pyrapose_tpu.geometry import (
    anchors_for_shape,
    axis_angle_to_matrix,
    decode_box3d,
    encode_box3d,
    euler_to_matrix,
    matrix_to_quat,
    pairwise_iou,
    project_points,
    quat_to_matrix,
    transform_points,
)
from pyrapose_tpu.geometry.projection import project_box3d


class TestIoU:
    def test_golden_values(self):
        boxes = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
        query = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20]], jnp.float32)
        iou = np.asarray(pairwise_iou(boxes, query))
        # identical boxes -> 1
        assert iou[0, 0] == pytest.approx(1.0)
        # disjoint (touching at corner) -> 0
        assert iou[0, 1] == pytest.approx(0.0)
        # [5,5,15,15] vs [0,0,10,10]: inter 25, union 175
        assert iou[1, 0] == pytest.approx(25 / 175)
        # [5,5,15,15] vs [10,10,20,20]: inter 25, union 175
        assert iou[1, 1] == pytest.approx(25 / 175)

    def test_degenerate_boxes(self):
        boxes = jnp.array([[5, 5, 5, 5]], jnp.float32)  # zero area
        query = jnp.array([[0, 0, 10, 10]], jnp.float32)
        iou = np.asarray(pairwise_iou(boxes, query))
        assert iou[0, 0] == pytest.approx(0.0)

    def test_matches_numpy_reference(self, rng):
        """Cross-check against an O(NK) numpy loop (the Cython kernel's math)."""
        boxes = rng.uniform(0, 100, (50, 4))
        boxes[:, 2:] += boxes[:, :2]
        query = rng.uniform(0, 100, (7, 4))
        query[:, 2:] += query[:, :2]
        expected = np.zeros((50, 7))
        for n in range(50):
            for k in range(7):
                iw = min(boxes[n, 2], query[k, 2]) - max(boxes[n, 0], query[k, 0])
                ih = min(boxes[n, 3], query[k, 3]) - max(boxes[n, 1], query[k, 1])
                if iw > 0 and ih > 0:
                    ua = (
                        (boxes[n, 2] - boxes[n, 0]) * (boxes[n, 3] - boxes[n, 1])
                        + (query[k, 2] - query[k, 0]) * (query[k, 3] - query[k, 1])
                        - iw * ih
                    )
                    expected[n, k] = iw * ih / ua
        got = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(query)))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


class TestBox3D:
    def test_golden_encode(self):
        # anchor (10, 20, 30, 60): w=20, h=40; corner0 at (12, 24):
        # tx0 = (12-10)/20/0.2 = 0.5 ; ty0 = (24-20)/40/0.2 = 0.5
        # corner1 (odd) refs (x2, y2)=(30, 60); at (34, 52):
        # tx1 = (34-30)/20/0.2 = 1.0 ; ty1 = (52-60)/40/0.2 = -1.0
        anchors = jnp.array([[10.0, 20.0, 30.0, 60.0]])
        corners = jnp.zeros((1, 16)).at[0, :4].set(jnp.array([12.0, 24.0, 34.0, 52.0]))
        t = np.asarray(encode_box3d(anchors, corners))
        assert t[0, 0] == pytest.approx(0.5)
        assert t[0, 1] == pytest.approx(0.5)
        assert t[0, 2] == pytest.approx(1.0)
        assert t[0, 3] == pytest.approx(-1.0)
        # corner 2 (even) refs (x1, y1) again: value 0 -> (0-10)/20/0.2 = -2.5
        assert t[0, 4] == pytest.approx(-2.5)

    def test_roundtrip(self, rng):
        anchors = jnp.asarray(anchors_for_shape((480, 640))[::1000])
        n = anchors.shape[0]
        corners = jnp.asarray(rng.uniform(-50, 700, (n, 16)).astype(np.float32))
        deltas = encode_box3d(anchors, corners)
        rec = decode_box3d(anchors, deltas)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(corners), rtol=1e-4, atol=1e-2)

    def test_batched_shapes(self, rng):
        anchors = jnp.asarray(rng.uniform(0, 100, (2, 5, 4)).astype(np.float32))
        anchors = anchors.at[..., 2:].add(100.0)
        corners = jnp.asarray(rng.uniform(0, 100, (2, 5, 16)).astype(np.float32))
        d = encode_box3d(anchors, corners)
        assert d.shape == (2, 5, 16)
        rec = decode_box3d(anchors, d)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(corners), rtol=1e-4, atol=1e-2)


class TestRotation:
    def test_quat_vs_scipy(self, rng):
        q_wxyz = rng.normal(size=(32, 4))
        q_wxyz /= np.linalg.norm(q_wxyz, axis=1, keepdims=True)
        got = np.asarray(quat_to_matrix(jnp.asarray(q_wxyz)))
        expected = ScipyRot.from_quat(q_wxyz[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        q = rng.normal(size=(64, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1  # canonical sign
        r = quat_to_matrix(jnp.asarray(q))
        q2 = np.asarray(matrix_to_quat(r))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_euler_sxyz_vs_scipy(self, rng):
        e = rng.uniform(-np.pi, np.pi, (16, 3))
        got = np.asarray(euler_to_matrix(jnp.asarray(e)))
        expected = ScipyRot.from_euler("xyz", e).as_matrix()
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_axis_angle_vs_scipy(self, rng):
        rv = rng.normal(size=(16, 3))
        got = np.asarray(axis_angle_to_matrix(jnp.asarray(rv)))
        expected = ScipyRot.from_rotvec(rv).as_matrix()
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_axis_angle_small_angle(self):
        rv = jnp.array([[0.0, 0.0, 0.0], [1e-9, 0.0, 0.0]])
        got = np.asarray(axis_angle_to_matrix(rv))
        np.testing.assert_allclose(got[0], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(got[1], np.eye(3), atol=1e-6)


class TestProjection:
    def test_project_golden(self):
        # Point at (0.1, -0.2, 1.0) m with LineMOD intrinsics
        # (reference linemod_eval.py:35-38)
        cam = jnp.array([572.4114, 573.57043, 325.2611, 242.04899])
        pts = jnp.array([[[0.1, -0.2, 1.0]]])
        pix = np.asarray(project_points(pts, cam))
        assert pix[0, 0, 0] == pytest.approx(0.1 * 572.4114 + 325.2611)
        assert pix[0, 0, 1] == pytest.approx(-0.2 * 573.57043 + 242.04899)

    def test_transform_then_project(self, rng):
        rot = ScipyRot.random(5, random_state=0).as_matrix()
        t = rng.uniform(-0.1, 0.1, (5, 3)) + np.array([0, 0, 1.0])
        pts = rng.uniform(-0.05, 0.05, (5, 8, 3))
        cam = np.array([600.0, 600.0, 320.0, 240.0])
        out = transform_points(jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(t))
        expected = np.einsum("bij,bnj->bni", rot, pts) + t[:, None]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
        flat = project_box3d(
            jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(t), jnp.asarray(cam)
        )
        assert flat.shape == (5, 16)
        ex_pix_x = expected[..., 0] * 600 / expected[..., 2] + 320
        np.testing.assert_allclose(np.asarray(flat[:, 0::2]), ex_pix_x, rtol=1e-5)
