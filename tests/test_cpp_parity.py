"""JAX kernels vs standalone C++ reference implementations.

The reference repo's native components (Cython IoU, Ceres uncertainty-PnP)
are rebuilt as JAX programs; these tests pin them against independent C++
implementations (cpp/parity_kernels.cpp) built with g++ at test time.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pyrapose_tpu.geometry import pairwise_iou
from pyrapose_tpu.pose import (
    refine_pose,
    refine_pose_cov,
    scalar_weights_from_covariance,
)
from pyrapose_tpu.utils.cpp_parity import cpp_gn_refine, cpp_gn_refine_cov, cpp_iou

CAM = np.array([572.4114, 573.57043, 325.2611, 242.04899])


def test_iou_matches_cpp(rng):
    boxes = rng.uniform(0, 400, (300, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2] * 0 + rng.uniform(1, 100, (300, 2))
    query = rng.uniform(0, 400, (20, 4)).astype(np.float32)
    query[:, 2:] = query[:, :2] + rng.uniform(1, 100, (20, 2))
    expected = cpp_iou(boxes, query)
    got = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(query)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_gn_refine_matches_cpp(rng):
    pts3d = rng.uniform(-0.08, 0.08, (24, 3))
    rot_gt = ScipyRot.random(random_state=5).as_matrix()
    t_gt = np.array([0.02, -0.03, 0.9])
    pc = pts3d @ rot_gt.T + t_gt
    pts2d = np.stack(
        [pc[:, 0] * CAM[0] / pc[:, 2] + CAM[2], pc[:, 1] * CAM[1] / pc[:, 2] + CAM[3]],
        axis=1,
    ) + rng.normal(0, 0.3, (24, 2))
    w = rng.uniform(0.3, 1.0, 24)

    rot0 = ScipyRot.from_rotvec([0.05, -0.04, 0.03]).as_matrix() @ rot_gt
    t0 = t_gt + np.array([0.01, 0.005, -0.02])

    r_cpp, t_cpp = cpp_gn_refine(rot0, t0, pts2d, pts3d, w, CAM, iterations=5)
    r_jax, t_jax = refine_pose(
        jnp.asarray(rot0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(w, jnp.float32), jnp.asarray(CAM, jnp.float32), iterations=5,
    )
    # f32 JAX vs f64 C++: agreement to ~1e-3 after identical iteration counts
    np.testing.assert_allclose(np.asarray(r_jax), r_cpp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_jax), t_cpp, atol=2e-3)
    # both should land near ground truth
    assert np.degrees(ScipyRot.from_matrix(r_cpp @ rot_gt.T).magnitude()) < 0.5
    assert np.linalg.norm(t_cpp - t_gt) < 0.005


def _cov_problem(rng, n=24):
    pts3d = rng.uniform(-0.08, 0.08, (n, 3))
    rot_gt = ScipyRot.random(random_state=11).as_matrix()
    t_gt = np.array([-0.01, 0.04, 0.85])
    pc = pts3d @ rot_gt.T + t_gt
    pts2d = np.stack(
        [pc[:, 0] * CAM[0] / pc[:, 2] + CAM[2], pc[:, 1] * CAM[1] / pc[:, 2] + CAM[3]],
        axis=1,
    ) + rng.normal(0, 0.3, (n, 2))
    # anisotropic symmetric-PD weight matrices: W = Q diag(a, b) Q^T
    angles = rng.uniform(0, np.pi, n)
    a = rng.uniform(0.5, 1.5, n)
    b = rng.uniform(0.1, 0.5, n)
    cos, sin = np.cos(angles), np.sin(angles)
    wxx = a * cos**2 + b * sin**2
    wyy = a * sin**2 + b * cos**2
    wxy = (a - b) * cos * sin
    cov_w = np.stack([wxx, wxy, wyy], axis=1)
    rot0 = ScipyRot.from_rotvec([0.04, -0.05, 0.02]).as_matrix() @ rot_gt
    t0 = t_gt + np.array([0.012, -0.008, 0.025])
    return pts3d, pts2d, cov_w, rot_gt, t_gt, rot0, t0


def test_gn_refine_cov_matches_cpp(rng):
    """JAX covariance-weighted GN (the Ceres ReprojectionErrorArray cost,
    uncertainty_pnp.cpp:29-31) vs the independent C++ implementation."""
    pts3d, pts2d, cov_w, rot_gt, t_gt, rot0, t0 = _cov_problem(rng)

    r_cpp, t_cpp = cpp_gn_refine_cov(rot0, t0, pts2d, pts3d, cov_w, CAM, iterations=5)
    r_jax, t_jax = refine_pose_cov(
        jnp.asarray(rot0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(cov_w, jnp.float32), jnp.asarray(CAM, jnp.float32), iterations=5,
    )
    np.testing.assert_allclose(np.asarray(r_jax), r_cpp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_jax), t_cpp, atol=2e-3)
    assert np.degrees(ScipyRot.from_matrix(r_cpp @ rot_gt.T).magnitude()) < 0.5
    assert np.linalg.norm(t_cpp - t_gt) < 0.005


def test_gn_refine_cov_isotropic_matches_scalar(rng):
    """W = w*I reduces the covariance cost to the scalar cost with weight w^2
    (residual w*e -> normal equations weight w^2)."""
    pts3d, pts2d, _, _, _, rot0, t0 = _cov_problem(rng)
    w = rng.uniform(0.3, 1.2, len(pts3d))
    cov_w = np.stack([w, np.zeros_like(w), w], axis=1)

    r_cov, t_cov = refine_pose_cov(
        jnp.asarray(rot0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(cov_w, jnp.float32), jnp.asarray(CAM, jnp.float32), iterations=5,
    )
    r_sc, t_sc = refine_pose(
        jnp.asarray(rot0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(w**2, jnp.float32), jnp.asarray(CAM, jnp.float32), iterations=5,
    )
    np.testing.assert_allclose(np.asarray(r_cov), np.asarray(r_sc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_cov), np.asarray(t_sc), atol=1e-5)


def test_scalar_weights_from_covariance_matches_numpy_eig(rng):
    """The jittable v2 reduction (un_pnp_utils.py:77-85) vs numpy eigvals."""
    n = 32
    # random symmetric PD covariances
    m = rng.normal(0, 1, (n, 2, 2))
    covs = m @ m.transpose(0, 2, 1) + 0.05 * np.eye(2)
    covs[:4] = 0.0  # degenerate points -> weight 0
    got = np.asarray(scalar_weights_from_covariance(jnp.asarray(covs, jnp.float32)))
    for i in range(n):
        if covs[i, 0, 0] < 1e-5:
            assert got[i] == 0.0
        else:
            expected = 1.0 / np.max(np.linalg.eigvals(covs[i]).real)
            np.testing.assert_allclose(got[i], expected, rtol=1e-4)
