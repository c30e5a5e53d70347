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
from pyrapose_tpu.pose import refine_pose
from pyrapose_tpu.utils.cpp_parity import cpp_gn_refine, cpp_iou

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
