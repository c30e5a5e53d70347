import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pyrapose_tpu.pose import RansacConfig, class_poses_from_dense, epnp, ransac_pnp, refine_pose

CAM = np.array([572.4114, 573.57043, 325.2611, 242.04899], np.float32)  # LineMOD K


def _box_corners(sx=0.08, sy=0.06, sz=0.05):
    """8 corners of a box, all +/- combinations (annotate_BOP corner order)."""
    return np.array(
        [
            [sx, sy, sz], [sx, sy, -sz], [sx, -sy, sz], [sx, -sy, -sz],
            [-sx, sy, sz], [-sx, sy, -sz], [-sx, -sy, sz], [-sx, -sy, -sz],
        ],
        np.float32,
    )


def _random_pose(rng, z=0.8):
    rot = ScipyRot.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), z + rng.uniform(-0.2, 0.4)])
    return rot.astype(np.float32), t.astype(np.float32)


def _project(p3d, rot, t, cam=CAM):
    pc = p3d @ rot.T + t
    return np.stack(
        [pc[:, 0] * cam[0] / pc[:, 2] + cam[2], pc[:, 1] * cam[1] / pc[:, 2] + cam[3]],
        axis=1,
    ).astype(np.float32)


def _pose_err(rot_est, t_est, rot_gt, t_gt):
    dr = ScipyRot.from_matrix(np.asarray(rot_est) @ rot_gt.T).magnitude()
    dt = np.linalg.norm(np.asarray(t_est) - t_gt)
    return np.degrees(dr), dt


class TestEPnP:
    def test_exact_correspondences(self, rng):
        corners = _box_corners()
        for _ in range(5):
            rot_gt, t_gt = _random_pose(rng)
            p2d = _project(corners, rot_gt, t_gt)
            rot, t = epnp(jnp.asarray(p2d), jnp.asarray(corners), jnp.ones(8), jnp.asarray(CAM))
            dr, dt = _pose_err(rot, t, rot_gt, t_gt)
            assert dr < 0.5, f"rotation error {dr} deg"
            assert dt < 0.005, f"translation error {dt} m"

    def test_noisy_correspondences(self, rng):
        corners = np.concatenate([_box_corners(), _box_corners(0.05, 0.09, 0.04)])
        rot_gt, t_gt = _random_pose(rng)
        p2d = _project(corners, rot_gt, t_gt) + rng.normal(0, 1.0, (16, 2)).astype(np.float32)
        rot, t = epnp(jnp.asarray(p2d), jnp.asarray(corners), jnp.ones(16), jnp.asarray(CAM))
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 5.0
        assert dt < 0.03

    def test_weights_downweight_outliers(self, rng):
        corners = _box_corners()
        rot_gt, t_gt = _random_pose(rng)
        p2d = _project(corners, rot_gt, t_gt)
        p2d_bad = p2d.copy()
        p2d_bad[0] += 150.0  # gross outlier
        w = np.ones(8, np.float32)
        w[0] = 0.0
        rot, t = epnp(jnp.asarray(p2d_bad), jnp.asarray(corners), jnp.asarray(w), jnp.asarray(CAM))
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 1.0
        assert dt < 0.01

    def test_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        corners = _box_corners()
        rot_gt, t_gt = _random_pose(rng)
        p2d = _project(corners, rot_gt, t_gt) + rng.normal(0, 0.5, (8, 2)).astype(np.float32)
        k_mat = np.array([[CAM[0], 0, CAM[2]], [0, CAM[1], CAM[3]], [0, 0, 1]])
        ok, rvec, tvec = cv2.solvePnP(
            corners.astype(np.float64), p2d.astype(np.float64), k_mat, None,
            flags=cv2.SOLVEPNP_EPNP,
        )
        assert ok
        rot_cv = cv2.Rodrigues(rvec)[0]
        rot, t = epnp(jnp.asarray(p2d), jnp.asarray(corners), jnp.ones(8), jnp.asarray(CAM))
        dr = np.degrees(ScipyRot.from_matrix(np.asarray(rot) @ rot_cv.T).magnitude())
        dt = np.linalg.norm(np.asarray(t) - tvec.ravel())
        assert dr < 2.0, f"vs OpenCV rotation {dr} deg"
        assert dt < 0.02, f"vs OpenCV translation {dt} m"

    def test_vmap_batch(self, rng):
        corners = _box_corners()
        poses = [_random_pose(rng) for _ in range(4)]
        p2d = np.stack([_project(corners, r, t) for r, t in poses])
        f = jax.vmap(lambda p: epnp(p, jnp.asarray(corners), jnp.ones(8), jnp.asarray(CAM)))
        rots, ts = f(jnp.asarray(p2d))
        for i, (rot_gt, t_gt) in enumerate(poses):
            dr, dt = _pose_err(rots[i], ts[i], rot_gt, t_gt)
            assert dr < 0.5 and dt < 0.005


class TestRefine:
    def test_improves_perturbed_pose(self, rng):
        corners = np.concatenate([_box_corners()] * 4)
        rot_gt, t_gt = _random_pose(rng)
        p2d = _project(corners, rot_gt, t_gt)
        rot0 = (ScipyRot.from_rotvec([0.05, -0.03, 0.02]).as_matrix() @ rot_gt).astype(np.float32)
        t0 = t_gt + np.array([0.01, -0.01, 0.03], np.float32)
        rot, t = refine_pose(
            jnp.asarray(rot0), jnp.asarray(t0), jnp.asarray(p2d), jnp.asarray(corners),
            jnp.ones(len(corners)), jnp.asarray(CAM), iterations=10,
        )
        dr0, dt0 = _pose_err(rot0, t0, rot_gt, t_gt)
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 0.1 * dr0
        assert dt < 0.1 * dt0

    def test_zero_weight_points_ignored(self, rng):
        corners = np.concatenate([_box_corners()] * 2)
        rot_gt, t_gt = _random_pose(rng)
        p2d = _project(corners, rot_gt, t_gt)
        p2d[8:] += 300.0  # corrupt second copy
        w = np.concatenate([np.ones(8), np.zeros(8)]).astype(np.float32)
        rot0 = (ScipyRot.from_rotvec([0.03, 0.0, -0.02]).as_matrix() @ rot_gt).astype(np.float32)
        rot, t = refine_pose(
            jnp.asarray(rot0), jnp.asarray(t_gt + 0.02), jnp.asarray(p2d),
            jnp.asarray(corners), jnp.asarray(w), jnp.asarray(CAM), iterations=10,
        )
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 0.5 and dt < 0.005


class TestRansac:
    def _make_votes(self, rng, rot_gt, t_gt, k=16, n_outliers=5, noise=0.5):
        corners = _box_corners()
        clean = _project(corners, rot_gt, t_gt)
        votes = np.tile(clean, (k, 1, 1)) + rng.normal(0, noise, (k, 8, 2))
        for i in range(n_outliers):
            votes[i] += rng.uniform(-200, 200, (1, 2))  # coherent shift = bad vote
        scores = rng.uniform(0.55, 0.95, k).astype(np.float32)
        return corners, votes.astype(np.float32), scores

    def test_rejects_outlier_votes(self, rng):
        rot_gt, t_gt = _random_pose(rng)
        corners, votes, scores = self._make_votes(rng, rot_gt, t_gt)
        rot, t, inlier_frac = ransac_pnp(
            jnp.asarray(votes), jnp.asarray(scores), jnp.ones(16, bool),
            jnp.asarray(corners), jnp.asarray(CAM),
        )
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 3.0, f"rotation {dr}"
        assert dt < 0.02, f"translation {dt}"
        assert float(inlier_frac) > 0.5

    def test_class_poses_from_dense(self, rng):
        # build a dense prediction tensor with one strong class
        n, c = 200, 3
        rot_gt, t_gt = _random_pose(rng)
        corners_all = np.stack([_box_corners(), _box_corners(0.05, 0.05, 0.1), _box_corners(0.1, 0.04, 0.06)])
        clean = _project(corners_all[1], rot_gt, t_gt).reshape(16)
        boxes3d = rng.normal(0, 300, (n, 16)).astype(np.float32)
        scores = np.full((n, c), 0.01, np.float32)
        good = rng.choice(n, 40, replace=False)
        boxes3d[good] = clean + rng.normal(0, 0.5, (40, 16))
        scores[good, 1] = rng.uniform(0.6, 0.99, 40)
        result = class_poses_from_dense(
            jnp.asarray(boxes3d), jnp.asarray(scores), jnp.asarray(corners_all),
            jnp.asarray(CAM),
        )
        assert bool(result.valid[1])
        assert not bool(result.valid[0]) and not bool(result.valid[2])
        assert int(result.num_votes[1]) == 40
        dr, dt = _pose_err(result.rot[1], result.trans[1], rot_gt, t_gt)
        assert dr < 3.0 and dt < 0.02

    def test_jit_compiles(self, rng):
        rot_gt, t_gt = _random_pose(rng)
        corners, votes, scores = self._make_votes(rng, rot_gt, t_gt)
        f = jax.jit(
            lambda v, s: ransac_pnp(
                v, s, jnp.ones(16, bool), jnp.asarray(corners), jnp.asarray(CAM)
            )
        )
        rot, t, _ = f(jnp.asarray(votes), jnp.asarray(scores))
        dr, dt = _pose_err(rot, t, rot_gt, t_gt)
        assert dr < 3.0 and dt < 0.02


class TestEpnpFast:
    """epnp_fast (hoisted constants + inverse iteration + Horn) must agree
    with the reference epnp (eigh + SVD) path."""

    def test_matches_epnp_on_random_poses(self, rng):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from pyrapose_tpu.data import LINEMOD_SPEC
        from pyrapose_tpu.pose.epnp import epnp, epnp_fast, epnp_precompute

        corners = LINEMOD_SPEC.corners3d[3]
        cam = jnp.asarray([572.4114, 573.57043, 325.2611, 242.04899])
        pre = epnp_precompute(corners)
        for i in range(5):
            rot = Rotation.random(random_state=i).as_matrix().astype(np.float32)
            trans = np.array([0.05 * i - 0.1, 0.03, 0.9 + 0.1 * i], np.float32)
            pc = corners @ rot.T + trans
            u = pc[:, 0] * 572.4114 / pc[:, 2] + 325.2611
            v = pc[:, 1] * 573.57043 / pc[:, 2] + 242.04899
            p2d = jnp.asarray(np.stack([u, v], axis=1))
            w = jnp.ones((8,))
            r1, t1 = epnp(p2d, jnp.asarray(corners), w, cam)
            r2, t2 = epnp_fast(p2d, w, pre, cam)
            np.testing.assert_allclose(np.asarray(t2), trans, atol=2e-3)
            np.testing.assert_allclose(np.asarray(r2), rot, atol=2e-2)
            np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=2e-3)

    def test_fast_path_in_full_pipeline(self, rng):
        """class_poses_from_dense with precomp recovers a planted pose."""
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from pyrapose_tpu.data import LINEMOD_SPEC
        from pyrapose_tpu.pose import RansacConfig
        from pyrapose_tpu.pose.ransac import (
            class_poses_from_dense,
            precompute_class_solvers,
        )

        corners_all = LINEMOD_SPEC.corners3d[:3]
        cam = jnp.asarray([572.4114, 573.57043, 325.2611, 242.04899])
        rot = Rotation.random(random_state=7).as_matrix().astype(np.float32)
        trans = np.array([0.02, -0.04, 1.1], np.float32)
        pc = corners_all[1] @ rot.T + trans
        u = pc[:, 0] * 572.4114 / pc[:, 2] + 325.2611
        v = pc[:, 1] * 573.57043 / pc[:, 2] + 242.04899
        votes16 = np.stack([u, v], axis=1).reshape(16)

        n = 400
        boxes3d = np.zeros((n, 16), np.float32)
        scores = np.zeros((n, 3), np.float32)
        for a in range(12):  # 12 identical perfect votes for class 1
            boxes3d[a] = votes16
            scores[a, 1] = 0.9
        pre = precompute_class_solvers(corners_all)
        poses = class_poses_from_dense(
            jnp.asarray(boxes3d), jnp.asarray(scores), jnp.asarray(corners_all),
            cam, RansacConfig(top_k=16), precomp=pre,
        )
        assert bool(poses.valid[1])
        np.testing.assert_allclose(np.asarray(poses.trans[1]), trans, atol=5e-3)
        np.testing.assert_allclose(np.asarray(poses.rot[1]), rot, atol=5e-2)
        assert not bool(poses.valid[0])
