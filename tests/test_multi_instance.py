"""Multi-instance pose recovery and instance-matched evaluation.

Round-1 VERDICT gap #4: the framework recovered exactly one pose per class
and scored only the first GT instance. These tests cover the new path —
two copies of one class in one image are both recovered from dense votes
(pose/ransac.py greedy vote-cluster suppression) and both count in recall
(eval/driver.py greedy instance matching). Reference capability:
tless_eval.py:312-436 iterates NMS detections; occlusion_eval.py:221-540
loops all objects.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data.pipeline import pad_ground_truth, stack_ground_truth
from pyrapose_tpu.data.spec import spec_from_models_info
from pyrapose_tpu.eval.driver import evaluate_dataset
from pyrapose_tpu.eval.tless import evaluate_tless
from pyrapose_tpu.geometry.projection import project_box3d
from pyrapose_tpu.pose.ransac import (
    MultiPoseResult,
    RansacConfig,
    class_multi_poses_from_dense,
)

CAM = np.array([572.4114, 573.57043, 325.2611, 242.04899], np.float32)


def _spec(n_classes=2):
    info = {
        str(o): dict(
            diameter=120.0,
            min_x=-50.0, min_y=-40.0, min_z=-30.0,
            size_x=100.0, size_y=80.0, size_z=60.0,
        )
        for o in range(1, n_classes + 1)
    }
    return spec_from_models_info(
        "synthetic", info, list(range(1, n_classes + 1)), tuple(CAM)
    )


def _rot_z(deg):
    a = np.deg2rad(deg)
    return np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )


def _dense_votes(spec, poses_by_class, n_anchors=200, votes_per_pose=16,
                 noise_px=0.5, seed=0):
    """Fabricate dense predictions: clusters of corner votes per GT pose."""
    rng = np.random.default_rng(seed)
    c = spec.num_classes
    boxes3d = rng.uniform(0, 640, (n_anchors, 16)).astype(np.float32)
    scores = np.full((n_anchors, c), 0.01, np.float32)
    a = 0
    for cls, poses in poses_by_class.items():
        for rot, trans in poses:
            corners16 = np.asarray(
                project_box3d(
                    jnp.asarray(spec.corners3d[cls])[None],
                    jnp.asarray(rot)[None],
                    jnp.asarray(trans)[None],
                    jnp.asarray(CAM)[None],
                )
            )[0]
            for _ in range(votes_per_pose):
                boxes3d[a] = corners16 + rng.normal(0, noise_px, 16)
                scores[a, cls] = rng.uniform(0.8, 0.99)
                a += 1
    return jnp.asarray(boxes3d), jnp.asarray(scores)


class TestMultiInstanceRansac:
    def test_two_copies_recovered(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        boxes3d, scores = _dense_votes(
            spec, {0: [(rot_a, t_a), (rot_b, t_b)]}
        )
        config = RansacConfig(
            top_k=48, max_instances=2, min_instance_votes=5, approx_top_k=False
        )
        result = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            config,
        )
        assert isinstance(result, MultiPoseResult)
        assert result.rot.shape == (2, 2, 3, 3)
        assert bool(result.valid[0, 0]) and bool(result.valid[0, 1])
        assert not bool(result.valid[1, 0])  # class 1 has no votes

        est_t = np.asarray(result.trans[0])  # (2, 3)
        d_a = np.linalg.norm(est_t - t_a, axis=1).min()
        d_b = np.linalg.norm(est_t - t_b, axis=1).min()
        assert d_a < 0.02 and d_b < 0.02
        # the two instances are distinct poses, not duplicates
        assert np.linalg.norm(est_t[0] - est_t[1]) > 0.2

    def test_single_copy_second_instance_invalid(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.1, 0.02, 0.9], np.float32)
        boxes3d, scores = _dense_votes(spec, {0: [(rot_a, t_a)]})
        config = RansacConfig(
            top_k=48, max_instances=2, min_instance_votes=5, approx_top_k=False
        )
        result = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            config,
        )
        assert bool(result.valid[0, 0])
        # all votes belong to one cluster: no second instance
        assert not bool(result.valid[0, 1])

    def test_single_instance_path_matches_multi_first(self):
        """class_poses_from_dense is the N=1 view of the multi path."""
        from pyrapose_tpu.pose.ransac import class_poses_from_dense

        spec = _spec()
        rot_a, t_a = _rot_z(25), np.array([-0.1, 0.02, 0.9], np.float32)
        boxes3d, scores = _dense_votes(spec, {0: [(rot_a, t_a)]})
        config = RansacConfig(top_k=48, approx_top_k=False)
        single = class_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            config,
        )
        multi = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            dataclasses.replace(config, max_instances=2),
        )
        np.testing.assert_allclose(
            np.asarray(single.rot[0]), np.asarray(multi.rot[0, 0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(single.trans[0]), np.asarray(multi.trans[0, 0]),
            atol=1e-6,
        )


def _two_copy_gt(spec, rot_a, t_a, rot_b, t_b, max_instances=4):
    h, w = spec.image_shape
    p3 = ((h + 7) // 8) * ((w + 7) // 8)
    gt = pad_ground_truth(
        np.zeros((2, 4), np.float32),
        np.stack([rot_a, rot_b]),
        np.stack([t_a, t_b]),
        np.zeros((2,), np.int32),  # both class 0
        CAM,
        np.full((p3,), -1, np.int32),
        max_instances,
    )
    return stack_ground_truth([gt])


class _MultiOracle:
    """infer_fn returning a MultiPoseResult with both copies of class 0."""

    def __init__(self, spec, poses, valid_flags=(True, True)):
        self.spec = spec
        self.poses = poses
        self.valid_flags = valid_flags

    def __call__(self, variables, images, cam):
        b = images.shape[0]
        c, n = self.spec.num_classes, 2
        rots = np.tile(np.eye(3, dtype=np.float32), (b, c, n, 1, 1))
        transs = np.zeros((b, c, n, 3), np.float32)
        transs[..., 2] = 1.0
        valid = np.zeros((b, c, n), bool)
        for i, (rot, t) in enumerate(self.poses):
            rots[0, 0, i] = rot
            transs[0, 0, i] = t
            valid[0, 0, i] = self.valid_flags[i]
        return (
            MultiPoseResult(
                rot=jnp.asarray(rots),
                trans=jnp.asarray(transs),
                valid=jnp.asarray(valid),
                num_votes=jnp.full((b, c), 20, jnp.int32),
                score=jnp.ones((b, c, n)) * 0.9,
                inlier_frac=jnp.ones((b, c, n)),
            ),
            {},
        )


class TestMultiInstanceEval:
    def test_both_copies_count_in_recall(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        gt = _two_copy_gt(spec, rot_a, t_a, rot_b, t_b)
        images = np.zeros((1, *spec.image_shape, 3), np.uint8)
        oracle = _MultiOracle(spec, [(rot_a, t_a), (rot_b, t_b)])
        report = evaluate_dataset(
            spec, oracle, None, [(images, gt)], verbose=False
        )
        # both GT instances scored true: recall 1.0 with support 2
        assert report["per_class"]["support"][0] == 2
        assert report["per_class"]["recall"][0] == 1.0

    def test_one_detection_two_gt_caps_recall(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        gt = _two_copy_gt(spec, rot_a, t_a, rot_b, t_b)
        images = np.zeros((1, *spec.image_shape, 3), np.uint8)
        oracle = _MultiOracle(
            spec, [(rot_a, t_a), (rot_b, t_b)], valid_flags=(True, False)
        )
        report = evaluate_dataset(
            spec, oracle, None, [(images, gt)], verbose=False
        )
        assert report["per_class"]["recall"][0] == 0.5
        # the single detection matched its GT: precision stays perfect
        assert report["per_class"]["precision"][0] == 1.0

    def test_wrong_second_pose_is_false_positive(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        bad_t = t_b + np.array([0.3, 0.3, 0.4], np.float32)
        gt = _two_copy_gt(spec, rot_a, t_a, rot_b, t_b)
        images = np.zeros((1, *spec.image_shape, 3), np.uint8)
        oracle = _MultiOracle(spec, [(rot_a, t_a), (rot_b, bad_t)])
        report = evaluate_dataset(
            spec, oracle, None, [(images, gt)], verbose=False
        )
        assert report["per_class"]["recall"][0] == 0.5
        assert report["per_class"]["precision"][0] == 0.5

    def test_tless_two_copies_detection_recall(self):
        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        # GT boxes = projected corner hulls (the tless matcher uses IoU)
        boxes = []
        for rot, t in ((rot_a, t_a), (rot_b, t_b)):
            c16 = np.asarray(
                project_box3d(
                    jnp.asarray(spec.corners3d[0])[None],
                    jnp.asarray(rot)[None],
                    jnp.asarray(t)[None],
                    jnp.asarray(CAM)[None],
                )
            )[0].reshape(8, 2)
            boxes.append(
                [c16[:, 0].min(), c16[:, 1].min(), c16[:, 0].max(), c16[:, 1].max()]
            )
        h, w = spec.image_shape
        p3 = ((h + 7) // 8) * ((w + 7) // 8)
        gt1 = pad_ground_truth(
            np.asarray(boxes, np.float32),
            np.stack([rot_a, rot_b]),
            np.stack([t_a, t_b]),
            np.zeros((2,), np.int32),
            CAM,
            np.full((p3,), -1, np.int32),
            4,
        )
        gt = stack_ground_truth([gt1])
        images = np.zeros((1, *spec.image_shape, 3), np.uint8)
        oracle = _MultiOracle(spec, [(rot_a, t_a), (rot_b, t_b)])
        report = evaluate_tless(
            spec, oracle, None, [(images, gt)], verbose=False
        )
        assert report["support"][0] == 2
        # both copies IoU-matched at 0.5: per-class recall 1.0
        assert report["per_class_recall_05"][0] == 1.0
        assert report["add_0.1d"] == 1.0
