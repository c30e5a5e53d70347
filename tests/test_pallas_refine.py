"""Pallas GN-refine kernel parity vs the pure-JAX reference.

Runs the kernel in Pallas interpreter mode (CPU-compatible); on TPU the
same kernel compiles natively (RansacConfig.pallas_refine routes to it).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyrapose_tpu.pose.pallas_refine import (
    refine_pose_batched,
    refine_pose_batched_pallas,
)


def _axis_angle(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    t = np.deg2rad(deg)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return (np.eye(3) + np.sin(t) * k + (1 - np.cos(t)) * (k @ k)).astype(
        np.float32
    )


def _make_problem(n_inst=5, n_pts=32, seed=0):
    """Instances with known GT poses, noisy observations, perturbed inits."""
    rng = np.random.default_rng(seed)
    cam = np.tile(
        np.array([572.4, 573.6, 325.3, 242.0], np.float32), (n_inst, 1)
    )
    p3 = rng.uniform(-0.06, 0.06, (n_inst, n_pts, 3)).astype(np.float32)
    rot_gt = np.stack(
        [_axis_angle(rng.normal(size=3), rng.uniform(5, 170)) for _ in range(n_inst)]
    )
    t_gt = np.stack(
        [
            [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.6, 1.2)]
            for _ in range(n_inst)
        ]
    ).astype(np.float32)
    pc = np.einsum("iab,inb->ina", rot_gt, p3) + t_gt[:, None]
    obs = np.stack(
        [
            pc[..., 0] * cam[:, None, 0] / pc[..., 2] + cam[:, None, 2],
            pc[..., 1] * cam[:, None, 1] / pc[..., 2] + cam[:, None, 3],
        ],
        axis=-1,
    ).astype(np.float32)
    obs = obs + rng.normal(0, 0.3, obs.shape).astype(np.float32)
    w = rng.uniform(0.4, 1.0, (n_inst, n_pts)).astype(np.float32)
    rot0 = np.stack(
        [_axis_angle(rng.normal(size=3), rng.uniform(2, 6)) @ rot_gt[i]
         for i in range(n_inst)]
    )
    t0 = t_gt + rng.normal(0, 0.01, t_gt.shape).astype(np.float32)
    return rot0, t0, obs, p3, w, cam, rot_gt, t_gt


class TestPallasRefineParity:
    def test_matches_reference_implementation(self):
        rot0, t0, obs, p3, w, cam, _, _ = _make_problem()
        args = tuple(map(jnp.asarray, (rot0, t0, obs, p3, w, cam)))
        r_ref, t_ref = refine_pose_batched(*args, iterations=5)
        r_pl, t_pl = refine_pose_batched_pallas(
            *args, iterations=5, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(r_pl), np.asarray(r_ref), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(t_pl), np.asarray(t_ref), atol=2e-4
        )

    def test_converges_to_ground_truth(self):
        rot0, t0, obs, p3, w, cam, rot_gt, t_gt = _make_problem(seed=3)
        args = tuple(map(jnp.asarray, (rot0, t0, obs, p3, w, cam)))
        r_pl, t_pl = refine_pose_batched_pallas(
            *args, iterations=8, interpret=True
        )
        t_err_before = np.linalg.norm(t0 - t_gt, axis=1)
        t_err_after = np.linalg.norm(np.asarray(t_pl) - t_gt, axis=1)
        assert (t_err_after < t_err_before).all()
        # noise floor: 0.3 px observation noise at ~1 m leaves a few mm
        assert t_err_after.max() < 6e-3
        assert t_err_after.mean() < 3e-3

    def test_lane_padding_is_isolated(self):
        """Results are identical whether 5 or 133 instances share the call
        (the padded lanes must not perturb real ones)."""
        rot0, t0, obs, p3, w, cam, _, _ = _make_problem(n_inst=5)
        small = refine_pose_batched_pallas(
            *map(jnp.asarray, (rot0, t0, obs, p3, w, cam)),
            iterations=3, interpret=True,
        )
        big = refine_pose_batched_pallas(
            jnp.asarray(np.tile(rot0, (27, 1, 1))[:133]),
            jnp.asarray(np.tile(t0, (27, 1))[:133]),
            jnp.asarray(np.tile(obs, (27, 1, 1))[:133]),
            jnp.asarray(np.tile(p3, (27, 1, 1))[:133]),
            jnp.asarray(np.tile(w, (27, 1))[:133]),
            jnp.asarray(np.tile(cam, (27, 1))[:133]),
            iterations=3, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(big[0][:5]), np.asarray(small[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(big[1][:5]), np.asarray(small[1]), atol=1e-6
        )


class TestInferencePallasPath:
    def test_full_pipeline_parity(self):
        """build_inference_fn with pallas_refine=True (interpreter on CPU)
        matches the pure-JAX path end to end."""
        import dataclasses as _dc

        import jax

        from pyrapose_tpu.data import LINEMOD_SPEC
        from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
        from pyrapose_tpu.inference import build_inference_fn
        from pyrapose_tpu.models import ModelConfig, PyraPose
        from pyrapose_tpu.pose import RansacConfig

        spec = _dc.replace(LINEMOD_SPEC, image_shape=(64, 64))
        config = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                             compute_dtype="float32")
        model = PyraPose(config=config)
        ds = SyntheticPoseDataset(spec, num_images=2, max_instances=4, seed=0)
        images, gt = ds.batch([0, 1])
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False,
        )
        cam = jnp.asarray(gt.cam)
        base = RansacConfig(top_k=16, approx_top_k=False)
        f_ref = build_inference_fn(
            model, spec.corners3d, (64, 64),
            _dc.replace(base, pallas_refine=False),
        )
        f_pl = build_inference_fn(
            model, spec.corners3d, (64, 64),
            _dc.replace(base, pallas_refine=True),
        )
        p_ref, _ = f_ref(variables, jnp.asarray(images), cam)
        p_pl, _ = f_pl(variables, jnp.asarray(images), cam)
        np.testing.assert_array_equal(
            np.asarray(p_ref.valid), np.asarray(p_pl.valid)
        )
        np.testing.assert_allclose(
            np.asarray(p_ref.rot), np.asarray(p_pl.rot), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(p_ref.trans), np.asarray(p_pl.trans), atol=5e-4
        )


class TestMultiInstanceSelectRefine:
    def test_select_plus_pallas_matches_fused_path(self):
        """class_multi_poses_select + pallas refine == the pure
        class_multi_poses_from_dense path (2 instances of one class)."""
        import jax

        from tests.test_multi_instance import (
            CAM, _dense_votes, _rot_z, _spec,
        )
        from pyrapose_tpu.pose.pallas_refine import refine_pose_batched_pallas
        from pyrapose_tpu.pose.ransac import (
            RansacConfig,
            class_multi_poses_from_dense,
            class_multi_poses_select,
        )

        spec = _spec()
        rot_a, t_a = _rot_z(15), np.array([-0.22, 0.02, 0.9], np.float32)
        rot_b, t_b = _rot_z(-40), np.array([0.25, -0.05, 1.1], np.float32)
        boxes3d, scores = _dense_votes(spec, {0: [(rot_a, t_a), (rot_b, t_b)]})
        config = RansacConfig(
            top_k=32, max_instances=2, min_instance_votes=5,
            approx_top_k=False,
        )
        corners = jnp.asarray(spec.corners3d)
        cam = jnp.asarray(CAM)

        ref = class_multi_poses_from_dense(boxes3d, scores, corners, cam, config)

        sel = class_multi_poses_select(boxes3d, scores, corners, cam, config)
        c, n = sel["rot0"].shape[:2]
        k = config.top_k
        pts2d = jnp.broadcast_to(
            sel["votes"].reshape(c, 1, k * 8, 2), (c, n, k * 8, 2)
        ).reshape(c * n, k * 8, 2)
        pts3d = jnp.broadcast_to(
            jnp.tile(corners, (1, k, 1)).reshape(c, 1, k * 8, 3),
            (c, n, k * 8, 3),
        ).reshape(c * n, k * 8, 3)
        cams = jnp.broadcast_to(cam.reshape(1, 1, 4), (c, n, 4)).reshape(c * n, 4)
        rot, trans = refine_pose_batched_pallas(
            sel["rot0"].reshape(c * n, 3, 3),
            sel["trans0"].reshape(c * n, 3),
            pts2d, pts3d,
            sel["weights"].reshape(c * n, k * 8),
            cams,
            iterations=config.refine_iterations,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.valid), np.asarray(sel["valid"])
        )
        np.testing.assert_allclose(
            rot.reshape(c, n, 3, 3), np.asarray(ref.rot), atol=5e-4
        )
        np.testing.assert_allclose(
            trans.reshape(c, n, 3), np.asarray(ref.trans), atol=5e-4
        )
