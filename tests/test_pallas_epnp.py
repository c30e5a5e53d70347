"""Fused Pallas EPnP kernel vs the pure-JAX epnp_fast (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pyrapose_tpu.pose.epnp import epnp_fast, epnp_precompute
from pyrapose_tpu.pose.pallas_epnp import (
    epnp_batched_pallas,
    epnp_kernel_constants,
)

CAM = np.array([572.4114, 573.57043, 325.2611, 242.04899], np.float32)


def _box_corners(sx=0.08, sy=0.06, sz=0.05):
    return np.array(
        [
            [sx, sy, sz], [sx, sy, -sz], [sx, -sy, sz], [sx, -sy, -sz],
            [-sx, sy, sz], [-sx, sy, -sz], [-sx, -sy, sz], [-sx, -sy, -sz],
        ],
        np.float32,
    )


def _problems(n_solves=9, noise=0.2, seed=4):
    rng = np.random.default_rng(seed)
    corners = _box_corners()
    p2d, rots, ts = [], [], []
    for i in range(n_solves):
        rot = ScipyRot.random(random_state=100 + i).as_matrix().astype(np.float32)
        t = np.array(
            [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.6, 1.2)],
            np.float32,
        )
        pc = corners @ rot.T + t
        pix = np.stack(
            [pc[:, 0] * CAM[0] / pc[:, 2] + CAM[2],
             pc[:, 1] * CAM[1] / pc[:, 2] + CAM[3]], axis=1
        ) + rng.normal(0, noise, (8, 2))
        p2d.append(pix.astype(np.float32))
        rots.append(rot)
        ts.append(t)
    return corners, np.stack(p2d), rots, ts


def test_matches_epnp_fast():
    corners, p2d, rots_gt, ts_gt = _problems()
    pre = epnp_precompute(corners)
    consts = epnp_kernel_constants(pre)
    i_n = len(p2d)

    ones8 = jnp.ones((8,))
    rot_ref, t_ref = jax.vmap(
        lambda p: epnp_fast(jnp.asarray(p), ones8, pre, jnp.asarray(CAM))
    )(jnp.asarray(p2d))

    tile = lambda x: jnp.tile(jnp.asarray(x)[None], (i_n, 1))
    rot_k, t_k = epnp_batched_pallas(
        jnp.asarray(p2d),
        tile(consts["alphas"]), tile(consts["amat"]), tile(consts["dw6"]),
        tile(consts["p3c"]), tile(consts["cw"]), tile(CAM),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rot_k), np.asarray(rot_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_ref), atol=2e-3)
    # and both land near ground truth
    for i in range(i_n):
        dr = ScipyRot.from_matrix(
            np.asarray(rot_k[i]) @ rots_gt[i].T
        ).magnitude()
        # pre-refinement single-hypothesis accuracy on 0.2 px noise
        assert np.degrees(dr) < 5.0
        assert np.linalg.norm(np.asarray(t_k[i]) - ts_gt[i]) < 0.03


def test_lane_padding_is_harmless():
    """I not divisible by the lane block: padded lanes must not affect the
    real solves."""
    corners, p2d, _, _ = _problems(n_solves=5)
    pre = epnp_precompute(corners)
    consts = epnp_kernel_constants(pre)
    tile5 = lambda x: jnp.tile(jnp.asarray(x)[None], (5, 1))
    rot5, t5 = epnp_batched_pallas(
        jnp.asarray(p2d),
        tile5(consts["alphas"]), tile5(consts["amat"]), tile5(consts["dw6"]),
        tile5(consts["p3c"]), tile5(consts["cw"]), tile5(CAM),
        lane_block=256, interpret=True,
    )
    tile3 = lambda x: jnp.tile(jnp.asarray(x)[None], (3, 1))
    rot3, t3 = epnp_batched_pallas(
        jnp.asarray(p2d[:3]),
        tile3(consts["alphas"]), tile3(consts["amat"]), tile3(consts["dw6"]),
        tile3(consts["p3c"]), tile3(consts["cw"]), tile3(CAM),
        lane_block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rot5[:3]), np.asarray(rot3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t5[:3]), np.asarray(t3), atol=1e-5)


def test_kernel_constants_match_precompute():
    corners = _box_corners()
    pre = epnp_precompute(corners)
    consts = epnp_kernel_constants(pre)
    assert consts["alphas"].shape == (32,)
    a = np.asarray(pre["alphas"])
    np.testing.assert_allclose(
        consts["amat"][0], np.sum(a[:, 0] * a[:, 0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        consts["p3c"].reshape(8, 3), corners - np.asarray(pre["cw"]), atol=1e-6
    )


def test_fused_select_matches_plain(rng):
    """End-to-end selection with kernel hypotheses == the pure-JAX path
    (small dense grid, interpreter mode)."""
    import dataclasses
    from functools import partial

    from scipy.spatial.transform import Rotation as SR

    from pyrapose_tpu.data import LINEMOD_SPEC
    from pyrapose_tpu.pose import RansacConfig
    from pyrapose_tpu.pose.ransac import (
        class_multi_poses_select,
        class_votes_topk,
        precompute_class_solvers,
    )

    spec = LINEMOD_SPEC
    C, N, B = spec.num_classes, 400, 2
    cfg = RansacConfig(top_k=8)
    corners = jnp.asarray(spec.corners3d)
    precomp = precompute_class_solvers(spec.corners3d)
    kc = epnp_kernel_constants(precomp)
    boxes3d = np.zeros((B, N, 16), np.float32)
    scores = np.zeros((B, N, C), np.float32)
    for b in range(B):
        rot = SR.random(random_state=60 + b).as_matrix().astype(np.float32)
        t = np.array([0.02, -0.03, 0.9], np.float32)
        cls = 2 + b
        pc = np.asarray(spec.corners3d)[cls] @ rot.T + t
        pix = np.stack(
            [pc[:, 0] * CAM[0] / pc[:, 2] + CAM[2],
             pc[:, 1] * CAM[1] / pc[:, 2] + CAM[3]], 1)
        idx = rng.choice(N, 20, replace=False)
        boxes3d[b, idx] = (pix + rng.normal(0, 0.5, (20, 8, 2))).reshape(20, 16)
        scores[b, idx, cls] = rng.uniform(0.7, 0.99, 20)
    cam = jnp.tile(jnp.asarray(CAM), (B, 1))
    bx, sc = jnp.asarray(boxes3d), jnp.asarray(scores)

    sel_plain = jax.vmap(
        partial(class_multi_poses_select, corners_3d=corners, config=cfg,
                precomp=precomp)
    )(bx, sc, cam=cam)

    tk = jax.vmap(partial(class_votes_topk, config=cfg))(bx, sc)
    bb, cc, kk = tk["votes"].shape[:3]
    tot = bb * cc * kk
    bcast = lambda x: jnp.broadcast_to(
        jnp.asarray(x)[None, :, None], (bb, cc, kk) + np.asarray(x).shape[1:]
    ).reshape(tot, np.asarray(x).shape[-1])
    cams_e = jnp.broadcast_to(cam[:, None, None, :], (bb, cc, kk, 4)).reshape(tot, 4)
    rh, th = epnp_batched_pallas(
        tk["votes"].reshape(tot, 8, 2), bcast(kc["alphas"]), bcast(kc["amat"]),
        bcast(kc["dw6"]), bcast(kc["p3c"]), bcast(kc["cw"]), cams_e,
        lane_block=128, interpret=True,
    )
    hyp = (rh.reshape(bb, cc, kk, 3, 3), th.reshape(bb, cc, kk, 3))
    sel_f = jax.vmap(
        partial(class_multi_poses_select, corners_3d=corners, config=cfg,
                precomp=precomp)
    )(bx, sc, cam=cam, hyp=hyp)

    np.testing.assert_array_equal(
        np.asarray(sel_f["valid"]), np.asarray(sel_plain["valid"])
    )
    v = np.asarray(sel_plain["valid"])
    assert v.any()
    np.testing.assert_allclose(
        np.asarray(sel_f["rot0"])[v], np.asarray(sel_plain["rot0"])[v], atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(sel_f["trans0"])[v], np.asarray(sel_plain["trans0"])[v],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sel_f["weights"]), np.asarray(sel_plain["weights"]), atol=1e-3
    )
