"""Uncertainty-weighted Gauss-Newton pose refinement, fixed iterations.

The jittable re-expression of the reference's Ceres LM refinement
(uncertainty_pnp/src/uncertainty_pnp.cpp:17-55: weighted reprojection residual
r_i = W_i * (project(R p_i + t) - u_i), solved by Levenberg-Marquardt from a
P3P seed). Here: analytic 2x6 Jacobians per point, damped 6x6 normal-equation
solves, a fixed iteration count (XLA-friendly — no convergence branching),
and a left-multiplicative so(3) update R <- exp(dtheta) R.

Two weight parameterizations, matching the reference's two entry points:

- `refine_pose` — scalar per-point weights, the reference's
  `uncertainty_pnp_v2` reduction (un_pnp_utils.py:60-121: 2x2 covariance ->
  max-eigenvalue scalar weight; `scalar_weights_from_covariance` below is
  that reduction, jittable).
- `refine_pose_cov` — full symmetric 2x2 weight matrix (wxx, wxy, wyy) per
  point, the exact Ceres `ReprojectionErrorArray` residual
  r_i = W_i (project(R p_i + t) - u_i) of uncertainty_pnp.cpp:17-34.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrapose_tpu.geometry.rotation import axis_angle_to_matrix
from pyrapose_tpu.utils.precision import heinsum


def _reproj_residual_jacobian(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    p3: jnp.ndarray,
    obs: jnp.ndarray,
    cam: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reprojection residual (n, 2) and analytic Jacobian (n, 2, 6).

    Jacobian columns: [dtheta (so(3), left-multiplicative), dt]. The
    linearization is about camera-frame points pc = R p + t, so the skew
    block uses pc and the pose increment acts on the whole pose.
    """
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    pc = heinsum("ij,nj->ni", rot, p3) + trans  # (n, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    res = jnp.stack([u - obs[:, 0], v - obs[:, 1]], axis=1)  # (n, 2)

    # d(pix)/d(p_cam): (n, 2, 3)
    zeros = jnp.zeros_like(x)
    j_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * x * inv_z * inv_z], axis=1),
            jnp.stack([zeros, fy * inv_z, -fy * y * inv_z * inv_z], axis=1),
        ],
        axis=1,
    )
    # d(p_cam)/d(dtheta) = -[p_cam]x ; d(p_cam)/d(dt) = I
    zero3 = jnp.zeros_like(x)
    skew = jnp.stack(
        [
            jnp.stack([zero3, -pc[:, 2], pc[:, 1]], axis=1),
            jnp.stack([pc[:, 2], zero3, -pc[:, 0]], axis=1),
            jnp.stack([-pc[:, 1], pc[:, 0], zero3], axis=1),
        ],
        axis=1,
    )  # (n, 3, 3) = [p_cam]x
    j_rot = -heinsum("nij,njk->nik", j_proj, skew)  # (n, 2, 3)
    jac = jnp.concatenate([j_rot, j_proj], axis=2)  # (n, 2, 6)
    return res, jac


def _apply_pose_increment(
    rot: jnp.ndarray, trans: jnp.ndarray, delta: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """R' = exp(dtheta) R, t' = exp(dtheta) t + dt.

    The Jacobian linearizes about camera-frame points (skew of
    pc = R p + t), so the increment acts on the whole pose: dropping dR
    on t would leave an O(|dtheta x t|) error per step.
    """
    drot = axis_angle_to_matrix(delta[:3]).astype(rot.dtype)
    rot_new = heinsum("ij,jk->ik", drot, rot)
    trans_new = heinsum("ij,j->i", drot, trans) + delta[3:]
    return rot_new, trans_new


def refine_pose(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    points_2d: jnp.ndarray,
    points_3d: jnp.ndarray,
    weights: jnp.ndarray,
    cam: jnp.ndarray,
    iterations: int = 5,
    damping: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Refine (R, t) by weighted Gauss-Newton on reprojection error.

    Args:
        rot: (3, 3) initial rotation.
        trans: (3,) initial translation.
        points_2d: (n, 2) pixel observations.
        points_3d: (n, 3) object points.
        weights: (n,) weights (0 disables a point).
        cam: (4,) intrinsics (fx, fy, cx, cy).
        iterations: fixed Gauss-Newton iteration count.
        damping: Levenberg diagonal damping.

    Returns:
        Refined (R, t).
    """
    f32 = jnp.float32
    p3 = points_3d.astype(f32)
    obs = points_2d.astype(f32)
    w = jnp.maximum(weights.astype(f32), 0.0)

    from pyrapose_tpu.utils.smallmat import solve_spd

    def step(rot, trans):
        res, jac = _reproj_residual_jacobian(rot, trans, p3, obs, cam)
        jtj = heinsum("nri,nrj,n->ij", jac, jac, w)  # (6, 6)
        jtr = heinsum("nri,nr,n->i", jac, res, w)  # (6,)
        jtj = jtj + damping * jnp.eye(6, dtype=f32) * (1.0 + jnp.diagonal(jtj))
        # unrolled SPD solve: vectorizes across the vmapped batch instead of
        # a per-system LU custom call (utils/smallmat.py)
        delta = -solve_spd(jtj, jtr)
        return _apply_pose_increment(rot, trans, delta)

    # Unrolled fixed-count loop: at these sizes the per-iteration work is a
    # handful of small fused kernels, and lax.scan's loop machinery costs
    # more than it saves — unrolling lets XLA fuse across iterations.
    rot_out, trans_out = rot.astype(f32), trans.astype(f32)
    for _ in range(iterations):
        rot_out, trans_out = step(rot_out, trans_out)
    return rot_out, trans_out


def refine_pose_cov(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    points_2d: jnp.ndarray,
    points_3d: jnp.ndarray,
    cov_weights: jnp.ndarray,
    cam: jnp.ndarray,
    iterations: int = 5,
    damping: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Refine (R, t) with full symmetric 2x2 per-point weight matrices.

    The exact residual of the reference's Ceres cost
    (uncertainty_pnp/src/uncertainty_pnp.cpp:29-31):
        r_i = [wxx*dx + wxy*dy, wxy*dx + wyy*dy],  d = project(R p + t) - u
    solved by fixed-iteration Gauss-Newton (damped normal equations on the
    whitened system J_w = W J, r_w = W r).

    Args:
        rot: (3, 3) initial rotation.
        trans: (3,) initial translation.
        points_2d: (n, 2) pixel observations.
        points_3d: (n, 3) object points.
        cov_weights: (n, 3) per-point (wxx, wxy, wyy); all-zero disables a
            point.
        cam: (4,) intrinsics (fx, fy, cx, cy).
        iterations: fixed Gauss-Newton iteration count.
        damping: Levenberg diagonal damping.

    Returns:
        Refined (R, t).
    """
    f32 = jnp.float32
    p3 = points_3d.astype(f32)
    obs = points_2d.astype(f32)
    cw = cov_weights.astype(f32)
    # (n, 2, 2) symmetric weight matrices W_i
    wmat = jnp.stack(
        [
            jnp.stack([cw[:, 0], cw[:, 1]], axis=1),
            jnp.stack([cw[:, 1], cw[:, 2]], axis=1),
        ],
        axis=1,
    )

    from pyrapose_tpu.utils.smallmat import solve_spd

    def step(rot, trans):
        res, jac = _reproj_residual_jacobian(rot, trans, p3, obs, cam)
        res_w = heinsum("nrs,ns->nr", wmat, res)  # (n, 2)
        jac_w = heinsum("nrs,nsj->nrj", wmat, jac)  # (n, 2, 6)
        jtj = heinsum("nri,nrj->ij", jac_w, jac_w)
        jtr = heinsum("nri,nr->i", jac_w, res_w)
        jtj = jtj + damping * jnp.eye(6, dtype=f32) * (1.0 + jnp.diagonal(jtj))
        delta = -solve_spd(jtj, jtr)
        return _apply_pose_increment(rot, trans, delta)

    rot_out, trans_out = rot.astype(f32), trans.astype(f32)
    for _ in range(iterations):
        rot_out, trans_out = step(rot_out, trans_out)
    return rot_out, trans_out


def scalar_weights_from_covariance(covars: jnp.ndarray) -> jnp.ndarray:
    """2x2 covariances (n, 2, 2) -> scalar weights (n,), jittable.

    The reference's `uncertainty_pnp_v2` reduction (un_pnp_utils.py:77-85):
    weight_i = 1 / lambda_max(C_i), zero when C_i[0,0] < 1e-5 (degenerate
    point). The max eigenvalue of a symmetric 2x2 is closed-form:
    (a+c)/2 + sqrt(((a-c)/2)^2 + b^2).
    """
    a = covars[:, 0, 0]
    b = covars[:, 0, 1]
    c = covars[:, 1, 1]
    lam_max = 0.5 * (a + c) + jnp.sqrt(jnp.square(0.5 * (a - c)) + jnp.square(b))
    safe = jnp.maximum(lam_max, 1e-12)
    return jnp.where(a < 1e-5, 0.0, 1.0 / safe)
