"""Uncertainty-weighted Gauss-Newton pose refinement, fixed iterations.

The jittable re-expression of the reference's Ceres LM refinement
(uncertainty_pnp/src/uncertainty_pnp.cpp:17-55: weighted reprojection residual
r_i = W_i * (project(R p_i + t) - u_i), solved by Levenberg-Marquardt from a
P3P seed). Here: analytic 2x6 Jacobians per point, damped 6x6 normal-equation
solves, a fixed iteration count (XLA-friendly — no convergence branching),
and a left-multiplicative so(3) update R <- exp(dtheta) R.

Scalar per-point weights correspond to the reference's `uncertainty_pnp_v2`
weight reduction (un_pnp_utils.py:60-121: 2x2 covariance -> max-eigenvalue
scalar weight).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyrapose_tpu.geometry.rotation import axis_angle_to_matrix
from pyrapose_tpu.utils.precision import heinsum


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
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]

    def step(rot, trans):
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

        jtj = heinsum("nri,nrj,n->ij", jac, jac, w)  # (6, 6)
        jtr = heinsum("nri,nr,n->i", jac, res, w)  # (6,)
        jtj = jtj + damping * jnp.eye(6, dtype=f32) * (1.0 + jnp.diagonal(jtj))
        # unrolled SPD solve: vectorizes across the vmapped batch instead of
        # a per-system LU custom call (utils/smallmat.py)
        from pyrapose_tpu.utils.smallmat import solve_spd

        delta = -solve_spd(jtj, jtr)

        # The Jacobian linearizes about camera-frame points (skew of
        # pc = R p + t), so the increment acts on the whole pose:
        # R' = dR R, t' = dR t + dt. Dropping dR on t leaves an
        # O(|dtheta x t|) error in each step (slower convergence).
        drot = axis_angle_to_matrix(delta[:3]).astype(f32)
        rot_new = heinsum("ij,jk->ik", drot, rot)
        trans_new = heinsum("ij,j->i", drot, trans) + delta[3:]
        return rot_new, trans_new

    # Unrolled fixed-count loop: at these sizes the per-iteration work is a
    # handful of small fused kernels, and lax.scan's loop machinery costs
    # more than it saves — unrolling lets XLA fuse across iterations.
    rot_out, trans_out = rot.astype(f32), trans.astype(f32)
    for _ in range(iterations):
        rot_out, trans_out = step(rot_out, trans_out)
    return rot_out, trans_out
