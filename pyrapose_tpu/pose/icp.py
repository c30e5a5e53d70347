"""Fixed-iteration point-to-plane ICP on device.

Replaces the reference's host-side depth refinement — open3d
`registration_icp` in eval (linemod_eval.py:73-128) and cv2
`ppf_match_3d_ICP` in the ROS node (pyrapose_node.py:736-748) — with a
jittable, fixed-shape ICP designed for XLA:

- correspondence search is a dense pairwise-distance argmin, expressed via
  the Gram expansion so it lowers to MXU matmuls (same trick as the ADI
  metric, eval/metrics.py);
- each iteration solves the 6x6 point-to-plane normal equations with a
  small-angle (linearized) update, exactly `iterations` times — no
  convergence branching;
- invalid scene points (zero depth, outlier distance) are handled with
  weights, keeping shapes static.

Model normals come from the mesh when available; otherwise they are
approximated from local neighborhoods on the host at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyrapose_tpu.geometry.rotation import axis_angle_to_matrix
from pyrapose_tpu.utils.precision import heinsum


def depth_to_points(
    depth: jnp.ndarray, cam: jnp.ndarray, stride: int = 1
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a depth image to camera-frame points.

    Equivalent of the ROS node's create_point_cloud (pyrapose_node.py:170-189).

    Args:
        depth: (H, W) depth in meters (0 = no data).
        cam: (4,) fx, fy, cx, cy.
        stride: subsampling stride (static).

    Returns:
        points (N, 3), valid (N,) with N = ceil(H/stride) * ceil(W/stride).
    """
    d = depth[::stride, ::stride]
    h, w = d.shape
    xs = jnp.arange(w, dtype=depth.dtype) * stride
    ys = jnp.arange(h, dtype=depth.dtype) * stride
    u = xs[None, :].repeat(h, axis=0)
    v = ys[:, None].repeat(w, axis=1)
    x = (u - cam[2]) * d / cam[0]
    y = (v - cam[3]) * d / cam[1]
    pts = jnp.stack([x, y, d], axis=-1).reshape(-1, 3)
    return pts, (d > 0).reshape(-1)


def icp_point_to_plane(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    model_points: jnp.ndarray,
    model_normals: jnp.ndarray,
    scene_points: jnp.ndarray,
    scene_valid: jnp.ndarray,
    iterations: int = 10,
    max_corr_dist: float = 0.02,
    damping: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refine (R, t) so the posed model aligns with the scene cloud.

    Args:
        rot/trans: initial pose (model -> camera).
        model_points: (M, 3) object-frame surface points.
        model_normals: (M, 3) object-frame normals.
        scene_points: (S, 3) camera-frame points (from depth_to_points).
        scene_valid: (S,) bool.
        iterations: fixed iteration count.
        max_corr_dist: correspondence gate in meters (open3d's
          max_correspondence_distance; reference uses 0.015-0.02,
          linemod_eval.py:110).

    Returns:
        (rot, trans, rmse) — rmse over the final inlier set.
    """
    f32 = jnp.float32
    mp = model_points.astype(f32)
    mn = model_normals.astype(f32)
    sp = scene_points.astype(f32)
    sv = scene_valid
    big = jnp.asarray(1e9, f32)

    def step(carry, _):
        rot, trans = carry
        pm = heinsum("ij,mj->mi", rot, mp) + trans  # posed model (M, 3)
        nm = heinsum("ij,mj->mi", rot, mn)  # posed normals

        # nearest scene point per model point (Gram expansion -> matmul)
        d2 = (
            jnp.sum(pm * pm, axis=1)[:, None]
            + jnp.sum(sp * sp, axis=1)[None, :]
            - 2.0 * heinsum("md,sd->ms", pm, sp)
        )
        d2 = jnp.where(sv[None, :], d2, big)
        idx = jnp.argmin(d2, axis=1)  # (M,)
        q = jnp.take(sp, idx, axis=0)  # matched scene points
        dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0.0))
        w = (dist < max_corr_dist).astype(f32)

        # point-to-plane residual r = n . (p - q)
        r = jnp.sum(nm * (pm - q), axis=1)  # (M,)
        # jacobian rows: [ (p x n), n ]
        jac = jnp.concatenate([jnp.cross(pm, nm), nm], axis=1)  # (M, 6)
        jtj = heinsum("mi,mj,m->ij", jac, jac, w)
        jtr = heinsum("mi,m,m->i", jac, r, w)
        jtj = jtj + damping * jnp.eye(6, dtype=f32)
        delta = -jnp.linalg.solve(jtj, jtr)
        # guard: with no correspondences the solve is meaningless
        ok = jnp.sum(w) >= 6.0
        delta = jnp.where(ok, delta, jnp.zeros_like(delta))

        # The linearization is about camera-frame points p = R p0 + t
        # (residual uses posed points), so the incremental transform acts on
        # the WHOLE pose: R' = dR R, t' = dR t + dt. Omitting dR on t
        # injects an error of |omega x t| per iteration.
        drot = axis_angle_to_matrix(delta[:3]).astype(f32)
        rot_new = heinsum("ij,jk->ik", drot, rot)
        trans_new = heinsum("ij,j->i", drot, trans) + delta[3:]
        rmse = jnp.sqrt(
            jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0)
        )
        return (rot_new, trans_new), rmse

    (rot_out, trans_out), rmses = jax.lax.scan(
        step, (rot.astype(f32), trans.astype(f32)), None, length=iterations
    )
    return rot_out, trans_out, rmses[-1]


def estimate_normals_host(points, k: int = 8):
    """Host-side normal estimation by local PCA (replaces open3d
    estimate_normals for meshes without stored normals). Returns (N, 3)
    unit normals oriented toward -z (camera-facing convention)."""
    import numpy as np

    pts = np.asarray(points, np.float64)
    n = len(pts)
    d2 = (
        np.sum(pts * pts, axis=1)[:, None]
        + np.sum(pts * pts, axis=1)[None, :]
        - 2.0 * pts @ pts.T
    )
    idx = np.argsort(d2, axis=1)[:, : k + 1]
    normals = np.zeros((n, 3))
    for i in range(n):
        nb = pts[idx[i]] - pts[idx[i]].mean(axis=0)
        _, _, vt = np.linalg.svd(nb, full_matrices=False)
        normals[i] = vt[-1]
    flip = (normals[:, 2] > 0)[:, None]
    return np.where(flip, -normals, normals)
