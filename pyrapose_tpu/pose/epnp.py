"""Batched, weighted EPnP in pure JAX.

TPU-native replacement for the host-side pose solvers of the reference
(cv2.solvePnPRansac at utils/linemod_eval.py:479-485 and the Ceres-based
uncertainty_pnp at uncertainty_pnp/src/uncertainty_pnp.cpp:61-92): a
fixed-shape, jit/vmap-able EPnP (Lepetit et al.) whose only linear algebra is
a 12x12 symmetric eigendecomposition and a 3x3 SVD — both batchable on TPU.
Per-point scalar weights make it the initialization stage of the
uncertainty-weighted solver (refine.py adds the Gauss-Newton polish that
replaces the Ceres LM loop).

All contractions run at HIGHEST precision — the bf16 matmul default would
destroy the null-space estimate.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrapose_tpu.utils.precision import heinsum, hmatmul


def _control_points(points_w: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pick 4 control points: weighted centroid + principal axes.

    Args:
        points_w: (n, 3) world/object points.
        w: (n,) non-negative weights (sum > 0).

    Returns:
        (4, 3) control points, c0 = centroid.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    centroid = jnp.sum(points_w * w[:, None], axis=0) / wsum
    centered = points_w - centroid
    cov = heinsum("ni,nj,n->ij", centered, centered, w) / wsum
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # scale axes by sqrt(eigenvalue) (characteristic extent); guard degenerate
    # directions with a floor so the barycentric basis stays invertible.
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-8))
    axes = eigvec * scale[None, :]  # columns are scaled principal axes
    return jnp.concatenate([centroid[None], centroid[None] + axes.T], axis=0)


def _barycentric(points_w: jnp.ndarray, ctrl_w: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates of each point wrt the 4 control points.

    Returns (n, 4) alphas with rows summing to 1.
    """
    basis = (ctrl_w[1:] - ctrl_w[0]).T  # (3, 3) columns = c_j - c_0
    rel = (points_w - ctrl_w[0]).T  # (3, n)
    a123 = jnp.linalg.solve(basis, rel).T  # (n, 3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def epnp(
    points_2d: jnp.ndarray,
    points_3d: jnp.ndarray,
    weights: jnp.ndarray,
    cam: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted EPnP for one correspondence set. vmap for batching.

    Args:
        points_2d: (n, 2) pixel observations.
        points_3d: (n, 3) object-frame points.
        weights: (n,) per-point weights (0 disables a point). At least 4
            points with nonzero weight and a non-degenerate 3D spread are
            assumed; callers guard validity externally (fixed-shape style).
        cam: (4,) intrinsics (fx, fy, cx, cy).

    Returns:
        (R (3, 3), t (3,)) with points_cam ~= R @ points_3d + t.
    """
    f32 = jnp.float32
    points_2d = points_2d.astype(f32)
    points_3d = points_3d.astype(f32)
    w = jnp.maximum(weights.astype(f32), 0.0)
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]

    ctrl_w = _control_points(points_3d, w)
    alphas = _barycentric(points_3d, ctrl_w)  # (n, 4)

    # Build the weighted M matrix rows (2n x 12): unknowns are the 4 control
    # points in the camera frame, flattened (x0 y0 z0 ... x3 y3 z3).
    u = points_2d[:, 0]
    v = points_2d[:, 1]
    sw = jnp.sqrt(w)[:, None]  # row weighting
    zeros = jnp.zeros_like(alphas)
    # x-rows: [a_j*fx, 0, a_j*(cx - u)] per control point j
    rx = jnp.stack([alphas * fx, zeros, alphas * (cx - u)[:, None]], axis=-1)  # (n,4,3)
    ry = jnp.stack([zeros, alphas * fy, alphas * (cy - v)[:, None]], axis=-1)
    m = jnp.concatenate(
        [
            (rx.reshape(-1, 12) * sw),
            (ry.reshape(-1, 12) * sw),
        ],
        axis=0,
    )  # (2n, 12)

    mtm = hmatmul(m.T, m)  # (12, 12)
    _, eigvec = jnp.linalg.eigh(mtm)
    null = eigvec[:, 0]  # eigenvector of smallest eigenvalue
    ctrl_c = null.reshape(4, 3)

    # Recover scale from inter-control-point distances (beta, N=1 case).
    diff_w = ctrl_w[:, None, :] - ctrl_w[None, :, :]
    diff_c = ctrl_c[:, None, :] - ctrl_c[None, :, :]
    dw = jnp.sqrt(jnp.sum(diff_w**2, axis=-1) + 1e-12)
    dc = jnp.sqrt(jnp.sum(diff_c**2, axis=-1) + 1e-12)
    beta = jnp.sum(dc * dw) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    ctrl_c = ctrl_c * beta

    # Resolve the sign ambiguity: weighted mean depth must be positive.
    pts_c = hmatmul(alphas, ctrl_c)  # (n, 3)
    mean_z = jnp.sum(pts_c[:, 2] * w) / jnp.maximum(jnp.sum(w), 1e-9)
    flip = jnp.where(mean_z < 0.0, -1.0, 1.0)
    pts_c = pts_c * flip

    # Weighted Procrustes (Kabsch): R, t with pts_c ~= R @ points_3d + t.
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(points_3d * w[:, None], axis=0) / wsum
    cc = jnp.sum(pts_c * w[:, None], axis=0) / wsum
    h = heinsum("ni,nj,n->ij", points_3d - cw, pts_c - cc, w)
    uu, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(hmatmul(vt.T, uu.T))
    d = jnp.array([1.0, 1.0, 0.0], f32)
    diag = jnp.diag(jnp.concatenate([d[:2], det[None]]))
    rot = hmatmul(vt.T, hmatmul(diag, uu.T))
    t = cc - heinsum("ij,j->i", rot, cw)
    return rot, t
