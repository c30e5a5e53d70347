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

import jax
import jax.scipy.linalg
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


def smallest_eigvec_12(mtm: jnp.ndarray, iterations: int = 3) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a PSD 12x12 via shifted
    inverse iteration.

    TPU-shaped replacement for jnp.linalg.eigh: the full Jacobi/QR
    eigendecomposition serializes badly on the scalar units, while inverse
    iteration is one Cholesky factorization (MtM is PSD) plus a few
    triangular solves — all UNROLLED (utils/smallmat.py) so the thousands
    of per-hypothesis systems batch into pure vectorized elementwise work
    instead of a sequential LU custom call per system. EPnP's MtM has a
    near-zero smallest eigenvalue (the null space), so convergence is one
    or two iterations; 3 adds margin.
    """
    from pyrapose_tpu.utils.smallmat import inverse_iteration_spd

    f32 = mtm.dtype
    shift = 1e-7 * jnp.trace(mtm) / 12.0
    a = mtm + shift * jnp.eye(12, dtype=f32)
    return inverse_iteration_spd(a, 12, iterations)


def horn_rotation(h: jnp.ndarray, iterations: int = 10) -> jnp.ndarray:
    """Optimal rotation from a 3x3 correlation matrix via Horn's quaternion
    method: largest eigenvector of the symmetric 4x4 K matrix by shifted
    power iteration (batched 4x4 matvecs — no SVD custom call, and no
    reflection case to patch up)."""
    f32 = h.dtype
    sxx, sxy, sxz = h[0, 0], h[0, 1], h[0, 2]
    syx, syy, syz = h[1, 0], h[1, 1], h[1, 2]
    szx, szy, szz = h[2, 0], h[2, 1], h[2, 2]
    k = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, syy - sxx - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, szz - sxx - syy],
        ],
        f32,
    )
    # shift so the target (largest) eigenvalue is the dominant one
    shift = jnp.sqrt(jnp.sum(k * k)) + 1e-12
    a = k + shift * jnp.eye(4, dtype=f32)
    q = jnp.full((4,), 0.5, f32)
    for _ in range(iterations):
        q = a @ q
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-30)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        f32,
    )


def epnp_precompute(points_3d, weights=None):
    """Host-side per-point-set constants for `epnp_fast`.

    The control points, barycentric coordinates, and centroid depend only on
    the 3D point set (per class, static at trace time) — hoisting them out
    of the per-hypothesis solve removes a 3x3 eigh and a 3x3 solve from the
    hot path entirely.

    Returns a dict of numpy arrays {alphas (n,4), ctrl_w (4,3), dw (4,4),
    cw (3,), points_3d (n,3)}.
    """
    import numpy as np

    pts = np.asarray(points_3d, np.float32)
    w = (
        np.ones(len(pts), np.float32)
        if weights is None
        else np.asarray(weights, np.float32)
    )
    wsum = max(float(w.sum()), 1e-9)
    centroid = (pts * w[:, None]).sum(axis=0) / wsum
    centered = pts - centroid
    cov = (centered[:, :, None] * centered[:, None, :] * w[:, None, None]).sum(0) / wsum
    eigval, eigvec = np.linalg.eigh(cov)
    scale = np.sqrt(np.maximum(eigval, 1e-8))
    axes = eigvec * scale[None, :]
    ctrl_w = np.concatenate([centroid[None], centroid[None] + axes.T], axis=0)
    basis = (ctrl_w[1:] - ctrl_w[0]).T
    a123 = np.linalg.solve(basis, (pts - ctrl_w[0]).T).T
    alphas = np.concatenate([1.0 - a123.sum(1, keepdims=True), a123], axis=1)
    diff_w = ctrl_w[:, None, :] - ctrl_w[None, :, :]
    dw = np.sqrt((diff_w**2).sum(-1) + 1e-12)
    return {
        "alphas": alphas.astype(np.float32),
        "ctrl_w": ctrl_w.astype(np.float32),
        "dw": dw.astype(np.float32),
        "cw": centroid.astype(np.float32),
        "points_3d": pts,
    }


def epnp_fast(
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
    precomp: dict,
    cam: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP with precomputed 3D-side constants (see epnp_precompute).

    Identical math to `epnp` but with the hot path reduced to: build the
    (2n x 12) system, one 12x12 LU + inverse iteration for the null vector,
    scale/sign fix, and a quaternion power iteration for the rotation. All
    steps are dense batched linear algebra — vmap freely.
    """
    f32 = jnp.float32
    points_2d = points_2d.astype(f32)
    w = jnp.maximum(weights.astype(f32), 0.0)
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    alphas = jnp.asarray(precomp["alphas"])
    dw = jnp.asarray(precomp["dw"])
    cw = jnp.asarray(precomp["cw"])
    points_3d = jnp.asarray(precomp["points_3d"])

    u = points_2d[:, 0]
    v = points_2d[:, 1]
    sw = jnp.sqrt(w)[:, None]
    zeros = jnp.zeros_like(alphas)
    rx = jnp.stack([alphas * fx, zeros, alphas * (cx - u)[:, None]], axis=-1)
    ry = jnp.stack([zeros, alphas * fy, alphas * (cy - v)[:, None]], axis=-1)
    m = jnp.concatenate(
        [rx.reshape(-1, 12) * sw, ry.reshape(-1, 12) * sw], axis=0
    )
    mtm = hmatmul(m.T, m)
    null = smallest_eigvec_12(mtm)
    ctrl_c = null.reshape(4, 3)

    diff_c = ctrl_c[:, None, :] - ctrl_c[None, :, :]
    dc = jnp.sqrt(jnp.sum(diff_c**2, axis=-1) + 1e-12)
    beta = jnp.sum(dc * dw) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    ctrl_c = ctrl_c * beta

    pts_c = hmatmul(alphas, ctrl_c)
    mean_z = jnp.sum(pts_c[:, 2] * w) / jnp.maximum(jnp.sum(w), 1e-9)
    flip = jnp.where(mean_z < 0.0, -1.0, 1.0)
    pts_c = pts_c * flip

    # runtime weighted centroids (alphas/ctrl basis are weight-independent,
    # so hoisting them is exact for any runtime weights; centroids are not)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw_rt = jnp.sum(points_3d * w[:, None], axis=0) / wsum
    cc = jnp.sum(pts_c * w[:, None], axis=0) / wsum
    del cw
    h = heinsum("ni,nj,n->ij", points_3d - cw_rt, pts_c - cc, w)
    rot = horn_rotation(h)
    t = cc - heinsum("ij,j->i", rot, cw_rt)
    return rot, t


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
