"""Pinhole projection and rigid transforms, batched for TPU.

Replaces the reference's per-annotation numpy loops (toPix_array,
/root/reference/PyraPose/utils/anchors.py:562-567) with broadcast ops that run
inside jit as part of target generation and PnP.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrapose_tpu.utils.precision import heinsum


def transform_points(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform: R @ p + t.

    Args:
        points: (..., N, 3).
        rot: (..., 3, 3).
        trans: (..., 3).

    Returns:
        (..., N, 3) transformed points. Contraction runs at HIGHEST precision
        (the bf16 MXU default would corrupt pose geometry).
    """
    return heinsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]


def project_points(points_cam: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame 3D points to pixels.

    Args:
        points_cam: (..., N, 3) points in the camera frame.
        cam: (..., 4) intrinsics as (fx, fy, cx, cy) — the reference's
            cam_params layout (preprocessing/linemod.py:56-62).

    Returns:
        (..., N, 2) pixel coordinates.
    """
    fx = cam[..., 0:1]
    fy = cam[..., 1:2]
    cx = cam[..., 2:3]
    cy = cam[..., 3:4]
    z = points_cam[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = points_cam[..., 0] * fx / z + cx
    v = points_cam[..., 1] * fy / z + cy
    return jnp.stack([u, v], axis=-1)


def project_box3d(
    corners_obj: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray, cam: jnp.ndarray
) -> jnp.ndarray:
    """Project the 8 object-frame box corners to a flat (..., 16) pixel vector.

    Interleaved (x0, y0, ..., x7, y7) — the reference's box3D layout
    (anchors.py:213-215).
    """
    pts = transform_points(corners_obj, rot, trans)
    pix = project_points(pts, cam)  # (..., 8, 2)
    return pix.reshape(pix.shape[:-2] + (16,))
