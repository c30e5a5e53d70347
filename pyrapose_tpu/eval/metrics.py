"""Pose-error metrics (Hodan et al. suite), vectorized on device.

Replaces the reference's scipy/numpy implementations
(/root/reference/PyraPose/utils/pose_error.py:105-275):

- add (pose_error.py:210-224): mean point distance under the two poses.
- adi (pose_error.py:227-246): for symmetric objects — for each GT-posed
  point, the distance to the *nearest* estimated-posed point. The reference
  uses a cKDTree; here it is a tiled pairwise-distance min, which XLA maps to
  MXU-friendly matrix ops (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b) — batched over
  detections instead of looping images on the host.
- re / te (pose_error.py:249-275), reproj (pose_error.py:179-207).

Model clouds are subsampled to a fixed size by the dataset spec, keeping
shapes static.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyrapose_tpu.geometry.projection import project_points, transform_points
from pyrapose_tpu.utils.precision import heinsum


def add_metric(
    rot_est: jnp.ndarray,
    t_est: jnp.ndarray,
    rot_gt: jnp.ndarray,
    t_gt: jnp.ndarray,
    points: jnp.ndarray,
) -> jnp.ndarray:
    """Average distance of model points (ADD). Shapes: (..., 3, 3)/(..., 3)/(..., N, 3)."""
    pe = transform_points(points, rot_est, t_est)
    pg = transform_points(points, rot_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


def adi_metric(
    rot_est: jnp.ndarray,
    t_est: jnp.ndarray,
    rot_gt: jnp.ndarray,
    t_gt: jnp.ndarray,
    points: jnp.ndarray,
) -> jnp.ndarray:
    """Average closest-point distance (ADD-S / ADI) for symmetric objects."""
    pe = transform_points(points, rot_est, t_est)  # (..., N, 3)
    pg = transform_points(points, rot_gt, t_gt)
    # pairwise squared distances via the Gram expansion (MXU-friendly)
    sq_e = jnp.sum(pe * pe, axis=-1)
    sq_g = jnp.sum(pg * pg, axis=-1)
    cross = heinsum("...nd,...md->...nm", pg, pe)
    d2 = sq_g[..., :, None] + sq_e[..., None, :] - 2.0 * cross
    nearest = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    return jnp.mean(nearest, axis=-1)


def rotation_error_deg(rot_est: jnp.ndarray, rot_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees (pose_error.py re)."""
    prod = heinsum("...ij,...kj->...ik", rot_est, rot_gt)  # R_est @ R_gt^T
    tr = prod[..., 0, 0] + prod[..., 1, 1] + prod[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_est: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """Euclidean translation error (pose_error.py te)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def reprojection_error(
    rot_est: jnp.ndarray,
    t_est: jnp.ndarray,
    rot_gt: jnp.ndarray,
    t_gt: jnp.ndarray,
    points: jnp.ndarray,
    cam: jnp.ndarray,
) -> jnp.ndarray:
    """Mean 2D reprojection distance in pixels (pose_error.py reproj)."""
    pe = project_points(transform_points(points, rot_est, t_est), cam)
    pg = project_points(transform_points(points, rot_gt, t_gt), cam)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)
