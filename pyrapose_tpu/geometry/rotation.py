"""Rotation representations: quaternion / euler / axis-angle <-> matrix.

Batched, jit-friendly replacements for the reference's host-side transforms3d
calls (quaternion convention is (w, x, y, z), matching
tf3d.quaternions.quat2mat used at /root/reference/PyraPose/utils/anchors.py:207;
euler convention is static 'sxyz', matching tf3d.euler.euler2mat defaults used
by the T-LESS loader, preprocessing/tless.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) in (w, x, y, z) order -> rotation matrix (..., 3, 3).

    Normalizes the quaternion first (transforms3d tolerates non-unit input).
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def matrix_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) in (w, x, y, z).

    Branch-free Shepperd-style construction: compute all four candidate
    quaternions and select the best-conditioned one with `where`, so it traces
    to static-shape XLA ops.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot term is largest.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    # Pick candidate by argmax of (tr, m00, m11, m22).
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def euler_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Static-frame XYZ euler angles (..., 3) -> rotation (..., 3, 3).

    Equivalent to transforms3d.euler.euler2mat(ax, ay, az, 'sxyz'):
    R = Rz(az) @ Ry(ay) @ Rx(ax).
    """
    ax, ay, az = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    r00 = cy * cz
    r01 = sx * sy * cz - cx * sz
    r02 = cx * sy * cz + sx * sz
    r10 = cy * sz
    r11 = sx * sy * sz + cx * cz
    r12 = cx * sy * sz - sx * cz
    r20 = -sy
    r21 = sx * cy
    r22 = cx * cy
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def axis_angle_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector (..., 3) -> rotation matrix (..., 3, 3).

    Safe at theta -> 0 via second-order Taylor blending; used by the on-device
    Gauss-Newton PnP refinement (pose/refine.py). Assembled purely elementwise
    (K^2 = r r^T - theta^2 I), with no matmul: JAX's default matmul precision
    on TPU is bf16, which would silently cost ~1e-2 absolute error here.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))

    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    # R = (1 - b*theta^2) I + a K + b r r^T
    diag = 1.0 - b * theta2
    bxx, byy, bzz = b * x * x, b * y * y, b * z * z
    bxy, bxz, byz = b * x * y, b * x * z, b * y * z
    ax, ay, az = a * x, a * y, a * z
    rows = [
        jnp.stack([diag + bxx, bxy - az, bxz + ay], axis=-1),
        jnp.stack([bxy + az, diag + byy, byz - ax], axis=-1),
        jnp.stack([bxz - ay, byz + ax, diag + bzz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)
