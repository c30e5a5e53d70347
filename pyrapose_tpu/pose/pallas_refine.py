"""Pallas TPU kernel: batched uncertainty-weighted Gauss-Newton pose refine.

The GN polish (pose/refine.py) is the last hot stage of the on-device
RANSAC-PnP pipeline. As plain XLA it lowers to ~50 small HLO ops per
iteration (Jacobian pieces, 21 JtJ entries, an unrolled 6x6 Cholesky,
Rodrigues update) with HBM traffic between fusions; per training-size batch
that costs a few milliseconds of pure launch/latency overhead. This kernel
fuses all `iterations` GN steps into ONE Pallas program with every operand
resident in VMEM.

Layout: instances ride the LANE axis (last dim, padded to 128); the N
correspondence points ride sublanes. All per-instance scalars are (1, I)
rows, so the entire solver — including the unrolled Cholesky — is
lane-parallel VPU work with reductions only over sublanes.

Numerics match pose/refine.py:refine_pose (same damping, same left-
multiplicative SE(3) update); tests/test_pallas_refine.py asserts parity in
interpreter mode on CPU and the RansacConfig flag `pallas_refine` selects
the kernel on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gn_kernel(
    obs_ref,      # (2*N, I) stacked u rows then v rows
    p3_ref,       # (3*N, I) stacked x/y/z rows of object points
    w_ref,        # (N, I)
    rot_ref,      # (9, I) row-major R0
    trans_ref,    # (3, I)
    cam_ref,      # (4, I)
    rot_out_ref,  # (9, I)
    trans_out_ref,  # (3, I)
    *,
    n_points: int,
    iterations: int,
    damping: float,
):
    n = n_points
    obs_u = obs_ref[:n, :]
    obs_v = obs_ref[n:, :]
    p3x = p3_ref[:n, :]
    p3y = p3_ref[n : 2 * n, :]
    p3z = p3_ref[2 * n :, :]
    w = jnp.maximum(w_ref[:, :], 0.0)
    fx = cam_ref[0:1, :]
    fy = cam_ref[1:2, :]
    cx = cam_ref[2:3, :]
    cy = cam_ref[3:4, :]

    r = [rot_ref[k : k + 1, :] for k in range(9)]  # (1, I) each
    t = [trans_ref[k : k + 1, :] for k in range(3)]

    for _ in range(iterations):
        # camera-frame points (N, I)
        pcx = r[0] * p3x + r[1] * p3y + r[2] * p3z + t[0]
        pcy = r[3] * p3x + r[4] * p3y + r[5] * p3z + t[1]
        pcz = r[6] * p3x + r[7] * p3y + r[8] * p3z + t[2]
        z = jnp.where(jnp.abs(pcz) < 1e-6, 1e-6, pcz)
        inv_z = 1.0 / z
        ru = fx * pcx * inv_z + cx - obs_u  # residuals (N, I)
        rv = fy * pcy * inv_z + cy - obs_v

        # d(pix)/d(p_cam) rows: row_u = [a, 0, b], row_v = [0, c, d]
        a = fx * inv_z                      # du/dx
        b = -fx * pcx * inv_z * inv_z       # du/dz
        c = fy * inv_z                      # dv/dy
        d = -fy * pcy * inv_z * inv_z       # dv/dz
        # Jacobian columns k=0..2 rotation, 3..5 translation (refine.py's
        # [j_rot | j_proj] order). j_rot = -row @ [p]x with
        # [p]x columns: col0 = (0, z, -y), col1 = (-z, 0, x), col2 = (y, -x, 0)
        ju0 = b * pcy
        ju1 = a * pcz - b * pcx
        ju2 = -(a * pcy)
        jv0 = -(c * pcz) + d * pcy
        jv1 = -(d * pcx)
        jv2 = c * pcx
        ju = [ju0, ju1, ju2, a, jnp.zeros_like(a), b]
        jv = [jv0, jv1, jv2, jnp.zeros_like(c), c, d]

        # normal equations: 21 upper-triangle entries + rhs, each (1, I)
        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        jtj = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                jtj[i][j] = rsum(w * (ju[i] * ju[j] + jv[i] * jv[j]))
        jtr = [rsum(w * (ju[i] * ru + jv[i] * rv)) for i in range(6)]
        for i in range(6):
            jtj[i][i] = jtj[i][i] + damping * (1.0 + jtj[i][i])

        # unrolled Cholesky LL^T on (1, I) lanes
        L = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i + 1):
                s = jtj[j][i]  # upper-triangle storage: (min, max) index
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                if i == j:
                    L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
                else:
                    L[i][j] = s / L[j][j]
        # forward/backward solve for delta = -(JtJ)^-1 Jtr
        y = []
        for i in range(6):
            s = -jtr[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y.append(s / L[i][i])
        delta = [None] * 6
        for i in reversed(range(6)):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * delta[k]
            delta[i] = s / L[i][i]

        # Rodrigues dR from delta[0:3], applied left: R <- dR R, t <- dR t + dt
        wx, wy, wz = delta[0], delta[1], delta[2]
        angle2 = wx * wx + wy * wy + wz * wz
        angle = jnp.sqrt(angle2 + 1e-30)
        s_ = jnp.sin(angle) / angle
        c_ = (1.0 - jnp.cos(angle)) / (angle2 + 1e-30)
        # dR = I + s [w]x + c [w]x^2
        d00 = 1.0 + c_ * (-(wy * wy + wz * wz))
        d01 = -s_ * wz + c_ * wx * wy
        d02 = s_ * wy + c_ * wx * wz
        d10 = s_ * wz + c_ * wx * wy
        d11 = 1.0 + c_ * (-(wx * wx + wz * wz))
        d12 = -s_ * wx + c_ * wy * wz
        d20 = -s_ * wy + c_ * wx * wz
        d21 = s_ * wx + c_ * wy * wz
        d22 = 1.0 + c_ * (-(wx * wx + wy * wy))

        nr = [
            d00 * r[0] + d01 * r[3] + d02 * r[6],
            d00 * r[1] + d01 * r[4] + d02 * r[7],
            d00 * r[2] + d01 * r[5] + d02 * r[8],
            d10 * r[0] + d11 * r[3] + d12 * r[6],
            d10 * r[1] + d11 * r[4] + d12 * r[7],
            d10 * r[2] + d11 * r[5] + d12 * r[8],
            d20 * r[0] + d21 * r[3] + d22 * r[6],
            d20 * r[1] + d21 * r[4] + d22 * r[7],
            d20 * r[2] + d21 * r[5] + d22 * r[8],
        ]
        nt = [
            d00 * t[0] + d01 * t[1] + d02 * t[2] + delta[3],
            d10 * t[0] + d11 * t[1] + d12 * t[2] + delta[4],
            d20 * t[0] + d21 * t[1] + d22 * t[2] + delta[5],
        ]
        r, t = nr, nt

    rot_out_ref[:, :] = jnp.concatenate(r, axis=0)
    trans_out_ref[:, :] = jnp.concatenate(t, axis=0)


def refine_pose_batched_pallas(
    rot0: jnp.ndarray,      # (I, 3, 3)
    trans0: jnp.ndarray,    # (I, 3)
    points_2d: jnp.ndarray,  # (I, N, 2)
    points_3d: jnp.ndarray,  # (I, N, 3)
    weights: jnp.ndarray,   # (I, N)
    cam: jnp.ndarray,       # (I, 4)
    iterations: int = 5,
    damping: float = 1e-3,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched GN refinement as one fused Pallas program.

    Instance-batched counterpart of pose/refine.py:refine_pose (identical
    math). `interpret=True` runs the kernel in the Pallas interpreter —
    the CPU test path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    i_n = rot0.shape[0]
    n = points_2d.shape[1]
    pad_i = (-i_n) % 128
    ii = i_n + pad_i

    def to_lanes(x, rows):
        """(I, rows...) -> (rows, ii) f32 with zero padding on lanes."""
        x = jnp.asarray(x, f32).reshape(i_n, rows).T
        return jnp.pad(x, ((0, 0), (0, pad_i)))

    obs = jnp.concatenate(
        [to_lanes(points_2d[..., 0], n), to_lanes(points_2d[..., 1], n)], axis=0
    )
    p3 = jnp.concatenate(
        [
            to_lanes(points_3d[..., 0], n),
            to_lanes(points_3d[..., 1], n),
            to_lanes(points_3d[..., 2], n),
        ],
        axis=0,
    )
    w = to_lanes(weights, n)
    rot_rows = to_lanes(rot0.reshape(i_n, 9), 9)
    # padded lanes get identity-ish data to keep the solver well-posed
    eye = jnp.tile(jnp.eye(3, dtype=f32).reshape(9, 1), (1, ii))
    lane_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ii), 1) < i_n
    )
    rot_rows = jnp.where(lane_valid, rot_rows, eye)
    trans_rows = to_lanes(trans0, 3)
    trans_rows = jnp.where(lane_valid, trans_rows, 1.0)
    cam_rows = to_lanes(cam, 4)
    cam_rows = jnp.where(lane_valid, cam_rows, 500.0)

    kernel = partial(
        _gn_kernel, n_points=n, iterations=iterations, damping=damping
    )
    rot_out, trans_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((9, ii), f32),
            jax.ShapeDtypeStruct((3, ii), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(obs, p3, w, rot_rows, trans_rows, cam_rows)

    rot = rot_out[:, :i_n].T.reshape(i_n, 3, 3)
    trans = trans_out[:, :i_n].T
    return rot, trans


def refine_pose_batched(
    rot0, trans0, points_2d, points_3d, weights, cam,
    iterations: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-JAX reference: vmap of refine_pose over instances."""
    from pyrapose_tpu.pose.refine import refine_pose

    return jax.vmap(
        lambda r, t, p2, p3, w, k: refine_pose(
            r, t, p2, p3, w, k, iterations=iterations
        )
    )(rot0, trans0, points_2d, points_3d, weights, cam)
