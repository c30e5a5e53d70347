"""Pallas TPU kernel: batched uniform-weight EPnP hypothesis solver.

The RANSAC selection stage solves one EPnP per (image, class, vote) —
26k+ solves per batch-64 inference step. As plain XLA (vmap of
pose/epnp.py:epnp_fast) that lowers to hundreds of small batched HLO ops
with HBM traffic between fusions (~2.9 ms/step measured on v5e, the
largest remaining pose-stage cost). This kernel fuses the whole solve —
normal-matrix assembly, 12x12 Cholesky + inverse iteration for the null
vector, control-point scale/sign fix, Horn quaternion — into ONE program.

Layout (same scheme as pose/pallas_refine.py): solves ride the LANE axis,
every per-solve scalar is a (1, LB) row, so the entire solver is
lane-parallel VPU work. The grid splits the solve axis into LB-lane blocks.

Exploited structure vs the generic epnp_fast:
- hypothesis solves use UNIFORM weights (ransac.py:_ransac_select solves
  with ones8), so the barycentric Gram matrix A = sum_i a_i a_i^T, the
  world centroid, and the centered world points are per-class CONSTANTS,
  hoisted by `epnp_kernel_constants`;
- the (2n x 12) design matrix is never materialized: MtM's 78 unique
  entries decompose into fx/fy-scaled combinations of A and three
  data-dependent 4x4 reductions (B, C, D below).

Numerics match epnp_fast to f32 rounding; tests/test_pallas_epnp.py pins
parity in interpreter mode. RansacConfig.pallas_epnp selects the kernel on
TPU inside build_inference_fn.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PAIRS4 = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3),
           (2, 2), (2, 3), (3, 3)]  # upper-tri of a symmetric 4x4
_PAIRS4_IDX = {p: i for i, p in enumerate(_PAIRS4)}
_OFFD4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def epnp_kernel_constants(precomp: dict) -> dict:
    """Per-class constants for the kernel from epnp_precompute output.

    Accepts stacked precomp (leading class axis, precompute_class_solvers)
    or a single class. Returns numpy arrays keyed for `epnp_batched_pallas`:
    alphas (C, 32), amat (C, 10), dw6 (C, 6), cw (C, 3), p3c (C, 24).
    """
    alphas = np.asarray(precomp["alphas"], np.float32)
    single = alphas.ndim == 2
    if single:
        alphas = alphas[None]
    pts = np.asarray(precomp["points_3d"], np.float32)
    cw = np.asarray(precomp["cw"], np.float32)
    dw = np.asarray(precomp["dw"], np.float32)
    if single:
        pts, cw, dw = pts[None], cw[None], dw[None]
    c = alphas.shape[0]
    amat = np.einsum("cia,cib->cab", alphas, alphas)  # (C, 4, 4)
    out = {
        "alphas": alphas.reshape(c, -1),
        "amat": np.stack([amat[:, i, j] for i, j in _PAIRS4], axis=1),
        "dw6": np.stack([dw[:, i, j] for i, j in _OFFD4], axis=1),
        "cw": cw,
        "p3c": (pts - cw[:, None, :]).reshape(c, -1),
    }
    if single:
        out = {k: v[0] for k, v in out.items()}
    return out


def _epnp_kernel(
    uv_ref,       # (16, LB): u rows 0..7, v rows 8..15
    alphas_ref,   # (32, LB): a[i, j] at row i*4+j
    amat_ref,     # (10, LB): A upper-tri (pairs _PAIRS4)
    dw6_ref,      # (6, LB): world ctrl-point distances (pairs _OFFD4)
    p3c_ref,      # (24, LB): centered world points, row i*3+d
    cw_ref,       # (3, LB)
    cam_ref,      # (4, LB)
    rot_out_ref,  # (9, LB)
    trans_out_ref,  # (3, LB)
    *,
    n_points: int,
    null_iters: int,
    horn_iters: int,
):
    n = n_points
    u = [uv_ref[i : i + 1, :] for i in range(n)]
    v = [uv_ref[n + i : n + i + 1, :] for i in range(n)]
    a = [[alphas_ref[i * 4 + j : i * 4 + j + 1, :] for j in range(4)]
         for i in range(n)]
    fx = cam_ref[0:1, :]
    fy = cam_ref[1:2, :]
    cx = cam_ref[2:3, :]
    cy = cam_ref[3:4, :]

    # data-dependent 4x4 reductions over the n points:
    #   B[j,j'] = sum_i a_ij a_ij' (cx - u_i)
    #   C[j,j'] = sum_i a_ij a_ij' (cy - v_i)
    #   D[j,j'] = sum_i a_ij a_ij' ((cx-u_i)^2 + (cy-v_i)^2)
    cu = [cx - u[i] for i in range(n)]
    cv = [cy - v[i] for i in range(n)]
    amat = [amat_ref[p : p + 1, :] for p in range(10)]

    def sym4(idx_fn):
        m = [[None] * 4 for _ in range(4)]
        for j in range(4):
            for jp in range(j, 4):
                val = idx_fn(j, jp)
                m[j][jp] = val
                m[jp][j] = val
        return m

    def reduce_pairs(term):
        vals = {}
        for j in range(4):
            for jp in range(j, 4):
                s = None
                for i in range(n):
                    t = a[i][j] * a[i][jp] * term(i)
                    s = t if s is None else s + t
                vals[(j, jp)] = s
        return sym4(lambda j, jp: vals[(min(j, jp), max(j, jp))])

    A = sym4(lambda j, jp: amat[_PAIRS4_IDX[(min(j, jp), max(j, jp))]])
    B = reduce_pairs(lambda i: cu[i])
    C = reduce_pairs(lambda i: cv[i])
    D = reduce_pairs(lambda i: cu[i] * cu[i] + cv[i] * cv[i])

    # MtM assembly: column 3j+k, k in {x-row, y-row, uv-row}
    fx2 = fx * fx
    fy2 = fy * fy
    zero = jnp.zeros_like(fx)

    def mtm(col, colp):
        j, k = col // 3, col % 3
        jp, kp = colp // 3, colp % 3
        if (k, kp) == (0, 0):
            return fx2 * A[j][jp]
        if (k, kp) == (1, 1):
            return fy2 * A[j][jp]
        if (k, kp) in ((0, 2), (2, 0)):
            return fx * B[j][jp]
        if (k, kp) in ((1, 2), (2, 1)):
            return fy * C[j][jp]
        if (k, kp) == (2, 2):
            return D[j][jp]
        return zero  # (0,1)/(1,0): x- and y-rows never share a column pair

    m = [[mtm(i, j) if j >= i else None for j in range(12)] for i in range(12)]
    # shifted for SPD-ness (epnp.py:smallest_eigvec_12)
    trace = None
    for i in range(12):
        trace = m[i][i] if trace is None else trace + m[i][i]
    shift = (1e-7 / 12.0) * trace
    for i in range(12):
        m[i][i] = m[i][i] + shift

    # unrolled 12x12 Cholesky (utils/smallmat.py semantics)
    L = [[None] * 12 for _ in range(12)]
    for i in range(12):
        for j in range(i + 1):
            s = m[j][i]  # upper-tri storage
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]

    # inverse iteration for the null vector
    x = [jnp.full_like(fx, 1.0 / np.sqrt(12.0)) for _ in range(12)]
    for _ in range(null_iters):
        y = []
        for i in range(12):
            s = x[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y.append(s / L[i][i])
        xn = [None] * 12
        for i in reversed(range(12)):
            s = y[i]
            for k in range(i + 1, 12):
                s = s - L[k][i] * xn[k]
            xn[i] = s / L[i][i]
        norm = None
        for i in range(12):
            t = xn[i] * xn[i]
            norm = t if norm is None else norm + t
        inv = 1.0 / jnp.maximum(jnp.sqrt(norm), 1e-30)
        x = [xn[i] * inv for i in range(12)]

    ctrl = [[x[j * 3 + d] for d in range(3)] for j in range(4)]  # camera frame

    # scale from world control-point distances (beta)
    num = None
    den = None
    for p, (i, j) in enumerate(_OFFD4):
        d2 = None
        for d in range(3):
            t = (ctrl[i][d] - ctrl[j][d]) ** 2
            d2 = t if d2 is None else d2 + t
        dc = jnp.sqrt(d2 + 1e-12)
        dwp = dw6_ref[p : p + 1, :]
        num = dc * dwp if num is None else num + dc * dwp
        den = dc * dc if den is None else den + dc * dc
    beta = num / jnp.maximum(den, 1e-12)
    ctrl = [[ctrl[j][d] * beta for d in range(3)] for j in range(4)]

    # camera-frame points + cheirality sign fix (uniform weights)
    pc = [[None] * 3 for _ in range(n)]
    for i in range(n):
        for d in range(3):
            s = None
            for j in range(4):
                t = a[i][j] * ctrl[j][d]
                s = t if s is None else s + t
            pc[i][d] = s
    mean_z = None
    for i in range(n):
        mean_z = pc[i][2] if mean_z is None else mean_z + pc[i][2]
    flip = jnp.where(mean_z < 0.0, -1.0, 1.0)
    for i in range(n):
        for d in range(3):
            pc[i][d] = pc[i][d] * flip

    # camera centroid and the 3x3 correlation H = sum_i p3c_i (pc_i - cc)^T
    cc = []
    inv_n = 1.0 / n
    for d in range(3):
        s = None
        for i in range(n):
            s = pc[i][d] if s is None else s + pc[i][d]
        cc.append(s * inv_n)
    H = [[None] * 3 for _ in range(3)]
    for da in range(3):
        for db in range(3):
            s = None
            for i in range(n):
                t = p3c_ref[i * 3 + da : i * 3 + da + 1, :] * (pc[i][db] - cc[db])
                s = t if s is None else s + t
            H[da][db] = s

    # Horn quaternion: dominant eigenvector of the symmetric 4x4 K
    sxx, sxy, sxz = H[0][0], H[0][1], H[0][2]
    syx, syy, syz = H[1][0], H[1][1], H[1][2]
    szx, szy, szz = H[2][0], H[2][1], H[2][2]
    K = [[sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
         [None, sxx - syy - szz, sxy + syx, szx + sxz],
         [None, None, syy - sxx - szz, syz + szy],
         [None, None, None, szz - sxx - syy]]
    for i in range(4):
        for j in range(i):
            K[i][j] = K[j][i]
    k2 = None
    for i in range(4):
        for j in range(4):
            t = K[i][j] * K[i][j]
            k2 = t if k2 is None else k2 + t
    kshift = jnp.sqrt(k2) + 1e-12
    q = [jnp.full_like(fx, 0.5) for _ in range(4)]
    for _ in range(horn_iters):
        qn = []
        for i in range(4):
            s = kshift * q[i]
            for j in range(4):
                s = s + K[i][j] * q[j]
            qn.append(s)
        norm = None
        for i in range(4):
            t = qn[i] * qn[i]
            norm = t if norm is None else norm + t
        inv = 1.0 / jnp.maximum(jnp.sqrt(norm), 1e-30)
        q = [qn[i] * inv for i in range(4)]
    qw, qx, qy, qz = q
    r = [
        1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw),
        2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw),
        2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy),
    ]
    cw = [cw_ref[d : d + 1, :] for d in range(3)]
    t_out = [
        cc[0] - (r[0] * cw[0] + r[1] * cw[1] + r[2] * cw[2]),
        cc[1] - (r[3] * cw[0] + r[4] * cw[1] + r[5] * cw[2]),
        cc[2] - (r[6] * cw[0] + r[7] * cw[1] + r[8] * cw[2]),
    ]
    rot_out_ref[:, :] = jnp.concatenate(r, axis=0)
    trans_out_ref[:, :] = jnp.concatenate(t_out, axis=0)


def epnp_batched_pallas(
    points_2d: jnp.ndarray,   # (I, n, 2)
    alphas: jnp.ndarray,      # (I, n*4)
    amat: jnp.ndarray,        # (I, 10)
    dw6: jnp.ndarray,         # (I, 6)
    p3c: jnp.ndarray,         # (I, n*3)
    cw: jnp.ndarray,          # (I, 3)
    cam: jnp.ndarray,         # (I, 4)
    null_iters: int = 3,
    horn_iters: int = 10,
    lane_block: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform-weight EPnP over I independent solves in one fused kernel.

    Per-class constants come from `epnp_kernel_constants`, broadcast to the
    solve axis by the caller. Returns (rot (I, 3, 3), trans (I, 3)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    i_n = points_2d.shape[0]
    n = points_2d.shape[1]
    lb = lane_block
    pad_i = (-i_n) % lb
    ii = i_n + pad_i

    def to_lanes(x, rows):
        x = jnp.asarray(x, f32).reshape(i_n, rows).T
        # edge-pad: padded lanes carry a copy of the last real solve, so
        # every lane computes well-posed math (results are sliced away)
        return jnp.pad(x, ((0, 0), (0, pad_i)), mode="edge")

    uv = jnp.concatenate(
        [to_lanes(points_2d[..., 0], n), to_lanes(points_2d[..., 1], n)],
        axis=0,
    )
    inputs = (
        uv,
        to_lanes(alphas, n * 4),
        to_lanes(amat, 10),
        to_lanes(dw6, 6),
        to_lanes(p3c, n * 3),
        to_lanes(cw, 3),
        to_lanes(cam, 4),
    )
    grid = (ii // lb,)
    kernel = partial(
        _epnp_kernel, n_points=n, null_iters=null_iters, horn_iters=horn_iters
    )
    rot_out, trans_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((9, ii), f32),
            jax.ShapeDtypeStruct((3, ii), f32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((x.shape[0], lb), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for x in inputs
        ],
        out_specs=(
            pl.BlockSpec((9, lb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*inputs)

    rot = rot_out[:, :i_n].T.reshape(i_n, 3, 3)
    trans = trans_out[:, :i_n].T
    return rot, trans
