#!/usr/bin/env python3
"""Generate a 13-object procedural mesh set (LineMOD-shaped) for the
full-scale synthetic training recipe (docs/USAGE.md).

The environment ships no BOP meshes; these procedural solids stand in for
the 13 LineMOD objects so `pyrapose render-synthetic` + `pyrapose train`
can run the end-to-end accuracy recipe. Sizes are in LineMOD's physical
ballpark (60-300 mm extents, meshes in mm like BOP models).

Shape design is driven by the pose-ambiguity problem the reference solves
with symmetry canonicalization (annotate_BOP.py:45-87):

- 11 of the 13 classes are *globally asymmetric* (tapers, shears, offset
  apexes, graded tube radii) so that every viewpoint determines a unique
  pose and plain ADD < 0.1d is a fair training/eval target. A local "tab"
  would not be enough — it hides behind the body for half the views.
- Classes 10 and 11 mirror LineMOD's eggbox/glue (the two ADI classes of
  linemod_eval.py:525-531): each is built as body + two tabs at p and
  Ry180*p, giving an *exact* order-2 symmetry group {I, Ry180} and nothing
  more. models_info declares it via BOP `symmetries_discrete`, and
  `render-synthetic` canonicalizes sampled poses with it (the 90-deg test
  merges R and R*S because Ry180 flips the object z-axis).

Usage: python scripts/make_demo_meshes.py OUT_DIR [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _quad_faces(n: int, ring_a: int, ring_b: int) -> list[list[int]]:
    """Triangulate between two rings of n vertices (indices start at
    ring_a/ring_b)."""
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[ring_a + i, ring_b + i, ring_a + j],
                  [ring_a + j, ring_b + i, ring_b + j]]
    return faces


def _mesh_taper_box(ex, ey, ez, taper=0.55, shift=(0.25, 0.15)):
    """Rectangular frustum: top face scaled by `taper` and shifted — no two
    faces are congruent, so the solid has no rotational symmetry."""
    x, y, z = ex / 2, ey / 2, ez / 2
    sx, sy = shift[0] * ex, shift[1] * ey
    bot = [[-x, -y, -z], [x, -y, -z], [x, y, -z], [-x, y, -z]]
    top = [[-x * taper + sx, -y * taper + sy, z],
           [x * taper + sx, -y * taper + sy, z],
           [x * taper + sx, y * taper + sy, z],
           [-x * taper + sx, y * taper + sy, z]]
    verts = np.array(bot + top, np.float64)
    faces = [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7]]
    faces += _quad_faces(4, 0, 4)
    return verts, np.array(faces)


def _mesh_eccentric_cone(r_bot, r_top, height, apex_shift, n=24):
    """Tapered cylinder whose top ring is smaller AND shifted sideways:
    breaks both the continuous axis symmetry and all flips."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    bot = np.stack([r_bot * np.cos(ang), r_bot * np.sin(ang),
                    np.full(n, -height / 2)], axis=1)
    top = np.stack([r_top * np.cos(ang) + apex_shift,
                    r_top * np.sin(ang), np.full(n, height / 2)], axis=1)
    verts = np.concatenate([bot, top, [[0, 0, -height / 2]],
                            [[apex_shift, 0, height / 2]]])
    cb, ct = 2 * n, 2 * n + 1
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[j, i, cb], [n + i, n + j, ct]]
    faces += _quad_faces(n, 0, n)
    return verts, np.array(faces)


def _mesh_offset_pyramid(bx, by, height, apex=(0.3, 0.2)):
    """Rectangular-base pyramid with the apex off both axes."""
    x, y = bx / 2, by / 2
    verts = np.array(
        [[-x, -y, -height / 2], [x, -y, -height / 2], [x, y, -height / 2],
         [-x, y, -height / 2], [apex[0] * bx, apex[1] * by, height / 2]]
    )
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]]
    )
    return verts, faces


def _mesh_egg(rx, ry, rz, bulge=0.45, shear=0.35, n=16):
    """Sheared egg: ellipsoid fattened for z>0 and sheared in x with z —
    every axis flip changes the silhouette."""
    us = np.linspace(0, np.pi, n)
    vs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = []
    for u in us[1:-1]:
        for v in vs:
            z = rz * np.cos(u)
            fat = 1.0 + bulge * np.cos(u)  # wider toward +z
            x = rx * fat * np.sin(u) * np.cos(v) + shear * z
            y = ry * fat * np.sin(u) * np.sin(v)
            verts.append([x, y, z])
    top, bot = [shear * rz, 0, rz], [-shear * rz, 0, -rz]
    verts = np.array(verts + [top, bot])
    rows = n - 2
    it, ib = rows * n, rows * n + 1
    faces = []
    for r in range(rows - 1):
        faces += _quad_faces(n, r * n, (r + 1) * n)
    for c in range(n):
        c2 = (c + 1) % n
        faces += [[it, c, c2], [ib, (rows - 1) * n + c2, (rows - 1) * n + c]]
    # _quad_faces winds for outward normals between increasing-z rings;
    # orientation is irrelevant to the two-sided renderer anyway.
    return verts, np.array(faces)


def _mesh_graded_torus(R, r_thick, r_thin, n=20, m=12):
    """Torus whose tube radius tapers around the ring (thick at u=0, thin
    at u=pi): no rotational symmetry survives."""
    verts = []
    for i in range(n):
        u = 2 * np.pi * i / n
        r = r_thin + (r_thick - r_thin) * (0.5 + 0.5 * np.cos(u))
        for j in range(m):
            v = 2 * np.pi * j / m
            verts.append([(R + r * np.cos(v)) * np.cos(u),
                          (R + r * np.cos(v)) * np.sin(u), r * np.sin(v)])
    faces = []
    for i in range(n):
        for j in range(m):
            a = i * m + j
            b = i * m + (j + 1) % m
            c = ((i + 1) % n) * m + j
            d = ((i + 1) % n) * m + (j + 1) % m
            faces += [[a, c, b], [b, c, d]]
    return np.array(verts), np.array(faces)


def _mesh_lprism(ex, ey, ez):
    """L-shaped prism (asymmetric cross-section extruded along Z)."""
    x, y, z = ex / 2, ey / 2, ez / 2
    pts2d = [(-x, -y), (x, -y), (x, 0), (0, 0), (0, y), (-x, y)]
    tris2d = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 5)]
    lo = [(px, py, -z) for px, py in pts2d]
    hi = [(px, py, z) for px, py in pts2d]
    verts = np.array(lo + hi)
    n = len(pts2d)
    faces = [[a, c, b] for a, b, c in tris2d]
    faces += [[n + a, n + b, n + c] for a, b, c in tris2d]
    faces += _quad_faces(n, 0, n)
    return verts, np.array(faces)


def _mesh_sheared_box(ex, ey, ez, shear=0.4):
    """Parallelepiped: box sheared in x along z."""
    verts, faces = _mesh_taper_box(ex, ey, ez, taper=1.0, shift=(0, 0))
    verts = verts.copy()
    verts[:, 0] += shear * verts[:, 2]
    return verts, faces


def _merge(*meshes):
    verts, faces, off = [], [], 0
    for v, f in meshes:
        verts.append(np.asarray(v, np.float64))
        faces.append(np.asarray(f, np.int64) + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(faces)


def _ry180(p):
    return np.array([-p[0], p[1], -p[2]], np.float64)


def _mesh_eggbox_like(ex, ey, ez, tab):
    """Body + two tabs at p and Ry180*p: exact symmetry group {I, Ry180}
    (LineMOD eggbox analogue, annotate_BOP discrete class)."""
    body = _mesh_taper_box(ex, ey, ez, taper=1.0, shift=(0, 0))  # plain box
    p = np.array([ex * 0.28, ey * 0.5, ez * 0.22])
    tab1 = _mesh_taper_box(tab, tab, tab, taper=1.0, shift=(0, 0))
    t1 = (tab1[0] + p, tab1[1])
    t2 = (tab1[0] * np.array([-1, 1, -1]) + _ry180(p), tab1[1])
    return _merge(body, t1, t2)


def _mesh_glue_like(ex, ey, ez, tab):
    """Flat elongated body + Ry180 tab pair (LineMOD glue analogue)."""
    body = _mesh_eccentric_cone(ex / 2, ex / 2, ez, 0.0, n=16)
    sy = ey / ex
    bv = body[0].copy()
    bv[:, 1] *= sy  # elliptical cross-section (still Ry180-symmetric)
    p = np.array([ex * 0.58, 0.0, ez * 0.30])  # proud of the r=ex/2 body
    tab1 = _mesh_taper_box(tab, tab, tab, taper=1.0, shift=(0, 0))
    t1 = (tab1[0] + p, tab1[1])
    t2 = (tab1[0] * np.array([-1, 1, -1]) + _ry180(p), tab1[1])
    return _merge((bv, body[1]), t1, t2)


RY180_4x4 = [-1.0, 0.0, 0.0, 0.0,
             0.0, 1.0, 0.0, 0.0,
             0.0, 0.0, -1.0, 0.0,
             0.0, 0.0, 0.0, 1.0]

# 13 classes numbered with LineMOD's BOP object ids (objects 3 & 7 are
# absent from the benchmark, data/spec.py _LM_OBJ_IDS), so the "linemod"
# dataset spec resolves all 13 classes on the rendered output. Objects 10
# and 11 are the symmetric ADI classes, matching the eval protocol
# (linemod_eval.py:525-531: ADI for eggbox/glue = obj ids 10, 11).
GENERATORS = [
    (1, lambda: _mesh_taper_box(100, 70, 50), None),
    (2, lambda: _mesh_eccentric_cone(35, 22, 120, 18), None),
    (4, lambda: _mesh_offset_pyramid(90, 70, 110), None),
    (5, lambda: _mesh_egg(55, 40, 70), None),
    (6, lambda: _mesh_graded_torus(55, 22, 9), None),
    (8, lambda: _mesh_lprism(110, 80, 40), None),
    (9, lambda: _mesh_taper_box(60, 45, 140, taper=0.4, shift=(0.1, 0.3)), None),
    (10, lambda: _mesh_eggbox_like(120, 80, 40, 24), RY180_4x4),
    (11, lambda: _mesh_glue_like(40, 24, 140, 16), RY180_4x4),
    (12, lambda: _mesh_eccentric_cone(50, 38, 60, 14, n=20), None),
    (13, lambda: _mesh_offset_pyramid(120, 90, 70, apex=(-0.25, 0.3)), None),
    (14, lambda: _mesh_graded_torus(40, 16, 7), None),
    (15, lambda: _mesh_sheared_box(130, 40, 80), None),
]


def write_ply(path, verts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    info = {}
    for oid, gen, sym in GENERATORS:
        verts, faces = gen()
        if sym is None:
            # small random rotation so object frames are not axis-aligned
            # (only for asymmetric classes: declared symmetry axes must
            # stay exact object-frame axes)
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            verts = verts @ R.T
        write_ply(os.path.join(args.out_dir, f"obj_{oid:06d}.ply"),
                  verts, faces)
        mins, maxs = verts.min(axis=0), verts.max(axis=0)
        d = float(np.linalg.norm(verts[:, None] - verts[None, :], axis=-1).max())
        rec = dict(
            diameter=d,
            min_x=float(mins[0]), min_y=float(mins[1]), min_z=float(mins[2]),
            size_x=float(maxs[0] - mins[0]),
            size_y=float(maxs[1] - mins[1]),
            size_z=float(maxs[2] - mins[2]),
        )
        if sym is not None:
            rec["symmetries_discrete"] = [sym]
        info[str(oid)] = rec
    with open(os.path.join(args.out_dir, "models_info.json"), "w") as f:
        json.dump(info, f, indent=1)
    print(f"wrote {len(info)} meshes + models_info.json to {args.out_dir}")


if __name__ == "__main__":
    main()
