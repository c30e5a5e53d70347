#!/usr/bin/env python3
"""Generate a 13-object procedural mesh set (LineMOD-shaped) for the
full-scale synthetic training recipe (docs/USAGE.md).

The environment ships no BOP meshes; these procedural solids (boxes,
cylinders, pyramids, ellipsoids, tori, L/T-prisms) stand in for the 13
LineMOD objects so `pyrapose render-synthetic` + `pyrapose train` can run
the end-to-end accuracy recipe. Sizes are in LineMOD's physical ballpark
(60-300 mm extents, meshes in mm like BOP models).

Usage: python scripts/make_demo_meshes.py OUT_DIR [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _mesh_box(ex, ey, ez):
    s = np.array([ex, ey, ez]) / 2
    verts = np.array(
        [[x, y, z] for x in (-s[0], s[0]) for y in (-s[1], s[1])
         for z in (-s[2], s[2])]
    )
    faces = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ]
    )
    return verts, faces


def _mesh_cylinder(radius, height, n=24):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    top = np.stack([radius * np.cos(ang), radius * np.sin(ang),
                    np.full(n, height / 2)], axis=1)
    bot = top.copy()
    bot[:, 2] = -height / 2
    verts = np.concatenate([top, bot, [[0, 0, height / 2]], [[0, 0, -height / 2]]])
    ct, cb = 2 * n, 2 * n + 1
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, j, ct], [n + j, n + i, cb],
                  [i, n + i, j], [j, n + i, n + j]]
    return verts, np.array(faces)


def _mesh_pyramid(base, height):
    s = base / 2
    verts = np.array(
        [[-s, -s, -height / 2], [s, -s, -height / 2], [s, s, -height / 2],
         [-s, s, -height / 2], [0, 0, height / 2]]
    )
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]]
    )
    return verts, faces


def _mesh_ellipsoid(rx, ry, rz, n=16):
    us = np.linspace(0, np.pi, n)
    vs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = []
    for u in us[1:-1]:
        for v in vs:
            verts.append([rx * np.sin(u) * np.cos(v),
                          ry * np.sin(u) * np.sin(v), rz * np.cos(u)])
    top, bot = [0, 0, rz], [0, 0, -rz]
    verts = np.array(verts + [top, bot])
    rows = n - 2
    it, ib = rows * n, rows * n + 1
    faces = []
    for r in range(rows - 1):
        for c in range(n):
            c2 = (c + 1) % n
            a, b = r * n + c, r * n + c2
            d, e = (r + 1) * n + c, (r + 1) * n + c2
            faces += [[a, d, b], [b, d, e]]
    for c in range(n):
        c2 = (c + 1) % n
        faces += [[it, c, c2], [ib, (rows - 1) * n + c2, (rows - 1) * n + c]]
    return verts, np.array(faces)


def _mesh_torus(R, r, n=18, m=12):
    verts = []
    for i in range(n):
        u = 2 * np.pi * i / n
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
    """L-shaped prism (asymmetric: exercises rotation estimation)."""
    x, y, z = ex / 2, ey / 2, ez / 2
    # L cross-section in XY extruded along Z
    pts2d = [(-x, -y), (x, -y), (x, 0), (0, 0), (0, y), (-x, y)]
    tris2d = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 5)]
    lo = [(px, py, -z) for px, py in pts2d]
    hi = [(px, py, z) for px, py in pts2d]
    verts = np.array(lo + hi)
    n = len(pts2d)
    faces = [[a, c, b] for a, b, c in tris2d]
    faces += [[n + a, n + b, n + c] for a, b, c in tris2d]
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, j, n + i], [j, n + j, n + i]]
    return verts, np.array(faces)


GENERATORS = [
    lambda: _mesh_box(100, 70, 50),
    lambda: _mesh_cylinder(35, 120),
    lambda: _mesh_pyramid(90, 110),
    lambda: _mesh_ellipsoid(55, 40, 70),
    lambda: _mesh_torus(55, 18),
    lambda: _mesh_lprism(110, 80, 40),
    lambda: _mesh_box(60, 60, 140),
    lambda: _mesh_cylinder(50, 60),
    lambda: _mesh_pyramid(120, 70),
    lambda: _mesh_ellipsoid(75, 30, 45),
    lambda: _mesh_lprism(70, 120, 55),
    lambda: _mesh_torus(40, 14),
    lambda: _mesh_box(130, 40, 80),
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
    for oid, gen in enumerate(GENERATORS, start=1):
        verts, faces = gen()
        # small random rotation so object frames are not axis-aligned
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
        info[str(oid)] = dict(
            diameter=d,
            min_x=float(mins[0]), min_y=float(mins[1]), min_z=float(mins[2]),
            size_x=float(maxs[0] - mins[0]),
            size_y=float(maxs[1] - mins[1]),
            size_z=float(maxs[2] - mins[2]),
        )
    with open(os.path.join(args.out_dir, "models_info.json"), "w") as f:
        json.dump(info, f, indent=1)
    print(f"wrote {len(info)} meshes + models_info.json to {args.out_dir}")


if __name__ == "__main__":
    main()
