"""Farthest-point sampling of mesh control points.

Capability of the reference's standalone FPS tool (/root/reference/FPS.py:
17-99): pick k far-apart surface points per object model and write them to a
`features.json` keyed by object id. The reference runs an O(k*N) numpy loop
seeded at the point farthest from the centroid; the same algorithm is kept
here (it is host-side offline tooling), minus the open3d interactive viewer.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyrapose_tpu.utils.ply import load_ply


def farthest_point_sampling(
    points: np.ndarray, k: int, seed_from_centroid: bool = True
) -> np.ndarray:
    """Select k far-apart points. points (N, 3) -> (k, 3).

    Start at the point farthest from the centroid (FPS.py:24-30), then
    greedily add the point maximizing the distance to the selected set.
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n == 0:
        raise ValueError("empty point set")
    k = min(k, n)
    if seed_from_centroid:
        start = int(np.argmax(np.linalg.norm(pts - pts.mean(axis=0), axis=1)))
    else:
        start = 0
    selected = [start]
    min_d2 = np.sum((pts - pts[start]) ** 2, axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(min_d2))
        selected.append(nxt)
        d2 = np.sum((pts - pts[nxt]) ** 2, axis=1)
        min_d2 = np.minimum(min_d2, d2)
    return pts[selected]


def write_features_json(
    model_paths: dict[int, str], out_path: str, k: int = 8
) -> dict:
    """FPS over each object's PLY -> features.json {obj_id: [[x,y,z], ...]}.

    Matches the reference tool's output artifact (FPS.py:87-99).
    """
    features = {}
    for obj_id, path in sorted(model_paths.items()):
        mesh = load_ply(path)
        pts = farthest_point_sampling(mesh["pts"], k)
        features[str(obj_id)] = pts.tolist()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(features, f)
    return features
