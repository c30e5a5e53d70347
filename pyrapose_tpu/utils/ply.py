"""PLY mesh loader (ASCII and binary little/big-endian).

Standalone re-implementation of the reference's parser
(/root/reference/PyraPose/utils/ply_loader.py:11-157): returns a dict with
`pts` (N, 3) float64 and, when present, `normals` (N, 3), `colors` (N, 3)
uint8, and `faces` (M, 3) int — the structure every eval script consumes for
its model point clouds (e.g. linemod_eval.py:245-257).

Unlike the reference (hand-rolled line scanner), this parses the header into
a typed element schema and reads binary payloads with a single numpy
structured-dtype view — no per-vertex Python loop.
"""

from __future__ import annotations

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path: str) -> dict:
    """Parse a PLY file -> {pts, normals?, colors?, faces?}."""
    with open(path, "rb") as f:
        data = f.read()

    # --- header ---
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header_end = data.find(b"\n", end) + 1
    header = data[:header_end].decode("ascii", errors="replace")
    body = data[header_end:]

    fmt = None
    elements: list[tuple[str, int, list]] = []  # (name, count, props)
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property" and elements:
            if parts[1] == "list":
                # (name, 'list', count_type, item_type)
                elements[-1][2].append((parts[4], "list", parts[2], parts[3]))
            else:
                elements[-1][2].append((parts[2], parts[1]))
    if fmt is None:
        raise ValueError(f"{path}: missing format line")

    out: dict = {}
    if fmt == "ascii":
        _parse_ascii(body, elements, out)
    else:
        endian = "<" if fmt == "binary_little_endian" else ">"
        _parse_binary(body, elements, endian, out)
    return out


def _extract_vertex_arrays(names: list[str], table: np.ndarray, out: dict) -> None:
    cols = {n: table[:, i] for i, n in enumerate(names)}
    out["pts"] = np.stack([cols["x"], cols["y"], cols["z"]], axis=1).astype(np.float64)
    if all(k in cols for k in ("nx", "ny", "nz")):
        out["normals"] = np.stack(
            [cols["nx"], cols["ny"], cols["nz"]], axis=1
        ).astype(np.float64)
    if all(k in cols for k in ("red", "green", "blue")):
        out["colors"] = np.stack(
            [cols["red"], cols["green"], cols["blue"]], axis=1
        ).astype(np.uint8)


def _parse_ascii(body: bytes, elements, out: dict) -> None:
    lines = body.decode("ascii").splitlines()
    cursor = 0
    for name, count, props in elements:
        rows = lines[cursor : cursor + count]
        cursor += count
        if name == "vertex":
            scalar_names = [p[0] for p in props if len(p) == 2]
            table = np.array(
                [r.split()[: len(scalar_names)] for r in rows], np.float64
            )
            _extract_vertex_arrays(scalar_names, table, out)
        elif name == "face":
            faces = []
            for r in rows:
                vals = r.split()
                n = int(vals[0])
                faces.append([int(v) for v in vals[1 : 1 + n]][:3])
            out["faces"] = np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64)


def _parse_binary(body: bytes, elements, endian: str, out: dict) -> None:
    offset = 0
    for name, count, props in elements:
        if name == "vertex" and all(len(p) == 2 for p in props):
            dt = np.dtype([(p[0], endian + _PLY_TO_NP[p[1]]) for p in props])
            arr = np.frombuffer(body, dt, count=count, offset=offset)
            offset += dt.itemsize * count
            names = [p[0] for p in props]
            table = np.stack([arr[n].astype(np.float64) for n in names], axis=1)
            _extract_vertex_arrays(names, table, out)
        elif name == "face" and len(props) == 1 and props[0][1] == "list":
            _, _, count_t, item_t = props[0]
            cdt = np.dtype(endian + _PLY_TO_NP[count_t])
            idt = np.dtype(endian + _PLY_TO_NP[item_t])
            faces = []
            for _ in range(count):
                n = int(np.frombuffer(body, cdt, 1, offset)[0])
                offset += cdt.itemsize
                idx = np.frombuffer(body, idt, n, offset)
                offset += idt.itemsize * n
                faces.append(idx[:3].astype(np.int64))
            out["faces"] = (
                np.stack(faces) if faces else np.zeros((0, 3), np.int64)
            )
        else:
            # unknown element: only skippable when fixed-size
            if any(len(p) != 2 for p in props):
                raise ValueError(f"cannot skip list-typed element {name!r}")
            dt = np.dtype([(p[0], endian + _PLY_TO_NP[p[1]]) for p in props])
            offset += dt.itemsize * count


def sample_model_points(
    mesh: dict, num_points: int, seed: int = 0
) -> np.ndarray:
    """Deterministic subsample of mesh vertices to a fixed count.

    Eval metrics run on fixed-shape point sets per class (eval/metrics.py);
    the reference uses the full PLY cloud with a host kd-tree instead.
    Sampling with replacement when the mesh is small keeps shapes static.
    """
    pts = np.asarray(mesh["pts"], np.float64)
    rng = np.random.default_rng(seed)
    if len(pts) >= num_points:
        idx = rng.choice(len(pts), num_points, replace=False)
    else:
        idx = rng.choice(len(pts), num_points, replace=True)
    return pts[np.sort(idx)]
