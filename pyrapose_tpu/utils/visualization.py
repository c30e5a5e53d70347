"""Drawing utilities: detection/annotation/pose-box overlays.

Capability match of the reference's visualization helpers
(utils/visualization.py:23-106 draw_box/draw_caption/draw_detections/
draw_annotations and the label palette in utils/colors.py), implemented on
numpy + PIL (no OpenCV dependency): the framework draws 2D boxes, captions,
P3 masks, and — the pose-specific addition — the 16-coordinate projected
3D-box wireframe that the dense head predicts.

All functions mutate and return a uint8 RGB (H, W, 3) array.
"""

from __future__ import annotations

import colorsys

import numpy as np

# 3D box wireframe edges for the corner order
# (+++, ++-, +--, +-+, -++, -+-, ---, --+) — data/spec.py:23-41, identical to
# the reference loaders (preprocessing/linemod.py:78-86).
BOX_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 0),  # +x face
    (4, 5), (5, 6), (6, 7), (7, 4),  # -x face
    (0, 4), (1, 5), (2, 6), (3, 7),  # connectors
)


def _palette(n: int = 90) -> np.ndarray:
    """Deterministic label palette (the reference ships a fixed color table,
    utils/colors.py; here generated from a golden-ratio hue walk)."""
    colors = []
    h = 0.0
    for i in range(n):
        h = (h + 0.61803398875) % 1.0
        s = 0.85 if i % 2 == 0 else 0.6
        v = 0.95 if i % 3 else 0.75
        colors.append([int(255 * c) for c in colorsys.hsv_to_rgb(h, s, v)])
    return np.asarray(colors, np.uint8)


_PALETTE = _palette()


def label_color(label: int) -> tuple[int, int, int]:
    """Stable RGB color for a class label (reference utils/colors.py:4+)."""
    return tuple(int(v) for v in _PALETTE[int(label) % len(_PALETTE)])


def draw_line(image: np.ndarray, p0, p1, color, thickness: int = 2) -> np.ndarray:
    """Rasterize a line segment by dense sampling (no cv2)."""
    h, w = image.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2 + 1
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    r = max(thickness // 2, 0)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = np.clip(np.round(xs + dx), 0, w - 1).astype(int)
            yi = np.clip(np.round(ys + dy), 0, h - 1).astype(int)
            inb = (xs + dx >= 0) & (xs + dx < w) & (ys + dy >= 0) & (ys + dy < h)
            image[yi[inb], xi[inb]] = color
    return image


def draw_box(image: np.ndarray, box, color, thickness: int = 2) -> np.ndarray:
    """Axis-aligned box outline (reference visualization.py:23-37)."""
    x1, y1, x2, y2 = [float(v) for v in box]
    for a, b in (((x1, y1), (x2, y1)), ((x2, y1), (x2, y2)),
                 ((x2, y2), (x1, y2)), ((x1, y2), (x1, y1))):
        draw_line(image, a, b, color, thickness)
    return image


def draw_box3d(image: np.ndarray, corners16, color, thickness: int = 2) -> np.ndarray:
    """Projected 3D-box wireframe from the 16-coordinate corner vector."""
    pts = np.asarray(corners16, np.float64).reshape(8, 2)
    for a, b in BOX_EDGES:
        draw_line(image, pts[a], pts[b], color, thickness)
    return image


def draw_caption(image: np.ndarray, position, text: str, color=None) -> np.ndarray:
    """Small text label above a position (reference visualization.py:40-51),
    via PIL's built-in bitmap font."""
    from PIL import Image, ImageDraw

    pil = Image.fromarray(image)
    d = ImageDraw.Draw(pil)
    x, y = float(position[0]), float(position[1])
    d.text((max(x, 0), max(y - 11, 0)), text, fill=tuple(color or (255, 255, 255)))
    image[:] = np.asarray(pil)
    return image


def draw_mask(image: np.ndarray, mask: np.ndarray, color, alpha: float = 0.45) -> np.ndarray:
    """Alpha-blend a boolean mask (the reference node publishes raw masks;
    overlays are the debug view)."""
    m = np.asarray(mask, bool)
    overlay = image[m].astype(np.float32)
    image[m] = (
        overlay * (1 - alpha) + np.asarray(color, np.float32) * alpha
    ).astype(np.uint8)
    return image


def draw_detections(
    image: np.ndarray,
    detections: list[dict],
    label_to_name=None,
    score_threshold: float = 0.0,
) -> np.ndarray:
    """Overlay detections (reference visualization.py:54-76 draw_detections).

    Each detection dict may carry: 'corners16' (projected 3D box), 'box'
    (2D AABB), 'mask' (bool HxW), 'label'/'class_id', 'score'.
    """
    for det in detections:
        score = float(det.get("score", 1.0))
        if score < score_threshold:
            continue
        label = int(det.get("label", det.get("class_id", 0)))
        color = label_color(label)
        if det.get("mask") is not None:
            draw_mask(image, det["mask"], color)
        anchor = None
        if det.get("corners16") is not None:
            draw_box3d(image, det["corners16"], color)
            pts = np.asarray(det["corners16"], np.float64).reshape(8, 2)
            anchor = pts.min(axis=0)
        if det.get("box") is not None:
            draw_box(image, det["box"], color)
            anchor = (det["box"][0], det["box"][1])
        if anchor is not None:
            name = (
                label_to_name(label) if label_to_name else str(label)
            )
            draw_caption(image, anchor, f"{name} {score:.2f}", color)
    return image


def draw_annotations(
    image: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    valid: np.ndarray | None = None,
    label_to_name=None,
    color=(0, 255, 0),
) -> np.ndarray:
    """Overlay ground-truth boxes (reference visualization.py:79-106)."""
    boxes = np.asarray(boxes)
    labels = np.asarray(labels)
    for k in range(len(boxes)):
        if valid is not None and not valid[k]:
            continue
        draw_box(image, boxes[k], color)
        name = label_to_name(int(labels[k])) if label_to_name else str(int(labels[k]))
        draw_caption(image, (boxes[k][0], boxes[k][1]), name, color)
    return image


def render_pose_overlay(
    image: np.ndarray,
    spec,
    rot: np.ndarray,
    trans: np.ndarray,
    valid: np.ndarray,
    score: np.ndarray,
    cam: np.ndarray,
) -> np.ndarray:
    """Overlay every valid per-class pose as a projected 3D-box wireframe.

    The `infer --save-images` / eval debug view: the estimated pose's box
    corners are projected with the pinhole model and drawn with the class
    palette (the pose-estimation counterpart of the reference's
    draw_detections on 2D boxes).
    """
    out = np.ascontiguousarray(np.asarray(image, np.uint8).copy())
    fx, fy, cx, cy = [float(v) for v in np.asarray(cam).reshape(-1)[:4]]
    flat_rot = np.asarray(rot).reshape(-1, 3, 3)
    flat_trans = np.asarray(trans).reshape(-1, 3)
    flat_valid = np.asarray(valid).reshape(-1)
    flat_score = np.asarray(score).reshape(-1)
    n_inst = flat_rot.shape[0] // spec.num_classes
    dets = []
    for idx in range(flat_rot.shape[0]):
        if not flat_valid[idx]:
            continue
        c = idx // max(n_inst, 1)
        pc = spec.corners3d[c] @ flat_rot[idx].T + flat_trans[idx]
        z = np.where(np.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        corners16 = np.stack(
            [pc[:, 0] * fx / z + cx, pc[:, 1] * fy / z + cy], axis=1
        ).reshape(-1)
        oid = spec.class_to_obj_id[c] if spec.class_to_obj_id else c
        dets.append(
            {
                "label": c,
                "score": float(flat_score[idx]),
                "corners16": corners16,
                "name": f"obj_{oid}",
            }
        )
    return draw_detections(
        out, dets,
        label_to_name=lambda l: (
            f"obj_{spec.class_to_obj_id[l]}" if spec.class_to_obj_id else str(l)
        ),
    )
