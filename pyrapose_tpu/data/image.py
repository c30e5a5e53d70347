"""Image resize utilities: min/max-side scaling with intrinsics adjustment.

The reference scales every input so its short side hits --image-min-side
capped by --image-max-side on the long side (utils/image.py:281-323,
compute_resize_scale), then feeds variable-size tensors to keras. A TPU
pipeline needs STATIC shapes, so the equivalent here is scale-then-letterbox:
resize by the reference's exact scale rule, pad bottom/right to the fixed
target, and scale the intrinsics by the same factor (bottom-right padding
leaves the principal point untouched). Poses are unaffected — scaling the
image and fx/fy/cx/cy together preserves the projection.
"""

from __future__ import annotations

import numpy as np


def compute_resize_scale(
    shape: tuple[int, int], min_side: int = 480, max_side: int = 640
) -> float:
    """Reference scale rule (utils/image.py:281-303): short side -> min_side,
    long side capped at max_side."""
    h, w = shape
    smallest = min(h, w)
    largest = max(h, w)
    scale = min_side / smallest
    if largest * scale > max_side:
        scale = max_side / largest
    return float(scale)


def resize_letterbox(
    image: np.ndarray,
    target_shape: tuple[int, int],
    cam: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray | None, float]:
    """Aspect-preserving resize + bottom/right zero-pad to target_shape.

    Returns (image (H, W, 3) uint8, adjusted cam or None, scale). The scale
    follows compute_resize_scale with min_side/max_side = target dims.
    """
    from PIL import Image

    th, tw = target_shape
    h, w = image.shape[:2]
    if (h, w) == (th, tw):
        return np.asarray(image, np.uint8), (
            None if cam is None else np.asarray(cam, np.float32)
        ), 1.0
    scale = compute_resize_scale((h, w), min_side=min(th, tw),
                                 max_side=max(th, tw))
    # never exceed the canvas
    scale = min(scale, th / h, tw / w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    resized = np.asarray(
        Image.fromarray(np.asarray(image, np.uint8)).resize((nw, nh)),
        np.uint8,
    )
    out = np.zeros((th, tw, 3), np.uint8)
    out[:nh, :nw] = resized[..., :3]
    new_cam = None
    if cam is not None:
        fx, fy, cx, cy = [float(v) for v in np.asarray(cam).reshape(-1)[:4]]
        new_cam = np.asarray(
            [fx * scale, fy * scale, cx * scale, cy * scale], np.float32
        )
    return out, new_cam, scale
