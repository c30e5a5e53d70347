"""Encode/decode of the dense 16-coordinate 3D-box-corner regression targets.

The network predicts, per anchor, offsets of the 8 projected 3D-bounding-box
corners from the anchor's own corner points. Corner j (j = 0..7) is referenced
to the anchor's (x1, y1) when j is even and (x2, y2) when j is odd, normalized
by anchor width/height and divided by std = 0.2 — exactly the transform of the
reference (encode: utils/anchors.py:515-559; decode:
backend/common.py:25-56, layers/_misc.py RegressBoxes3D).

Everything is batched and shape-static; these run inside jit on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

BOX3D_STD = 0.2

# Per-coordinate anchor reference index: x coords alternate x1/x2 (cols 0/2),
# y coords alternate y1/y2 (cols 1/3).
_X_REF = jnp.array([0, 2, 0, 2, 0, 2, 0, 2], dtype=jnp.int32)  # anchor col for x_j
_Y_REF = jnp.array([1, 3, 1, 3, 1, 3, 1, 3], dtype=jnp.int32)  # anchor col for y_j


def _anchor_refs(anchors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-corner anchor reference coords and sizes, broadcast to (..., 8)."""
    width = anchors[..., 2] - anchors[..., 0]
    height = anchors[..., 3] - anchors[..., 1]
    ax = jnp.take(anchors, _X_REF, axis=-1)  # (..., 8)
    ay = jnp.take(anchors, _Y_REF, axis=-1)  # (..., 8)
    return ax, ay, width[..., None], height[..., None]


def encode_box3d(anchors: jnp.ndarray, corners16: jnp.ndarray, std: float = BOX3D_STD) -> jnp.ndarray:
    """Encode projected corner pixel coords into regression targets.

    Args:
        anchors: (..., 4) anchor boxes (x1, y1, x2, y2).
        corners16: (..., 16) interleaved (x0, y0, ..., x7, y7) pixel coords.
        std: normalization std (reference value 0.2).

    Returns:
        (..., 16) regression targets.
    """
    ax, ay, w, h = _anchor_refs(anchors)
    cx = corners16[..., 0::2]
    cy = corners16[..., 1::2]
    tx = (cx - ax) / w / std
    ty = (cy - ay) / h / std
    out = jnp.stack([tx, ty], axis=-1)  # (..., 8, 2)
    return out.reshape(out.shape[:-2] + (16,))


def decode_box3d(anchors: jnp.ndarray, deltas: jnp.ndarray, std: float = BOX3D_STD) -> jnp.ndarray:
    """Inverse of :func:`encode_box3d`: deltas -> pixel corner coordinates."""
    ax, ay, w, h = _anchor_refs(anchors)
    tx = deltas[..., 0::2]
    ty = deltas[..., 1::2]
    cx = ax + tx * std * w
    cy = ay + ty * std * h
    out = jnp.stack([cx, cy], axis=-1)
    return out.reshape(out.shape[:-2] + (16,))
