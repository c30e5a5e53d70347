"""Pairwise IoU, fully vectorized for XLA.

Replaces the reference's host-side Cython kernel
(/root/reference/PyraPose/utils/compute_overlap.pyx:13-53) with a broadcasted
JAX computation that fuses into the on-device target-assignment pipeline. The
(N_anchors, K_gt) matrix (56700 x K for 480x640) is small enough to
materialize; XLA fuses the elementwise ops so it is a single HBM pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_iou(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """IoU between two box sets.

    Args:
        boxes: (N, 4) as (x1, y1, x2, y2).
        query: (K, 4).

    Returns:
        (N, K) IoU matrix. Matches the Cython reference semantics: box area is
        computed as (x2 - x1) * (y2 - y1) with no +1, intersection clamped at 0;
        degenerate/empty unions produce 0.
    """
    boxes = boxes.astype(jnp.float32)
    query = query.astype(jnp.float32)

    area_q = (query[:, 2] - query[:, 0]) * (query[:, 3] - query[:, 1])  # (K,)
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])  # (N,)

    ix = jnp.minimum(boxes[:, None, 2], query[None, :, 2]) - jnp.maximum(
        boxes[:, None, 0], query[None, :, 0]
    )
    iy = jnp.minimum(boxes[:, None, 3], query[None, :, 3]) - jnp.maximum(
        boxes[:, None, 1], query[None, :, 1]
    )
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)  # (N, K)

    union = area_b[:, None] + area_q[None, :] - inter
    return jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)
