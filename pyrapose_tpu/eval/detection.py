"""Fixed-shape detection filtering: per-class NMS + top-k, on device.

TPU-native equivalent of the reference FilterDetections layer
(/root/reference/PyraPose/layers/filter_detections.py:21-118): score
threshold 0.05, per-class NMS at IoU 0.5, global top-k to max_detections,
padding with -1 labels (:27-30, :100-107). The reference batches via
`map_fn` over dynamic-shape gathers (:184-189); here everything is
static-shape — a per-class top-K candidate pool and an O(K^2) masked NMS
(pairwise IoU matrix + iterative suppression under `lax.fori_loop`), which
XLA lays out as dense vector ops instead of host-style data-dependent
control flow.

2D boxes are the axis-aligned hull of the 16-coordinate corner prediction
(min/max over the 8 projected corners) — the framework's single regression
head predicts corners only, so the hull replaces the reference's legacy
separate 2D-bbox regression output consumed by tless_eval.py:312.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyrapose_tpu.geometry.iou import pairwise_iou


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    score_threshold: float = 0.05  # filter_detections.py:28
    nms_threshold: float = 0.5  # filter_detections.py:30
    max_detections: int = 300  # filter_detections.py:29
    per_class_candidates: int = 100  # static per-class NMS pool size
    nms: bool = True


class Detections(NamedTuple):
    """Padded detections for one image (invalid rows have label -1)."""

    boxes: jnp.ndarray  # (max_detections, 4) x1,y1,x2,y2
    scores: jnp.ndarray  # (max_detections,)
    labels: jnp.ndarray  # (max_detections,) int32, -1 = padding
    boxes3d: jnp.ndarray  # (max_detections, 16) corner passthrough


def corners16_to_aabb(corners16: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) corner pixels -> (..., 4) axis-aligned x1,y1,x2,y2 hull."""
    pts = corners16.reshape(*corners16.shape[:-1], 8, 2)
    mn = jnp.min(pts, axis=-2)
    mx = jnp.max(pts, axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def clip_boxes(boxes: jnp.ndarray, image_shape: tuple[int, int]) -> jnp.ndarray:
    """ClipBoxes equivalent (layers/_misc.py:259-281)."""
    h, w = image_shape
    x1 = jnp.clip(boxes[..., 0], 0, w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over a fixed pool sorted by score (descending).

    Returns a keep-mask. boxes (K, 4), scores (K,), valid (K,) — assumes
    the pool is already score-sorted, so suppression only flows from lower
    to higher indices.
    """
    k = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # (K, K)
    suppress_pairs = (iou > iou_threshold) & valid[None, :] & valid[:, None]

    def body(i, keep):
        # if i is kept, suppress all later boxes overlapping it
        row = suppress_pairs[i]
        later = jnp.arange(k) > i
        return jnp.where(keep[i] & row & later, False, keep)

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def filter_detections(
    boxes3d: jnp.ndarray,
    scores: jnp.ndarray,
    image_shape: tuple[int, int],
    config: DetectionConfig = DetectionConfig(),
) -> Detections:
    """One image: dense (N, 16)/(N, C) -> padded top-max_detections.

    vmap over images for batching (reference batches with map_fn,
    filter_detections.py:184-189).
    """
    num_classes = scores.shape[1]
    kc = config.per_class_candidates
    aabb = clip_boxes(corners16_to_aabb(boxes3d), image_shape)  # (N, 4)

    def per_class(cls_scores):
        top_scores, top_idx = jax.lax.top_k(cls_scores, kc)
        valid = top_scores > config.score_threshold
        cand_boxes = jnp.take(aabb, top_idx, axis=0)
        if config.nms:
            keep = _nms_mask(cand_boxes, top_scores, valid, config.nms_threshold)
        else:
            keep = valid
        return jnp.where(keep, top_scores, -1.0), top_idx

    cls_scores, cls_idx = jax.vmap(per_class, in_axes=1)(scores)  # (C, Kc)
    flat_scores = cls_scores.reshape(-1)
    flat_idx = cls_idx.reshape(-1)
    flat_labels = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), kc)

    # few-class datasets: the per-class candidate pool can be smaller than
    # max_detections; top_k requires k <= input size
    k_out = min(config.max_detections, num_classes * kc)
    top_scores, sel = jax.lax.top_k(flat_scores, k_out)
    sel_anchor = jnp.take(flat_idx, sel)
    ok = top_scores > config.score_threshold
    return Detections(
        boxes=jnp.where(ok[:, None], jnp.take(aabb, sel_anchor, axis=0), -1.0),
        scores=jnp.where(ok, top_scores, -1.0),
        labels=jnp.where(ok, jnp.take(flat_labels, sel), -1),
        boxes3d=jnp.where(
            ok[:, None], jnp.take(boxes3d, sel_anchor, axis=0), -1.0
        ),
    )
