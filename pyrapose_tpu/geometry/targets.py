"""On-device anchor target assignment.

TPU-native replacement for the reference's per-batch host-side target
generation (/root/reference/PyraPose/utils/anchors.py:72-287 +
compute_overlap.pyx): ground truth arrives as fixed-shape padded tensors and
the whole assignment — IoU matrix, argmax matching, 16-coordinate corner
encoding, and P3 mask rasterization — is one jit-compiled, batchable function.
No data-dependent shapes: validity is carried in masks and the anchor-state
columns.

Ground-truth layout per image (all padded to K_max slots):
    gt_boxes    (K, 4)   2D AABBs (x1, y1, x2, y2), used for IoU matching.
    gt_corners  (K, 16)  projected 3D-box corner pixels (x0, y0, ..., x7, y7).
    gt_labels   (K,)     int32 class ids in [0, C).
    gt_valid    (K,)     bool; padding slots are False.
    mask_slots  (H3*W3,) int32 per-P3-pixel gt-slot index, -1 = background.

State encoding matches the reference: -1 ignore, 0 negative, 1 positive.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from pyrapose_tpu.geometry.box3d import encode_box3d
from pyrapose_tpu.geometry.iou import pairwise_iou


@dataclasses.dataclass(frozen=True)
class TargetConfig:
    """Assignment thresholds (reference anchors.py:72-79)."""

    positive_iou: float = 0.5
    negative_iou: float = 0.4
    min_mask_pixels: int = 2  # reference requires len(anchors_spec) > 1


class Targets(NamedTuple):
    """Per-image training targets.

    labels:     (N, C + 1); one-hot class columns plus anchor-state column.
    regression: (N, 17);    16 corner-offset targets plus anchor-state column.
    mask:       (P, C + 1); P3-resolution per-class mask plus validity column.
    """

    labels: jnp.ndarray
    regression: jnp.ndarray
    mask: jnp.ndarray


def anchor_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_corners: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    mask_slots: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray | None = None,
    config: TargetConfig = TargetConfig(),
) -> Targets:
    """Assign anchors to padded ground truth. Single image; vmap over batch.

    Args:
        anchors: (N, 4) anchor boxes (static constant).
        gt_boxes, gt_corners, gt_labels, gt_valid, mask_slots: see module doc.
        num_classes: number of foreground classes C.
        image_hw: optional (2,) actual (height, width); anchors whose centers
            fall outside are set to ignore (reference anchors.py:278-286).

    Returns:
        Targets(labels (N, C+1), regression (N, 17), mask (P, C+1)).
    """
    nf = jnp.float32
    valid = gt_valid.astype(bool)

    iou = pairwise_iou(anchors, gt_boxes)  # (N, K)
    iou = jnp.where(valid[None, :], iou, -1.0)  # invalid slots never win argmax
    best_gt = jnp.argmax(iou, axis=1)  # (N,)
    best_iou = jnp.max(iou, axis=1)  # (N,)

    positive = best_iou >= config.positive_iou
    ignore = (best_iou > config.negative_iou) & ~positive
    state = jnp.where(positive, 1.0, jnp.where(ignore, -1.0, 0.0)).astype(nf)

    if image_hw is not None:
        centers_x = (anchors[:, 0] + anchors[:, 2]) / 2.0
        centers_y = (anchors[:, 1] + anchors[:, 3]) / 2.0
        outside = (centers_x >= image_hw[1].astype(nf)) | (
            centers_y >= image_hw[0].astype(nf)
        )
        state = jnp.where(outside, -1.0, state)
        positive = positive & ~outside

    # Everything below is scatter-free: TPU scatters serialize on the scalar
    # unit, so per-anchor gathers/one-hots are expressed as compare masks and
    # small (N, K) x (K, ·) matmuls instead (each anchor matches exactly one
    # slot, so the matmuls are exact selections). ~20% of the fused train
    # step vs the scatter formulation.
    k_slots = gt_boxes.shape[0]
    sel = (best_gt[:, None] == jnp.arange(k_slots)[None, :]).astype(nf)  # (N, K)
    label_onehot_k = (
        gt_labels[:, None] == jnp.arange(num_classes)[None, :]
    ).astype(nf)  # (K, C)

    # Classification labels: one-hot of matched gt class on positive anchors.
    onehot = jnp.matmul(sel, label_onehot_k) * positive.astype(nf)[:, None]
    labels = jnp.concatenate([onehot, state[:, None]], axis=1)

    # Regression: encode matched gt corners against every anchor (loss masks by
    # state, mirroring reference anchors.py:267 which encodes all anchors).
    matched_corners = jnp.matmul(sel, gt_corners)  # (N, 16)
    reg = encode_box3d(anchors, matched_corners)
    regression = jnp.concatenate([reg.astype(nf), state[:, None]], axis=1)

    # P3 mask target: per-pixel one-hot of the instance's class.
    slots = mask_slots.astype(jnp.int32)  # (P,)
    in_range = (slots >= 0) & (slots < k_slots)
    slot_onehot = in_range[:, None] & (
        slots[:, None] == jnp.arange(k_slots)[None, :]
    )  # (P, K) bool
    pv1 = slot_onehot & valid[None, :]
    # Instances smaller than min_mask_pixels at P3 resolution are dropped.
    counts = jnp.sum(pv1.astype(jnp.int32), axis=0)  # (K,)
    pv2 = pv1 & (counts >= config.min_mask_pixels)[None, :]
    mask_onehot = jnp.matmul(pv2.astype(nf), label_onehot_k)  # (P, C)
    pix_valid = jnp.any(pv2, axis=1)
    mask = jnp.concatenate([mask_onehot, pix_valid.astype(nf)[:, None]], axis=1)

    return Targets(labels=labels, regression=regression, mask=mask)
