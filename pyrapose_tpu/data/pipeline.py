"""Device-side preprocessing and target generation.

The reference computes targets per batch on the host in fork-worker processes
(preprocessing/generator.py:344-358 -> utils/anchors.py:72-287, Cython IoU).
Here the host only decodes/augments images and ships fixed-shape padded
ground-truth tensors; normalization, corner projection, and the full anchor
assignment run inside the jitted train step on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.geometry import AnchorConfig, anchor_targets, anchors_for_shape
from pyrapose_tpu.geometry.projection import project_box3d
from pyrapose_tpu.geometry.targets import TargetConfig, Targets

# Caffe-style BGR channel means (reference utils/image.py:57-60). Images are
# loaded RGB here; the mean is expressed in RGB order.
CAFFE_MEAN_BGR = (103.939, 116.779, 123.68)
CAFFE_MEAN_RGB = (123.68, 116.779, 103.939)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    image_shape: tuple[int, int] = (480, 640)
    max_instances: int = 16  # padded GT slots per image
    anchors: AnchorConfig = AnchorConfig()
    targets: TargetConfig = TargetConfig()
    num_classes: int = 13


class GroundTruth(NamedTuple):
    """Fixed-shape padded per-image ground truth (host -> device).

    boxes:  (K, 4) 2D AABBs.
    rot:    (K, 3, 3) object rotations.
    trans:  (K, 3) object translations (meters).
    labels: (K,) int32 class ids.
    valid:  (K,) bool.
    cam:    (4,) per-image intrinsics (fx, fy, cx, cy).
    mask_slots: (P3,) int32 instance-slot index per P3 pixel (-1 = bg).
    """

    boxes: jnp.ndarray
    rot: jnp.ndarray
    trans: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray
    cam: jnp.ndarray
    mask_slots: jnp.ndarray


def preprocess_images(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> float32 mean-subtracted (reference 'caffe' mode,
    utils/image.py:35-62). Runs on device as part of the jitted step."""
    mean = np.asarray(CAFFE_MEAN_RGB, np.float32)  # host constant
    return images_u8.astype(jnp.float32) - mean


def targets_from_poses(
    gt: GroundTruth,
    corners3d: jnp.ndarray,
    config: PipelineConfig,
) -> Targets:
    """Project GT poses to corner pixels, then run anchor assignment.

    Single image (vmap over batch). This is where the reference's host-side
    quaternion->matrix + projection loop (anchors.py:207-215) becomes one
    batched einsum + projection.
    """
    # host constant (numpy): avoids a device commit mid-trace + a tunnel
    # fetch at MLIR lowering on remote-attached TPUs (see inference.py)
    anchors = anchors_for_shape(config.image_shape, config.anchors)
    safe_labels = jnp.clip(gt.labels, 0, corners3d.shape[0] - 1)
    obj_corners = jnp.take(corners3d, safe_labels, axis=0)  # (K, 8, 3)
    corners16 = project_box3d(obj_corners, gt.rot, gt.trans, gt.cam[None, :])
    return anchor_targets(
        anchors,
        gt.boxes,
        corners16,
        gt.labels,
        gt.valid,
        gt.mask_slots,
        num_classes=config.num_classes,
        config=config.targets,
    )


def make_target_fn(corners3d: np.ndarray, config: PipelineConfig):
    """Batched jitted target generator: GroundTruth (B-leading) -> Targets."""
    corners = np.asarray(corners3d, np.float32)  # host constant

    @jax.jit
    def fn(gt: GroundTruth) -> Targets:
        return jax.vmap(lambda g: targets_from_poses(g, corners, config))(gt)

    return fn


def pad_ground_truth(
    boxes: np.ndarray,
    rot: np.ndarray,
    trans: np.ndarray,
    labels: np.ndarray,
    cam: np.ndarray,
    mask_slots: np.ndarray,
    max_instances: int,
) -> GroundTruth:
    """Host-side padding of variable-count annotations to fixed K slots."""
    k = max_instances
    n = min(len(labels), k)
    out_boxes = np.zeros((k, 4), np.float32)
    out_rot = np.tile(np.eye(3, dtype=np.float32), (k, 1, 1))
    out_trans = np.zeros((k, 3), np.float32)
    out_trans[:, 2] = 1.0  # benign depth for padding slots
    out_labels = np.zeros((k,), np.int32)
    out_valid = np.zeros((k,), bool)
    out_boxes[:n] = boxes[:n]
    out_rot[:n] = rot[:n]
    out_trans[:n] = trans[:n]
    out_labels[:n] = labels[:n]
    out_valid[:n] = True
    return GroundTruth(
        boxes=out_boxes,
        rot=out_rot,
        trans=out_trans,
        labels=out_labels,
        valid=out_valid,
        cam=cam.astype(np.float32),
        mask_slots=mask_slots.astype(np.int32),
    )


def stack_ground_truth(items: list[GroundTruth]) -> GroundTruth:
    """Stack per-image GroundTruth into a batch."""
    return GroundTruth(*[np.stack([getattr(g, f) for g in items]) for f in GroundTruth._fields])
