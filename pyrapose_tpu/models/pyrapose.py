"""Full PyraPose model: backbone -> PFPN -> {3Dbox, cls, mask} heads.

Assembly mirrors the reference network builder
(/root/reference/PyraPose/models/retinanet.py:260-299): shared heads applied
to P3/P4/P5 with per-level outputs concatenated along the anchor axis, and the
mask head on P3 only. The "inference graph" of the reference
(retinanet_bbox, retinanet.py:302-335) — anchor decode of the 16 corner
offsets — is a pure function here (`decode_predictions`) rather than a second
model: anchors are trace-time constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pyrapose_tpu.geometry import AnchorConfig, anchors_for_shape, decode_box3d
from pyrapose_tpu.models.heads import Box3DHead, ClassificationHead, MaskHead
from pyrapose_tpu.models.pfpn import PFPN
from pyrapose_tpu.models.resnet import ResNet, ResNet50


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_classes: int = 13  # LineMOD default
    backbone: str = "resnet50"
    feature_size: int = 256
    regression_feature_size: int = 512
    anchors: AnchorConfig = AnchorConfig()
    frozen_bn: bool = True
    compute_dtype: str = "bfloat16"

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)


_BACKBONES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class PyraPose(nn.Module):
    """Single-shot 6D pose network. Input NHWC float32; outputs logits/deltas.

    Returns a dict:
        box3d:      (B, N, 16) corner-offset deltas (decode with anchors)
        cls_logits: (B, N, C)
        mask_logits:(B, P3, C)
    """

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        cfg = self.config
        if cfg.backbone not in _BACKBONES:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")
        backbone = ResNet(
            stage_sizes=_BACKBONES[cfg.backbone],
            dtype=cfg.dtype,
            frozen_bn=cfg.frozen_bn,
            name="backbone",
        )
        c3, c4, c5 = backbone(images, train=train)
        p3, p4, p5 = PFPN(cfg.feature_size, dtype=cfg.dtype, name="pfpn")((c3, c4, c5))

        a = cfg.anchors.num_anchors_per_location
        box3d = Box3DHead(
            num_anchors=a,
            feature_size=cfg.regression_feature_size,
            dtype=cfg.dtype,
            name="box3d_head",
        )((p3, p4, p5))
        cls_logits = ClassificationHead(
            num_classes=cfg.num_classes,
            num_anchors=a,
            feature_size=cfg.feature_size,
            dtype=cfg.dtype,
            name="cls_head",
        )((p3, p4, p5))
        mask_logits = MaskHead(
            num_classes=cfg.num_classes,
            feature_size=cfg.feature_size,
            dtype=cfg.dtype,
            name="mask_head",
        )(p3)
        return {"box3d": box3d, "cls_logits": cls_logits, "mask_logits": mask_logits}


def decode_predictions(
    outputs: dict[str, jnp.ndarray],
    image_shape: tuple[int, int],
    config: ModelConfig = ModelConfig(),
) -> dict[str, jnp.ndarray]:
    """Inference-graph equivalent of the reference's retinanet_bbox.

    Converts raw head outputs to pixel-space corner predictions and class
    scores:
        boxes3d: (B, N, 16) projected-corner pixel coordinates
        scores:  (B, N, C) sigmoid class probabilities
        masks:   (B, P3, C) sigmoid mask probabilities
    """
    anchors = jnp.asarray(anchors_for_shape(image_shape, config.anchors))
    boxes3d = decode_box3d(anchors[None], outputs["box3d"])
    return {
        "boxes3d": boxes3d,
        "scores": nn.sigmoid(outputs["cls_logits"]),
        "masks": nn.sigmoid(outputs["mask_logits"]),
    }


def create_model(config: ModelConfig | None = None, **overrides: Any) -> PyraPose:
    if config is None:
        config = ModelConfig(**overrides)
    elif overrides:
        config = dataclasses.replace(config, **overrides)
    return PyraPose(config=config)
