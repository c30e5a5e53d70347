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
    # block-level rematerialization: trade ~1 extra block forward in the
    # backward pass for not storing intra-block activations (enables larger
    # train batches under HBM pressure; no effect on inference)
    remat: bool = False

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)


def _make_backbone(name: str, dtype, frozen_bn: bool, remat: bool = False):
    """Backbone registry (reference models/__init__.py:55-65 dispatches by
    name substring to resnet/densenet/efficientnet builders)."""
    resnet_sizes = {
        "resnet10": (1, 1, 1, 1),  # smoke/test backbone (fast compile)
        "resnet50": (3, 4, 6, 3),
        "resnet101": (3, 4, 23, 3),
        "resnet152": (3, 8, 36, 3),
    }
    if name in resnet_sizes:
        return ResNet(
            stage_sizes=resnet_sizes[name], dtype=dtype, frozen_bn=frozen_bn,
            remat=remat, name="backbone",
        )
    if name.startswith("densenet"):
        from pyrapose_tpu.models.densenet import DenseNet

        sizes = {
            "densenet121": (6, 12, 24, 16),
            "densenet169": (6, 12, 32, 32),
            "densenet201": (6, 12, 48, 32),
        }
        if name not in sizes:
            raise ValueError(f"unknown backbone {name!r}")
        return DenseNet(
            block_sizes=sizes[name], dtype=dtype, frozen_bn=frozen_bn,
            name="backbone",
        )
    if name.startswith("efficientnet"):
        from pyrapose_tpu.models.efficientnet import EfficientNet

        scales = {
            "efficientnetb0": (1.0, 1.0),
            "efficientnetb1": (1.0, 1.1),
            "efficientnetb2": (1.1, 1.2),
            "efficientnetb3": (1.2, 1.4),
        }
        if name not in scales:
            raise ValueError(f"unknown backbone {name!r}")
        w, d = scales[name]
        return EfficientNet(
            width=w, depth=d, dtype=dtype, frozen_bn=frozen_bn, name="backbone"
        )
    raise ValueError(f"unknown backbone {name!r}")


BACKBONE_NAMES = (
    "resnet50", "resnet101", "resnet152",
    "densenet121", "densenet169", "densenet201",
    "efficientnetb0", "efficientnetb1", "efficientnetb2", "efficientnetb3",
)


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
        backbone = _make_backbone(cfg.backbone, cfg.dtype, cfg.frozen_bn, cfg.remat)
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
    # host constant: numpy embeds at lowering without a device round-trip
    anchors = anchors_for_shape(image_shape, config.anchors)
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
