"""Anchor grid generation.

Semantics match the reference RetinaNet-style anchoring
(/root/reference/PyraPose/utils/anchors.py:372-478): three pyramid levels
P3/P4/P5 with sizes 32/64/128, strides 8/16/32, three aspect ratios
{0.5, 1, 2} x three scales {2^0, 2^(1/3), 2^(2/3)} = 9 anchors per location,
centers at (i + 0.5) * stride, flattened row-major over (H, W) with the anchor
index fastest.

Anchors are static for a fixed input resolution, so they are computed once in
numpy at trace time and baked into the jitted program as constants — there is
no runtime anchor layer.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import numpy as np


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor generation parameters (reference anchors.py:48-53)."""

    sizes: tuple[float, ...] = (32.0, 64.0, 128.0)
    strides: tuple[int, ...] = (8, 16, 32)
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    scales: tuple[float, ...] = (
        1.0,
        2.0 ** (1.0 / 3.0),
        2.0 ** (2.0 / 3.0),
    )
    pyramid_levels: tuple[int, ...] = (3, 4, 5)

    @property
    def num_anchors_per_location(self) -> int:
        return len(self.ratios) * len(self.scales)

    def num_anchors(self, image_shape: tuple[int, int]) -> int:
        n = 0
        for h, w in pyramid_shapes(image_shape, self.pyramid_levels):
            n += h * w * self.num_anchors_per_location
        return n


def pyramid_shapes(
    image_shape: tuple[int, int], levels: tuple[int, ...] = (3, 4, 5)
) -> list[tuple[int, int]]:
    """Feature-map spatial shape at each pyramid level (ceil-divide by 2^level).

    Mirrors reference `guess_shapes` (anchors.py:357-369).
    """
    h, w = int(image_shape[0]), int(image_shape[1])
    return [
        ((h + 2**lvl - 1) // 2**lvl, (w + 2**lvl - 1) // 2**lvl) for lvl in levels
    ]


def generate_base_anchors(
    base_size: float,
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
    scales: tuple[float, ...] = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0)),
) -> np.ndarray:
    """(R*S, 4) anchors centered at the origin, (x1, y1, x2, y2).

    Anchor i has ratio ratios[i // len(scales)] and scale scales[i % len(scales)];
    width = base * scale / sqrt(ratio), height = width * ratio (area-preserving),
    matching reference `generate_anchors` (anchors.py:447-478).
    """
    out = np.zeros((len(ratios) * len(scales), 4), dtype=np.float64)
    idx = 0
    for r in ratios:
        for s in scales:
            w = base_size * s / math.sqrt(r)
            h = w * r
            out[idx] = (-w / 2.0, -h / 2.0, w / 2.0, h / 2.0)
            idx += 1
    return out


def shift_anchors(
    feat_shape: tuple[int, int], stride: int, base_anchors: np.ndarray
) -> np.ndarray:
    """Tile base anchors over a feature grid; centers at (i+0.5)*stride.

    Output is (H*W*A, 4), row-major over (H, W), anchor index fastest —
    identical ordering to reference `shift` (anchors.py:415-444), which is also
    the ordering produced by flattening an NHWC head output.
    """
    fh, fw = feat_shape
    cx = (np.arange(fw, dtype=np.float64) + 0.5) * stride
    cy = (np.arange(fh, dtype=np.float64) + 0.5) * stride
    sx, sy = np.meshgrid(cx, cy)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
    return all_anchors.reshape(-1, 4)


@lru_cache(maxsize=16)
def _anchors_for_shape_cached(
    image_shape: tuple[int, int], config: AnchorConfig
) -> np.ndarray:
    anchors = []
    shapes = pyramid_shapes(image_shape, config.pyramid_levels)
    for i, fs in enumerate(shapes):
        base = generate_base_anchors(config.sizes[i], config.ratios, config.scales)
        anchors.append(shift_anchors(fs, config.strides[i], base))
    out = np.concatenate(anchors, axis=0).astype(np.float32)
    out.setflags(write=False)
    return out


def anchors_for_shape(
    image_shape: tuple[int, int], config: AnchorConfig | None = None
) -> np.ndarray:
    """All anchors for an image shape, (N, 4) float32, P3..P5 concatenated.

    Cached: for the canonical 480x640 input this is a (56700, 4) constant.
    """
    if config is None:
        config = AnchorConfig()
    return _anchors_for_shape_cached((int(image_shape[0]), int(image_shape[1])), config)
