"""EfficientNet backbone in flax.linen, NHWC, bf16-compute.

Capability equivalent of the reference's experimental EfficientNet backbone
(/root/reference/PyraPose/models/efficientnet.py:26-80, keras-efficientnets
EfficientNetB1). The reference builds two towers (RGB + depth) at fixed
resolution; this framework keeps the standard single-tower RGB form — the
depth tower was unused by the default training path (SURVEY.md component 6).

Returns (C3, C4, C5): the outputs of stages 3, 5, and 7 (strides 8/16/32).
MBConv uses depthwise convs via feature_group_count, which Mosaic/XLA maps
to VPU-friendly per-channel ops; squeeze-excite reductions are small matmuls.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BlockSpec(NamedTuple):
    expand: int
    filters: int
    repeats: int
    strides: int
    kernel: int


# EfficientNet-B0 stage table (Tan & Le 2019, Table 1).
_B0_BLOCKS = (
    BlockSpec(1, 16, 1, 1, 3),
    BlockSpec(6, 24, 2, 2, 3),
    BlockSpec(6, 40, 2, 2, 5),
    BlockSpec(6, 80, 3, 2, 3),
    BlockSpec(6, 112, 3, 1, 5),
    BlockSpec(6, 192, 4, 2, 5),
    BlockSpec(6, 320, 1, 1, 3),
)


def _round_filters(filters: int, width: float) -> int:
    """Width scaling with divisor-8 rounding (official implementation)."""
    f = filters * width
    new = max(8, int(f + 4) // 8 * 8)
    if new < 0.9 * f:
        new += 8
    return new


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(repeats * depth))


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    expand: int
    filters: int
    strides: int
    kernel: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        cin = x.shape[-1]
        mid = cin * self.expand
        y = x
        if self.expand != 1:
            y = nn.silu(norm(name="expand_bn")(conv(mid, (1, 1), name="expand_conv")(y)))
        y = conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            feature_group_count=mid,
            name="dw_conv",
        )(y)
        y = nn.silu(norm(name="dw_bn")(y))
        # squeeze-excite over the pre-expansion channel count
        se_ch = max(1, int(cin * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.silu(
            nn.Conv(se_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_reduce")(s)
        )
        s = nn.sigmoid(
            nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_expand")(s)
        )
        y = y * s
        y = norm(name="project_bn")(conv(self.filters, (1, 1), name="project_conv")(y))
        if self.strides == 1 and cin == self.filters:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """EfficientNet feature extractor returning (C3, C4, C5)."""

    width: float = 1.0
    depth: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True
    blocks: Sequence[BlockSpec] = _B0_BLOCKS

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(
            _round_filters(32, self.width), (3, 3), strides=(2, 2),
            padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="stem_conv",
        )(x)
        x = nn.silu(norm(name="stem_bn")(x))

        features = {}
        stride = 2
        for si, spec in enumerate(self.blocks):
            filters = _round_filters(spec.filters, self.width)
            repeats = _round_repeats(spec.repeats, self.depth)
            for ri in range(repeats):
                strides = spec.strides if ri == 0 else 1
                if strides == 2:
                    # stage ends: record the feature map entering the stride
                    features[stride] = x
                    stride *= 2
                x = MBConv(
                    expand=spec.expand,
                    filters=filters,
                    strides=strides,
                    kernel=spec.kernel,
                    dtype=self.dtype,
                    frozen_bn=self.frozen_bn,
                    name=f"stage{si + 1}_block{ri + 1}",
                )(x, train=train)
        features[stride] = x  # final stride-32 map
        return features[8], features[16], features[32]


EfficientNetB0 = partial(EfficientNet, width=1.0, depth=1.0)
EfficientNetB1 = partial(EfficientNet, width=1.0, depth=1.1)
EfficientNetB2 = partial(EfficientNet, width=1.1, depth=1.2)
EfficientNetB3 = partial(EfficientNet, width=1.2, depth=1.4)
