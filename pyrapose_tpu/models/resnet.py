"""ResNet backbone in flax.linen, NHWC, bf16-compute / f32-params.

Capability equivalent of the reference's keras-resnet ResNet50 backbone
(/root/reference/PyraPose/models/resnet.py:79-110): returns the C3/C4/C5
feature maps (strides 8/16/32) feeding the PFPN. Differences are deliberate
TPU choices, not omissions:

- NHWC layout and bfloat16 compute dtype so convs tile directly onto the MXU.
- `frozen_bn=True` reproduces keras-resnet's freeze_bn=True: BatchNorm always
  uses stored moving statistics (never updates them), which is the reference's
  training configuration (models/resnet.py:87).
- The reference also freezes the first ~40 layers' weights entirely
  (models/resnet.py:100-103); here that is expressed as an optax mask over the
  `stem` and `stage1` parameter subtrees (train/step.py), keeping the forward
  graph uniform.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial

import flax.linen as nn
import jax.numpy as jnp


class BottleneckBlock(nn.Module):
    """ResNet-v1 bottleneck: 1x1 reduce -> 3x3 -> 1x1 expand, post-activation."""

    filters: int
    strides: int = 1
    projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        residual = x
        y = conv(self.filters, (1, 1), strides=(self.strides, self.strides), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.projection:
            residual = conv(
                self.filters * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                name="proj_conv",
            )(x)
            residual = norm(name="proj_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-v1 feature extractor returning (C3, C4, C5)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True
    # remat: recompute each bottleneck block's internals in the backward
    # pass instead of storing them (jax.checkpoint at block granularity) —
    # cuts peak activation memory ~3x per block for ~1 extra block forward
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        filters = (64, 128, 256, 512)
        block_cls = (
            nn.remat(BottleneckBlock, static_argnums=(1,))
            if self.remat
            else BottleneckBlock
        )
        for stage, (blocks, f) in enumerate(zip(self.stage_sizes, filters)):
            for block in range(blocks):
                strides = 2 if block == 0 and stage > 0 else 1
                x = block_cls(
                    filters=f,
                    strides=strides,
                    projection=block == 0,
                    dtype=self.dtype,
                    frozen_bn=self.frozen_bn,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x, train)  # train positional: remat static_argnums=(1,)
            outputs.append(x)
        # outputs = [C2, C3, C4, C5]; the pyramid consumes C3..C5
        return tuple(outputs[1:])


ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3))
ResNet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3))
ResNet152 = partial(ResNet, stage_sizes=(3, 8, 36, 3))
