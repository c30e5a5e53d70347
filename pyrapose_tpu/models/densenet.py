"""DenseNet backbone in flax.linen, NHWC, bf16-compute.

Capability equivalent of the reference's experimental DenseNet backbone
(/root/reference/PyraPose/models/densenet.py:24-49, wrapping keras
DenseNet-121): returns (C3, C4, C5) feature maps at strides 8/16/32 for the
PFPN. Dense connectivity is expressed with channel concatenation, which XLA
fuses with the following 1x1 convs; BatchNorm follows the same frozen
semantics as the ResNet backbone.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    """BN-relu-1x1(4k) -> BN-relu-3x3(k), output concatenated by the block."""

    growth_rate: int
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1.001e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        y = nn.relu(norm(name="bn1")(x))
        y = conv(4 * self.growth_rate, (1, 1), name="conv1")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(self.growth_rate, (3, 3), name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """DenseNet-BC feature extractor returning (C3, C4, C5)."""

    block_sizes: Sequence[int] = (6, 12, 24, 16)  # DenseNet-121
    growth_rate: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.99,
            epsilon=1.001e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="stem_conv",
        )(x)
        x = nn.relu(norm(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        for bi, layers in enumerate(self.block_sizes):
            for li in range(layers):
                x = DenseLayer(
                    self.growth_rate,
                    dtype=self.dtype,
                    frozen_bn=self.frozen_bn,
                    name=f"block{bi + 1}_layer{li + 1}",
                )(x, train=train)
            if bi < len(self.block_sizes) - 1:
                # transition: BN-relu-1x1 (halve channels) + 2x2 avg pool
                x = nn.relu(norm(name=f"trans{bi + 1}_bn")(x))
                x = nn.Conv(
                    x.shape[-1] // 2, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"trans{bi + 1}_conv",
                )(x)
                outputs.append(x)  # pre-pool: stride of this block
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(norm(name="final_bn")(x))
        outputs.append(x)
        # outputs: [C2(pre-pool s4), C3(s8), C4(s16), C5(s32)]
        return tuple(outputs[1:])


DenseNet121 = partial(DenseNet, block_sizes=(6, 12, 24, 16))
DenseNet169 = partial(DenseNet, block_sizes=(6, 12, 32, 32))
DenseNet201 = partial(DenseNet, block_sizes=(6, 12, 48, 32))
