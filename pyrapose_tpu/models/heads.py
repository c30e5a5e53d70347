"""Prediction heads: dense 3D-box-corner regression, classification, mask.

Capability match of the reference submodels
(/root/reference/PyraPose/models/retinanet.py:9-131):

- regression head: 4x conv(512, 3x3, relu) + conv(A*16) — weights shared
  across pyramid levels; the reference adds L2(1e-3) regularization on this
  head, reproduced as a weight-decay term in the train step over the
  `box3d_head` subtree.
- classification head: 4x conv(256, 3x3, relu) + conv(A*C) with the focal
  prior-probability bias init b = -log((1-p)/p), p=0.01
  (initializers.py:23-39).
- mask head: 4x conv(256, 3x3, relu) + conv(C), applied to P3 only
  (retinanet.py:296).

TPU-first departures: heads emit LOGITS (sigmoid is fused into the loss /
decode where needed — the reference bakes sigmoid into the graph); outputs are
flattened (B, H*W*A, D) in NHWC row-major order, which matches the anchor grid
ordering of geometry/anchors.py exactly, so no gather/transpose is needed.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def prior_prob_bias_init(probability: float = 0.01):
    """Final-conv bias init so initial sigmoid activation = probability."""

    value = -math.log((1.0 - probability) / probability)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


_conv_kernel_init = nn.initializers.normal(stddev=0.01)


class ConvTower(nn.Module):
    """Shared stack of 3x3 same-padding relu convs."""

    features: int
    depth: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = nn.Conv(
                self.features,
                (3, 3),
                kernel_init=_conv_kernel_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        return x


class Box3DHead(nn.Module):
    """Dense 16-coordinate corner-offset regression, shared across levels."""

    num_anchors: int = 9
    num_values: int = 16
    feature_size: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> jnp.ndarray:
        tower = ConvTower(self.feature_size, dtype=self.dtype, name="tower")
        out_conv = nn.Conv(
            self.num_anchors * self.num_values,
            (3, 3),
            kernel_init=_conv_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )
        outs = []
        for f in features:
            y = out_conv(tower(f.astype(self.dtype)))
            outs.append(y.reshape(y.shape[0], -1, self.num_values))
        return jnp.concatenate(outs, axis=1).astype(jnp.float32)


class ClassificationHead(nn.Module):
    """Dense per-anchor class logits, shared across levels."""

    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior_probability: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> jnp.ndarray:
        tower = ConvTower(self.feature_size, dtype=self.dtype, name="tower")
        out_conv = nn.Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            kernel_init=_conv_kernel_init,
            bias_init=prior_prob_bias_init(self.prior_probability),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )
        outs = []
        for f in features:
            y = out_conv(tower(f.astype(self.dtype)))
            outs.append(y.reshape(y.shape[0], -1, self.num_classes))
        return jnp.concatenate(outs, axis=1).astype(jnp.float32)


class MaskHead(nn.Module):
    """P3-resolution per-class segmentation logits."""

    num_classes: int
    feature_size: int = 256
    prior_probability: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, p3: jnp.ndarray) -> jnp.ndarray:
        y = ConvTower(self.feature_size, dtype=self.dtype, name="tower")(
            p3.astype(self.dtype)
        )
        y = nn.Conv(
            self.num_classes,
            (3, 3),
            kernel_init=_conv_kernel_init,
            bias_init=prior_prob_bias_init(self.prior_probability),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )(y)
        return y.reshape(y.shape[0], -1, self.num_classes).astype(jnp.float32)
