"""PFPN — the bidirectional 3-level pyramid of PyraPose.

Topology reproduces the reference's `__create_sparceFPN`
(/root/reference/PyraPose/models/retinanet.py:180-214) exactly:

    P3 = 1x1(C3); P4 = 1x1(C4); P5 = 1x1(C5)         # laterals
    P4_mid = 3x3(up(P5) + P4)                         # top-down
    P3_mid = 3x3(up(P4) + P3)
    P3_out = 3x3(P3_mid + P3)                         # skip
    P4_out = 3x3(down(P3_mid) + P4_mid + P4)          # bottom-up + skip
    P5_out = 3x3(down(P4_mid) + P5)

up() is a nearest x2 resize to the finer level's shape (UpsampleLike,
layers/_misc.py:96-115); down() is a stride-2 3x3 conv. All convs are
bf16-compute NHWC for MXU tiling.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample_like(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC `x` to `target`'s spatial shape."""
    b, h, w, c = x.shape
    th, tw = target.shape[1], target.shape[2]
    if (th, tw) == (h, w):
        return x
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class PFPN(nn.Module):
    """Bidirectional pyramid; consumes (C3, C4, C5), produces (P3, P4, P5)."""

    feature_size: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, features: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c3, c4, c5 = (f.astype(self.dtype) for f in features)
        conv = partial(nn.Conv, self.feature_size, dtype=self.dtype, param_dtype=jnp.float32)

        p3 = conv((1, 1), name="lateral_p3")(c3)
        p4 = conv((1, 1), name="lateral_p4")(c4)
        p5 = conv((1, 1), name="lateral_p5")(c5)

        p5_up = upsample_like(p5, p4)
        p4_up = upsample_like(p4, p3)

        p4_mid = conv((3, 3), name="td_p4")(p5_up + p4)
        p3_mid = conv((3, 3), name="td_p3")(p4_up + p3)

        p3_down = conv((3, 3), strides=(2, 2), name="down_p3")(p3_mid)
        p3_out = conv((3, 3), name="out_p3")(p3_mid + p3)

        p4_down = conv((3, 3), strides=(2, 2), name="down_p4")(p4_mid)
        p4_out = conv((3, 3), name="out_p4")(p3_down + p4_mid + p4)

        p5_out = conv((3, 3), name="out_p5")(p4_down + p5)

        return p3_out, p4_out, p5_out
