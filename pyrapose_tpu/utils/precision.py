"""Full-precision contraction helpers for geometry/solver code.

JAX's default matmul precision on TPU (and the host backend emulating it) is
bf16 passes on the MXU — perfect for conv/dense layers, catastrophic for small
linear algebra (PnP normal equations, Procrustes, covariance eigensolves):
a 3x3 product silently loses ~8 mantissa bits. All solver-path contractions go
through these helpers, which pin Precision.HIGHEST (fp32 accumulation with
error-compensated passes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def hdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp.dot at HIGHEST precision."""
    return jnp.dot(a, b, precision=_HIGH)


def hmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp.matmul at HIGHEST precision."""
    return jnp.matmul(a, b, precision=_HIGH)


def heinsum(subscripts: str, *operands: jnp.ndarray) -> jnp.ndarray:
    """jnp.einsum at HIGHEST precision."""
    return jnp.einsum(subscripts, *operands, precision=_HIGH)
