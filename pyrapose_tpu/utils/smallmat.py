"""Unrolled small-matrix linear algebra for TPU.

jnp.linalg.solve / cho_factor on tiny systems (6x6 GN normal equations,
EPnP's 12x12 M^T M) lower to LU/Cholesky custom calls with sequential inner
loops — painfully latency-bound on TPU where thousands of such systems are
solved per step. For a STATIC size n, unrolling the Cholesky factorization
and triangular solves into ~n^3/6 elementwise ops turns the whole batch
into pure vectorized VPU work: every emitted op processes all (...) batch
lanes at once, no custom calls, no loops.

Numerics: standard Cholesky on SPD inputs in fp32; callers add diagonal
damping (both call sites already do).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(a: jnp.ndarray, n: int) -> list[list[jnp.ndarray]]:
    """Cholesky factor L (lower) of SPD a (..., n, n), as an n x n list of
    batched scalars (None above the diagonal). Fully unrolled for static n."""
    L: list[list[jnp.ndarray | None]] = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L  # type: ignore[return-value]


def cho_solve_unrolled(
    L: list[list[jnp.ndarray]], b: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Solve A x = b given A = L L^T from cholesky_unrolled; b (..., n)."""
    # forward: L y = b
    y: list[jnp.ndarray] = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    # backward: L^T x = y
    x: list[jnp.ndarray | None] = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)  # type: ignore[arg-type]


def solve_spd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = a^-1 b for SPD a (..., n, n), b (..., n); n static and small."""
    n = a.shape[-1]
    L = cholesky_unrolled(a, n)
    return cho_solve_unrolled(L, b, n)


def inverse_iteration_spd(
    a: jnp.ndarray, n: int, iterations: int = 3
) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of SPD a (..., n, n) by
    inverse iteration with one unrolled Cholesky factorization."""
    L = cholesky_unrolled(a, n)
    x = jnp.ones(a.shape[:-2] + (n,), a.dtype) / jnp.sqrt(float(n))
    for _ in range(iterations):
        x = cho_solve_unrolled(L, x, n)
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30
        )
    return x
