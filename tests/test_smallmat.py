"""Unrolled small-matrix solvers vs numpy reference."""

import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.utils.smallmat import inverse_iteration_spd, solve_spd


def _spd(rng, batch, n):
    a = rng.standard_normal((batch, n, n)).astype(np.float32)
    return a @ a.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32)


class TestSolveSpd:
    def test_matches_numpy_6(self):
        rng = np.random.default_rng(0)
        a = _spd(rng, 32, 6)
        b = rng.standard_normal((32, 6)).astype(np.float32)
        x = np.asarray(solve_spd(jnp.asarray(a), jnp.asarray(b)))
        ref = np.linalg.solve(a, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)

    def test_matches_numpy_12(self):
        rng = np.random.default_rng(1)
        a = _spd(rng, 8, 12)
        b = rng.standard_normal((8, 12)).astype(np.float32)
        x = np.asarray(solve_spd(jnp.asarray(a), jnp.asarray(b)))
        ref = np.linalg.solve(a, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)

    def test_unbatched(self):
        rng = np.random.default_rng(2)
        a = _spd(rng, 1, 6)[0]
        b = rng.standard_normal(6).astype(np.float32)
        x = np.asarray(solve_spd(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=2e-4, atol=2e-4)


class TestInverseIteration:
    def test_finds_smallest_eigvec(self):
        rng = np.random.default_rng(3)
        n = 12
        # construct SPD with a known small-eigenvalue direction
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        vals = np.linspace(1.0, 10.0, n)
        vals[0] = 1e-5
        a = (q * vals) @ q.T
        a = a.astype(np.float32)[None]
        v = np.asarray(inverse_iteration_spd(jnp.asarray(a), n, iterations=3))[0]
        target = q[:, 0]
        cos = abs(float(v @ target))
        assert cos > 0.999
