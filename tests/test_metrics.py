import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from pyrapose_tpu.eval import (
    add_metric,
    adi_metric,
    reprojection_error,
    rotation_error_deg,
    translation_error,
)

CAM = jnp.array([572.4114, 573.57043, 325.2611, 242.04899])


def test_add_identity_zero(rng):
    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (100, 3)).astype(np.float32))
    r = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 1.0])
    assert float(add_metric(r, t, r, t, pts)) == pytest.approx(0.0, abs=1e-7)


def test_add_pure_translation(rng):
    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (100, 3)).astype(np.float32))
    r = jnp.eye(3)
    t1 = jnp.array([0.0, 0.0, 1.0])
    t2 = jnp.array([0.01, 0.0, 1.0])
    assert float(add_metric(r, t1, r, t2, pts)) == pytest.approx(0.01, rel=1e-5)


def test_add_matches_numpy_reference(rng):
    """Reference add (pose_error.py:210-224): mean norm of pose difference."""
    pts = rng.uniform(-0.05, 0.05, (200, 3))
    r1 = ScipyRot.random(random_state=1).as_matrix()
    r2 = ScipyRot.random(random_state=2).as_matrix()
    t1, t2 = np.array([0, 0, 1.0]), np.array([0.01, -0.02, 1.05])
    expected = np.linalg.norm((pts @ r1.T + t1) - (pts @ r2.T + t2), axis=1).mean()
    got = float(add_metric(jnp.asarray(r1), jnp.asarray(t1), jnp.asarray(r2), jnp.asarray(t2), jnp.asarray(pts)))
    assert got == pytest.approx(expected, rel=1e-4)


def test_adi_symmetric_invariance(rng):
    """ADI of a rotationally-symmetric ring under its symmetry rotation ~ 0."""
    theta = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    ring = np.stack([0.05 * np.cos(theta), 0.05 * np.sin(theta), np.zeros_like(theta)], axis=1)
    rz = ScipyRot.from_euler("z", 10, degrees=True).as_matrix()  # symmetry rot
    t = np.array([0, 0, 1.0])
    add = float(add_metric(jnp.asarray(rz), jnp.asarray(t), jnp.eye(3), jnp.asarray(t), jnp.asarray(ring)))
    adi = float(adi_metric(jnp.asarray(rz), jnp.asarray(t), jnp.eye(3), jnp.asarray(t), jnp.asarray(ring)))
    assert add > 0.005  # ADD sees the rotation
    assert adi < 1e-4  # ADI does not


def test_adi_matches_kdtree_semantics(rng):
    """Reference adi (pose_error.py:227-246): nearest estimated point per GT point."""
    from scipy import spatial

    pts = rng.uniform(-0.05, 0.05, (128, 3))
    r1 = ScipyRot.random(random_state=3).as_matrix()
    r2 = ScipyRot.random(random_state=4).as_matrix()
    t1, t2 = np.array([0, 0, 1.0]), np.array([0.02, 0.01, 0.98])
    pe = pts @ r1.T + t1
    pg = pts @ r2.T + t2
    nn_dists, _ = spatial.cKDTree(pe).query(pg, k=1)
    expected = nn_dists.mean()
    got = float(adi_metric(jnp.asarray(r1), jnp.asarray(t1), jnp.asarray(r2), jnp.asarray(t2), jnp.asarray(pts)))
    assert got == pytest.approx(expected, rel=1e-3)


def test_rotation_error():
    r1 = jnp.eye(3)
    r2 = jnp.asarray(ScipyRot.from_euler("y", 30, degrees=True).as_matrix())
    assert float(rotation_error_deg(r1, r2)) == pytest.approx(30.0, abs=1e-3)
    assert float(rotation_error_deg(r1, r1)) == pytest.approx(0.0, abs=1e-3)


def test_translation_error():
    t1 = jnp.array([0.0, 0.0, 1.0])
    t2 = jnp.array([0.03, 0.04, 1.0])
    assert float(translation_error(t1, t2)) == pytest.approx(0.05, rel=1e-6)


def test_reprojection_error_zero_and_positive(rng):
    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (50, 3)).astype(np.float32))
    r = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 1.0])
    assert float(reprojection_error(r, t, r, t, pts, CAM)) == pytest.approx(0.0, abs=1e-5)
    t2 = jnp.array([0.01, 0.0, 1.0])
    # 1 cm x-shift at 1 m with fx~572 -> ~5.7 px
    got = float(reprojection_error(r, t2, r, t, pts, CAM))
    assert got == pytest.approx(5.72, abs=0.3)


def test_batched_metrics(rng):
    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (4, 64, 3)).astype(np.float32))
    r = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    t = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
    out = add_metric(r, t, r, t, pts)
    assert out.shape == (4,)
    out2 = adi_metric(r, t, r, t, pts)
    assert out2.shape == (4,)
