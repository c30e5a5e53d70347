import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import expit

from pyrapose_tpu.losses import (
    focal_loss,
    orthogonal_l1_loss,
    smooth_l1_loss,
    total_loss,
)


def _np_focal(labels_state, logits, alpha=0.25, gamma=2.0, scale=1.0):
    """Reference semantics (losses.py:22-68): gather non-ignored, focal BCE,
    sum / max(1, #pos)."""
    labels = labels_state[..., :-1]
    state = labels_state[..., -1]
    keep = state != -1
    l = labels[keep]
    p = expit(logits[keep])
    alpha_f = np.where(l == 1, alpha, 1 - alpha)
    fw = alpha_f * np.where(l == 1, 1 - p, p) ** gamma
    eps = 1e-12
    bce = -(l * np.log(p + eps) + (1 - l) * np.log(1 - p + eps))
    num_pos = max(1.0, (state == 1).sum())
    return scale * (fw * bce).sum() / num_pos


class TestFocal:
    def test_matches_reference_semantics(self, rng):
        B, N, C = 2, 50, 3
        logits = rng.normal(size=(B, N, C)).astype(np.float32)
        labels = np.zeros((B, N, C + 1), np.float32)
        state = rng.choice([-1.0, 0.0, 1.0], size=(B, N), p=[0.2, 0.6, 0.2])
        labels[..., -1] = state
        for b in range(B):
            for n in range(N):
                if state[b, n] == 1:
                    labels[b, n, rng.integers(0, C)] = 1.0
        got = float(focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
        expected = _np_focal(labels, logits)
        assert got == pytest.approx(expected, rel=1e-4)

    def test_all_ignored_is_zero(self):
        labels = np.zeros((1, 10, 4), np.float32)
        labels[..., -1] = -1.0
        logits = np.ones((1, 10, 3), np.float32)
        assert float(focal_loss(jnp.asarray(labels), jnp.asarray(logits))) == 0.0

    def test_no_positives_normalizer_one(self):
        # all-negative anchors: loss normalized by 1, not 0
        labels = np.zeros((1, 5, 3), np.float32)
        logits = np.zeros((1, 5, 2), np.float32)
        got = float(focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
        # each element: alpha_factor=0.75, p=0.5 -> fw = 0.75*0.25, bce=log(2)
        expected = 0.75 * 0.25 * np.log(2) * 10
        assert got == pytest.approx(expected, rel=1e-5)

    def test_mask_scale(self, rng):
        labels = np.zeros((1, 5, 3), np.float32)
        logits = rng.normal(size=(1, 5, 2)).astype(np.float32)
        full = float(focal_loss(jnp.asarray(labels), jnp.asarray(logits)))
        scaled = float(focal_loss(jnp.asarray(labels), jnp.asarray(logits), scale=0.1))
        assert scaled == pytest.approx(0.1 * full, rel=1e-5)


def _np_orth_terms(r):
    pairs = [
        ((0, 6), (2, 4)), ((0, 6), (8, 14)), ((0, 2), (6, 4)), ((0, 2), (8, 10)),
        ((0, 8), (2, 10)), ((0, 8), (6, 14)), ((12, 10), (14, 8)), ((12, 10), (4, 2)),
        ((12, 4), (10, 2)), ((12, 4), (14, 6)), ((12, 14), (4, 6)), ((12, 14), (10, 8)),
    ]
    out = []
    for (a, b), (c, d) in pairs:
        out.append((r[..., a] - r[..., b]) - (r[..., c] - r[..., d]))  # x term
        out.append((r[..., a + 1] - r[..., b + 1]) - (r[..., c + 1] - r[..., d + 1]))  # y
    return np.stack(out, axis=-1)


def _np_orth_l1(targets_state, pred, weight=0.125, sigma=3.0):
    """Reference orthogonal_l1 (losses.py:321-408)."""
    target = targets_state[..., :-1]
    state = targets_state[..., -1]
    pos = state == 1
    p, t = pred[pos], target[pos]
    sig2 = sigma * sigma
    diff = np.abs(p - t)
    xy = np.where(diff < 1 / sig2, 0.5 * sig2 * diff**2, diff - 0.5 / sig2)
    orth = np.abs(_np_orth_terms(p) - _np_orth_terms(t)).mean(axis=-1)
    norm = max(1.0, pos.sum())
    return weight * (0.8 * xy.sum() / norm + 0.2 * orth.sum() / norm)


class TestOrthogonalL1:
    def test_matches_reference_semantics(self, rng):
        B, N = 2, 40
        pred = rng.normal(size=(B, N, 16)).astype(np.float32)
        tgt = np.zeros((B, N, 17), np.float32)
        tgt[..., :16] = rng.normal(size=(B, N, 16))
        tgt[..., -1] = rng.choice([-1.0, 0.0, 1.0], size=(B, N), p=[0.1, 0.6, 0.3])
        got = float(orthogonal_l1_loss(jnp.asarray(tgt), jnp.asarray(pred)))
        expected = _np_orth_l1(tgt, pred)
        assert got == pytest.approx(expected, rel=1e-4)

    def test_perfect_prediction_zero(self, rng):
        tgt = np.zeros((1, 10, 17), np.float32)
        tgt[..., :16] = rng.normal(size=(1, 10, 16))
        tgt[..., -1] = 1.0
        got = float(orthogonal_l1_loss(jnp.asarray(tgt), jnp.asarray(tgt[..., :16])))
        assert got == pytest.approx(0.0, abs=1e-6)

    def test_only_positives_counted(self, rng):
        pred = rng.normal(size=(1, 10, 16)).astype(np.float32)
        tgt = np.zeros((1, 10, 17), np.float32)
        tgt[..., :16] = rng.normal(size=(1, 10, 16))
        # no positives -> zero loss (ignored/negative anchors contribute nothing)
        tgt[..., -1] = 0.0
        assert float(orthogonal_l1_loss(jnp.asarray(tgt), jnp.asarray(pred))) == 0.0


class TestSmoothL1:
    def test_quadratic_and_linear_regions(self):
        tgt = np.zeros((1, 2, 17), np.float32)
        tgt[..., -1] = 1.0
        pred = np.zeros((1, 2, 16), np.float32)
        pred[0, 0, 0] = 0.05  # |d| < 1/9 -> quadratic: 0.5*9*0.05^2
        pred[0, 1, 0] = 1.0  # linear: 1 - 0.5/9
        got = float(smooth_l1_loss(jnp.asarray(tgt), jnp.asarray(pred)))
        expected = (0.5 * 9 * 0.05**2 + 1.0 - 0.5 / 9) / 2.0
        assert got == pytest.approx(expected, rel=1e-5)


def test_total_loss_composition(rng):
    B, N, P, C = 1, 30, 16, 2
    outputs = {
        "box3d": jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32)),
        "cls_logits": jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32)),
        "mask_logits": jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32)),
    }
    labels = np.zeros((B, N, C + 1), np.float32)
    labels[0, :3, 0] = 1.0
    labels[0, :3, -1] = 1.0
    reg = np.zeros((B, N, 17), np.float32)
    reg[0, :3, -1] = 1.0
    mask = np.zeros((B, P, C + 1), np.float32)
    targets = {
        "labels": jnp.asarray(labels),
        "regression": jnp.asarray(reg),
        "mask": jnp.asarray(mask),
    }
    total, parts = total_loss(outputs, targets)
    assert float(total) == pytest.approx(
        float(parts["loss_box3d"] + parts["loss_cls"] + parts["loss_mask"]), rel=1e-6
    )
    assert float(total) > 0


# --- research loss variants (reference dead-code surface, losses.py:120-318,
# 411-441) -----------------------------------------------------------------


def test_cross_loss_matches_numpy(rng):
    from pyrapose_tpu.losses import cross_loss

    B, N, C = 2, 40, 3
    logits = rng.normal(size=(B, N, C)).astype(np.float32)
    labels = np.zeros((B, N, C + 1), np.float32)
    onehot = rng.integers(0, C, size=(B, N))
    labels[np.arange(B)[:, None], np.arange(N)[None], onehot] = 1.0
    state = rng.choice([-1.0, 0.0, 1.0], size=(B, N)).astype(np.float32)
    labels[..., -1] = state

    # numpy: softmax CE over non-ignored anchors / #non-ignored
    ex = np.exp(logits - logits.max(-1, keepdims=True))
    logp = np.log(ex / ex.sum(-1, keepdims=True))
    ce = -(labels[..., :-1] * logp).sum(-1)
    keep = state != -1
    want = 50.0 * ce[keep].sum() / max(keep.sum(), 1)

    got = float(cross_loss(jnp.asarray(labels), jnp.asarray(logits)))
    assert got == pytest.approx(want, rel=1e-5)


def test_weighted_variants_positive_masking(rng):
    from pyrapose_tpu.losses import (
        smooth_l1_pose_loss,
        smooth_l1_xy_loss,
        weighted_l1_loss,
        weighted_mse_loss,
        weighted_msle_loss,
    )

    B, N = 1, 20
    pred = rng.normal(size=(B, N, 16)).astype(np.float32)
    tgt = np.zeros((B, N, 17), np.float32)
    tgt[..., :-1] = rng.normal(size=(B, N, 16)).astype(np.float32)
    tgt[0, :4, -1] = 1.0  # 4 positives
    p, t = jnp.asarray(pred), jnp.asarray(tgt)

    d = pred[0, :4] - tgt[0, :4, :-1]
    assert float(weighted_mse_loss(t, p)) == pytest.approx(
        60.0 * (d**2).mean(-1).sum() / 4, rel=1e-5
    )
    assert float(weighted_l1_loss(t, p)) == pytest.approx(
        1.6 * np.abs(d).mean(-1).sum() / 4, rel=1e-5
    )
    lp = np.log1p(np.maximum(pred[0, :4], -1 + 1e-7))
    lt = np.log1p(np.maximum(tgt[0, :4, :-1], -1 + 1e-7))
    assert float(weighted_msle_loss(t, p)) == pytest.approx(
        5.0 * ((lp - lt) ** 2).mean(-1).sum() / 4, rel=1e-5
    )
    # pose/xy variants are 0.1x the plain smooth_l1
    assert float(smooth_l1_pose_loss(t, p)) == pytest.approx(
        0.1 * float(smooth_l1_loss(t, p)), rel=1e-6
    )
    assert float(smooth_l1_xy_loss(t, p)) == pytest.approx(
        float(smooth_l1_pose_loss(t, p)), rel=1e-6
    )
    # no positives -> zero loss, no NaN
    tgt[..., -1] = 0.0
    assert float(weighted_mse_loss(jnp.asarray(tgt), p)) == 0.0
