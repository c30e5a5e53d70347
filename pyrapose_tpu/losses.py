"""Training losses: focal classification, focal mask, orthogonal-L1 regression.

Numerics match the reference (/root/reference/PyraPose/losses.py) but the
implementation is static-shape: the reference filters anchors with
`where`+`gather_nd` (dynamic shapes, impossible under XLA on TPU); here every
anchor's loss is computed and masked by the anchor-state column, which XLA
fuses into a single pass.

Key constants preserved (losses.py:22, 321-325; SURVEY.md appendix A):
focal alpha=0.25 gamma=2; orthogonal_l1 weight=0.125, xy/orth split 0.8/0.2,
smooth-L1 sigma=3; normalizers are the positive-anchor count clamped to >= 1.

Heads emit logits; focal is computed from logits for numerical stability
(the reference applies sigmoid in-graph and BCE on probabilities — same math,
worse conditioning).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The 24 "orthogonal edge difference" consistency terms (losses.py:338-361):
# each is (r[a] - r[b]) - (r[c] - r[d]) over the flat 16-coord vector; x terms
# use even indices, y terms odd. The map is linear, so it is expressed once as
# index tables and applied to pred and target alike.
_ORTH_A = (0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 12, 13, 12, 13, 12, 13, 12, 13, 12, 13, 12, 13)
_ORTH_B = (6, 7, 6, 7, 2, 3, 2, 3, 8, 9, 8, 9, 10, 11, 10, 11, 4, 5, 4, 5, 14, 15, 14, 15)
_ORTH_C = (2, 3, 8, 9, 6, 7, 8, 9, 2, 3, 6, 7, 14, 15, 4, 5, 10, 11, 14, 15, 4, 5, 10, 11)
_ORTH_D = (4, 5, 14, 15, 4, 5, 10, 11, 10, 11, 14, 15, 8, 9, 2, 3, 2, 3, 6, 7, 6, 7, 8, 9)


def _sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy from logits, numerically stable."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss(
    labels_with_state: jnp.ndarray,
    logits: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Focal loss over anchors (or mask pixels), normalized by positive count.

    Args:
        labels_with_state: (..., N, C+1); last column is the anchor state
            (-1 ignore / 0 negative / 1 positive).
        logits: (..., N, C) raw class logits.
        scale: multiplier on the summed loss (0.1 reproduces focal_mask,
            losses.py:108; the reference train script uses 1.0 for both).

    Returns:
        Scalar loss = scale * sum(focal BCE over non-ignored anchors) /
        max(1, #positives).
    """
    # losses reduce over ~1e6 elements: force fp32 regardless of the
    # model's compute dtype (a bf16 accumulator both loses mass and is
    # sharding-order sensitive)
    logits = logits.astype(jnp.float32)
    labels_with_state = labels_with_state.astype(jnp.float32)
    labels = labels_with_state[..., :-1]
    state = labels_with_state[..., -1]
    probs = jax.nn.sigmoid(logits)

    alpha_factor = jnp.where(labels == 1.0, alpha, 1.0 - alpha)
    p_t = jnp.where(labels == 1.0, 1.0 - probs, probs)
    focal_weight = alpha_factor * p_t**gamma
    bce = _sigmoid_bce(logits, labels)

    not_ignored = (state != -1.0).astype(logits.dtype)[..., None]
    loss = jnp.sum(focal_weight * bce * not_ignored)

    num_pos = jnp.sum((state == 1.0).astype(logits.dtype))
    return scale * loss / jnp.maximum(num_pos, 1.0)


def _orth_terms(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) -> (..., 24) orthogonal-edge-difference terms."""
    a = jnp.take(x, jnp.asarray(_ORTH_A), axis=-1)
    b = jnp.take(x, jnp.asarray(_ORTH_B), axis=-1)
    c = jnp.take(x, jnp.asarray(_ORTH_C), axis=-1)
    d = jnp.take(x, jnp.asarray(_ORTH_D), axis=-1)
    return (a - b) - (c - d)


def orthogonal_l1_loss(
    targets_with_state: jnp.ndarray,
    pred: jnp.ndarray,
    weight: float = 0.125,
    sigma: float = 3.0,
    weight_xy: float = 0.8,
    weight_orth: float = 0.2,
) -> jnp.ndarray:
    """Smooth-L1 on the 16 corner offsets + L1 on 24 orthogonality terms.

    Matches reference orthogonal_l1 (losses.py:321-408): both parts are summed
    over positive anchors and divided by max(1, #positives); the orth part is
    the per-anchor *mean* absolute difference over its 24 terms.

    Args:
        targets_with_state: (..., N, 17); 16 targets + state column.
        pred: (..., N, 16) predicted deltas.
    """
    # fp32 reductions regardless of the model compute dtype (see focal_loss)
    pred = pred.astype(jnp.float32)
    targets_with_state = targets_with_state.astype(jnp.float32)
    target = targets_with_state[..., :-1]
    state = targets_with_state[..., -1]
    positive = (state == 1.0).astype(pred.dtype)

    sigma_sq = sigma * sigma
    diff = jnp.abs(pred - target)
    xy = jnp.where(diff < 1.0 / sigma_sq, 0.5 * sigma_sq * diff * diff, diff - 0.5 / sigma_sq)
    xy_per_anchor = jnp.sum(xy, axis=-1)

    orth_per_anchor = jnp.mean(jnp.abs(_orth_terms(pred) - _orth_terms(target)), axis=-1)

    num_pos = jnp.maximum(jnp.sum(positive), 1.0)
    loss_xy = jnp.sum(xy_per_anchor * positive) / num_pos
    loss_orth = jnp.sum(orth_per_anchor * positive) / num_pos
    return weight * (weight_xy * loss_xy + weight_orth * loss_orth)


def smooth_l1_loss(
    targets_with_state: jnp.ndarray,
    pred: jnp.ndarray,
    sigma: float = 3.0,
    weight: float = 1.0,
) -> jnp.ndarray:
    """Plain smooth-L1 over positive anchors (reference losses.py:147-195)."""
    target = targets_with_state[..., :-1]
    state = targets_with_state[..., -1]
    positive = (state == 1.0).astype(pred.dtype)
    sigma_sq = sigma * sigma
    diff = jnp.abs(pred - target)
    l = jnp.where(diff < 1.0 / sigma_sq, 0.5 * sigma_sq * diff * diff, diff - 0.5 / sigma_sq)
    num_pos = jnp.maximum(jnp.sum(positive), 1.0)
    return weight * jnp.sum(jnp.sum(l, axis=-1) * positive) / num_pos


# --- research loss variants ---------------------------------------------
# The reference ships a set of experimental losses that its train script
# never compiles (losses.py:120-144 cross, :198-246 smooth_l1_pose,
# :249-318 weighted_mse/l1/msle, :411-441 smooth_l1_xy — all dead code in
# the reference but part of its public loss surface). They are provided
# here in the same static-shape masked form as the live losses so users
# swapping loss configs find the full surface. Where the reference's dead
# code has ill-defined reductions (its own comment: "somethings fucky
# here"), the per-anchor mean-over-coordinates is summed over selected
# anchors and divided by the same normalizer the variant declares.


def _masked_anchor_reduce(
    per_anchor: jnp.ndarray, select: jnp.ndarray
) -> jnp.ndarray:
    """sum(per_anchor over selected anchors) / max(1, #selected)."""
    sel = select.astype(per_anchor.dtype)
    return jnp.sum(per_anchor * sel) / jnp.maximum(jnp.sum(sel), 1.0)


def cross_loss(
    labels_with_state: jnp.ndarray,
    logits: jnp.ndarray,
    weight: float = 50.0,
) -> jnp.ndarray:
    """Weighted categorical cross-entropy over non-ignored anchors
    (reference cross, losses.py:120-144; normalizer = #non-ignored)."""
    logits = logits.astype(jnp.float32)
    labels_with_state = labels_with_state.astype(jnp.float32)
    labels = labels_with_state[..., :-1]
    state = labels_with_state[..., -1]
    ce = -jnp.sum(labels * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return weight * _masked_anchor_reduce(ce, state != -1.0)


def smooth_l1_pose_loss(
    targets_with_state: jnp.ndarray, pred: jnp.ndarray, sigma: float = 3.0
) -> jnp.ndarray:
    """smooth_l1 scaled by 0.1 (reference smooth_l1_pose, losses.py:198-246)."""
    return smooth_l1_loss(targets_with_state, pred, sigma=sigma, weight=0.1)


def _weighted_elementwise(
    targets_with_state: jnp.ndarray,
    pred: jnp.ndarray,
    per_coord,
    weight: float,
) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    targets_with_state = targets_with_state.astype(jnp.float32)
    target = targets_with_state[..., :-1]
    state = targets_with_state[..., -1]
    per_anchor = jnp.mean(per_coord(pred, target), axis=-1)
    return weight * _masked_anchor_reduce(per_anchor, state == 1.0)


def weighted_mse_loss(
    targets_with_state: jnp.ndarray, pred: jnp.ndarray, weight: float = 60.0
) -> jnp.ndarray:
    """Positive-anchor MSE (reference weighted_mse, losses.py:249-270)."""
    return _weighted_elementwise(
        targets_with_state, pred, lambda p, t: (p - t) ** 2, weight
    )


def weighted_l1_loss(
    targets_with_state: jnp.ndarray, pred: jnp.ndarray, weight: float = 1.6
) -> jnp.ndarray:
    """Positive-anchor L1 (reference weighted_l1, losses.py:273-294)."""
    return _weighted_elementwise(
        targets_with_state, pred, lambda p, t: jnp.abs(p - t), weight
    )


def weighted_msle_loss(
    targets_with_state: jnp.ndarray, pred: jnp.ndarray, weight: float = 5.0
) -> jnp.ndarray:
    """Positive-anchor mean-squared-log error (reference weighted_msle,
    losses.py:297-318). log1p is clamped at -1 + eps like keras MSLE."""
    def msle(p, t):
        lp = jnp.log1p(jnp.maximum(p, -1.0 + 1e-7))
        lt = jnp.log1p(jnp.maximum(t, -1.0 + 1e-7))
        return (lp - lt) ** 2

    return _weighted_elementwise(targets_with_state, pred, msle, weight)


def smooth_l1_xy_loss(
    targets_with_state: jnp.ndarray,
    pred: jnp.ndarray,
    sigma: float = 3.0,
    weight: float = 0.1,
) -> jnp.ndarray:
    """smooth_l1 with a 0.1 inner weight (reference smooth_l1_xy,
    losses.py:411-441 — identical math to smooth_l1_pose, kept as a
    distinct name to mirror the reference surface)."""
    return smooth_l1_loss(targets_with_state, pred, sigma=sigma, weight=weight)


def total_loss(
    outputs: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    box_weight: float = 1.0,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Combined training loss, as compiled by the reference train script
    (bin/train.py:95-102): {'3Dbox': orthogonal_l1, 'cls': focal,
    'mask': focal}.

    Args:
        outputs: model outputs {box3d, cls_logits, mask_logits}.
        targets: {regression (B,N,17), labels (B,N,C+1), mask (B,P,C+1)}.
        box_weight: extra multiplier on the 3D-box regression term
            (1.0 = the reference's equal loss compile). Classification
            saturates long before the corner regression on from-scratch
            runs; raising this shifts the shared-backbone gradient toward
            localization. The reported loss_box3d stays UNWEIGHTED so loss
            curves are comparable across weights.

    Returns:
        (total, {per-term scalars}).
    """
    l_box = orthogonal_l1_loss(targets["regression"], outputs["box3d"])
    l_cls = focal_loss(targets["labels"], outputs["cls_logits"])
    l_mask = focal_loss(targets["mask"], outputs["mask_logits"])
    total = box_weight * l_box + l_cls + l_mask
    return total, {"loss": total, "loss_box3d": l_box, "loss_cls": l_cls, "loss_mask": l_mask}
