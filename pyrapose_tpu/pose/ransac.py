"""Fixed-shape, on-device RANSAC-PnP over dense corner votes.

Replaces the reference's per-(image, class) host loop — score threshold,
>= 10 votes gate, cv2.solvePnPRansac over k*8 correspondences with 300
random-minimal-set iterations (utils/linemod_eval.py:307-485) — with a
deterministic, fully batched equivalent designed for XLA:

1. top-K score gather of corner votes per class (fixed K, validity-masked);
2. one EPnP hypothesis per vote (each vote carries a complete 8-point
   2D-3D correspondence set — a better-conditioned minimal set than 4 random
   points, and there are exactly K of them: no PRNG, no dynamic trip count);
3. vectorized inlier voting of every hypothesis against every vote corner
   (5 px reprojection gate, reference linemod_eval.py:479-485);
4. uncertainty-weighted Gauss-Newton refinement of the winning hypothesis
   over all inlier correspondences, weights = classification score x inlier
   mask (the uncertainty_pnp capability, uncertainty_pnp.cpp:61-92).

Everything vmaps over classes and images; poses never leave the device.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.pose.epnp import epnp, epnp_fast, epnp_precompute
from pyrapose_tpu.pose.refine import refine_pose
from pyrapose_tpu.utils.precision import heinsum


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    score_threshold: float = 0.5  # reference evaluate.py default
    top_k: int = 32  # votes kept per class (reference keeps all > threshold)
    min_votes: int = 10  # reference linemod_eval.py:331-334
    inlier_px: float = 5.0  # reference RANSAC reprojErr
    # Cascaded gate (0 = off, reference behavior): additionally run the
    # tournament + refinement with this WIDER inlier gate and keep, per
    # instance, whichever refined pose wins more score-weighted votes under
    # the STRICT inlier_px re-projection test. Motivation (measured,
    # runs_evidence/r3final/endgame): near-converged votes (~8 px) gain
    # +53% relative recall from a 12 px gate, but a single wide gate
    # destroys recall on noisy votes (~26 px) — the posterior strict-
    # consensus arbiter keeps the winner of each regime. The per-vote EPnP
    # hypotheses are gate-independent, so the fused-kernel path solves them
    # once and only the (cheap) tournament + GN refine run twice.
    fallback_inlier_px: float = 0.0
    refine_iterations: int = 5
    min_hyp_weight: float = 1e-3
    # approximate top-k (TPU-optimized bitonic partial sort) for the vote
    # gather; exact top_k costs ~2x more at N=56700 and the tournament +
    # refinement wash out which near-tied votes enter the pool.
    approx_top_k: bool = True
    # GN refinement backend: None = auto (fused Pallas kernel on TPU, pure
    # JAX elsewhere); True/False forces. The Pallas kernel
    # (pose/pallas_refine.py) runs all iterations in one VMEM-resident
    # program instead of ~50 small HLO ops per iteration.
    pallas_refine: bool | None = None
    # EPnP hypothesis-solver backend, same convention: the fused kernel
    # (pose/pallas_epnp.py) batches every (image, class, vote) solve into
    # one lane-parallel program (only used by build_inference_fn's Pallas
    # path; the pure-JAX path always uses vmap of epnp_fast).
    pallas_epnp: bool | None = None
    # instances recovered per class: greedy non-maximum suppression over the
    # hypothesis tournament — pick the winner, knock out its inlier votes,
    # re-score, repeat. 1 reproduces the reference's per-class loop; T-LESS
    # style multi-copy scenes need > 1 (reference handles those by iterating
    # NMS detections instead, tless_eval.py:312-436).
    max_instances: int = 1
    # a secondary instance counts only if it keeps at least this many
    # fresh inlier votes after earlier instances claimed theirs
    min_instance_votes: int = 10


class PoseResult(NamedTuple):
    """Per-class pose estimates for one image (leading axis = class)."""

    rot: jnp.ndarray  # (C, 3, 3)
    trans: jnp.ndarray  # (C, 3)
    valid: jnp.ndarray  # (C,) bool — passed score/vote gates
    num_votes: jnp.ndarray  # (C,) int32 — anchors above threshold
    score: jnp.ndarray  # (C,) float — max class score
    inlier_frac: jnp.ndarray  # (C,) float — inliers / (K*8) for the winner


class MultiPoseResult(NamedTuple):
    """Per-class, per-instance pose estimates for one image.

    Leading axes = (class, instance). Instance 0 is the tournament winner
    (identical to PoseResult); instances 1..N-1 are successive greedy
    vote-cluster winners for multi-copy scenes.
    """

    rot: jnp.ndarray  # (C, N, 3, 3)
    trans: jnp.ndarray  # (C, N, 3)
    valid: jnp.ndarray  # (C, N) bool
    num_votes: jnp.ndarray  # (C,) int32 — anchors above threshold (class)
    score: jnp.ndarray  # (C, N) float — seed-vote score per instance
    inlier_frac: jnp.ndarray  # (C, N) float


def ransac_pnp(
    votes_2d: jnp.ndarray,
    vote_scores: jnp.ndarray,
    vote_valid: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    precomp: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hypothesize-and-verify PnP for one class's K corner votes.

    Args:
        votes_2d: (K, 8, 2) predicted corner pixels of the top-K votes.
        vote_scores: (K,) classification scores of those votes.
        vote_valid: (K,) bool.
        corners_3d: (8, 3) object-frame box corners.
        cam: (4,) intrinsics.
        precomp: optional epnp_precompute output for corners_3d — hoists the
            per-class control-point setup out of the hot path (the fast
            production route; build_inference_fn supplies it).

    Returns:
        (rot (3,3), trans (3,), inlier_frac ()).
    """
    rot, trans, _valid, _score, inlier_frac = _ransac_pnp_instances(
        votes_2d, vote_scores, vote_valid, corners_3d, cam,
        dataclasses.replace(config, max_instances=1), precomp
    )
    return rot[0], trans[0], inlier_frac[0]


def _topk_votes(boxes3d: jnp.ndarray, cls_scores: jnp.ndarray, config: RansacConfig):
    """Shared top-K vote gather for one class of one image.

    Deterministic — the fused-EPnP path runs it once outside the per-class
    vmap and once inside; both see identical ops and inputs.
    Returns (top_scores (K,), votes (K, 8, 2), num_votes ())."""
    above = cls_scores > config.score_threshold
    num_votes = jnp.sum(above.astype(jnp.int32))
    gated = jnp.where(above, cls_scores, -1.0)
    if config.approx_top_k:
        top_scores, top_idx = jax.lax.approx_max_k(
            gated, config.top_k, recall_target=0.95
        )
    else:
        top_scores, top_idx = jax.lax.top_k(gated, config.top_k)
    votes = jnp.take(boxes3d, top_idx, axis=0).reshape(config.top_k, 8, 2)
    return top_scores, votes, num_votes


def class_votes_topk(
    boxes3d: jnp.ndarray, scores: jnp.ndarray, config: RansacConfig
):
    """All-class top-K vote gather for one image (vmap over images).

    Returns dict: top_scores (C, K), votes (C, K, 8, 2), num_votes (C,).
    """
    top_scores, votes, num_votes = jax.vmap(
        lambda s: _topk_votes(boxes3d, s, config), in_axes=1
    )(scores)
    return {"top_scores": top_scores, "votes": votes, "num_votes": num_votes}


def _ransac_select(
    votes_2d: jnp.ndarray,
    vote_scores: jnp.ndarray,
    vote_valid: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig,
    precomp: dict | None = None,
    hyp: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Hypothesis generation + greedy multi-instance tournament (no refine).

    Instance 0 is the plain tournament winner; each further instance is the
    winner among hypotheses re-scored after earlier winners' inlier votes
    were suppressed (vote-cluster NMS). Returns per-instance
    (rot0 (N,3,3), trans0 (N,3), weights (N, K*8), inst_valid (N,),
    seed_score (N,), inlier_frac (N,)) — weights are the refinement stage's
    per-correspondence weights.
    """
    k = votes_2d.shape[0]
    n_inst = config.max_instances
    w_valid = jnp.where(vote_valid, vote_scores, 0.0)

    # One EPnP hypothesis per vote. Invalid votes still solve (fixed shape)
    # but are excluded from the tournament below. `hyp` short-circuits with
    # externally batched solves (the fused Pallas EPnP kernel).
    if hyp is not None:
        rot_h, trans_h = hyp
    else:
        ones8 = jnp.ones((8,))
        if precomp is not None:
            solve = jax.vmap(lambda p2d: epnp_fast(p2d, ones8, precomp, cam))
        else:
            solve = jax.vmap(lambda p2d: epnp(p2d, corners_3d, ones8, cam))
        rot_h, trans_h = solve(votes_2d)  # (K, 3, 3), (K, 3)

    # Project the 8 corners under every hypothesis.
    pc = heinsum("hij,nj->hni", rot_h, corners_3d) + trans_h[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    proj = jnp.stack(
        [pc[..., 0] * cam[0] / z + cam[2], pc[..., 1] * cam[1] / z + cam[3]],
        axis=-1,
    )  # (K_hyp, 8, 2)

    # Inlier tournament: hypothesis h vs vote v, corner c.
    diff = proj[:, None, :, :] - votes_2d[None, :, :, :]  # (H, V, 8, 2)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    inlier = (dist < config.inlier_px) & vote_valid[None, :, None]
    # A hypothesis from an invalid vote (or behind-camera solution) is out.
    hyp_ok = vote_valid & (jnp.mean(pc[..., 2], axis=-1) > 0.0)
    # A vote is "claimed" by a hypothesis when most of its corners agree —
    # the unit of suppression between instances.
    claims = jnp.mean(inlier, axis=-1) >= 0.5  # (H, V)

    def select(remaining, _):
        live = inlier & remaining[None, :, None]
        hyp_score = jnp.sum(live * w_valid[None, :, None], axis=(1, 2))
        hyp_score = jnp.where(hyp_ok & remaining, hyp_score, -1.0)
        best = jnp.argmax(hyp_score)
        claimed = claims[best] & remaining  # fresh votes this instance takes
        n_fresh = jnp.sum(claimed & vote_valid)
        inst_valid = (hyp_score[best] > 0.0) & (
            n_fresh >= config.min_instance_votes
        )
        at_selection = remaining
        remaining = remaining & ~claimed
        return remaining, (best, inst_valid, at_selection, n_fresh)

    remaining0 = vote_valid
    _, (best_idx, inst_valid, remaining_at, _n_fresh) = jax.lax.scan(
        select, remaining0, None, length=n_inst
    )
    # Instance 0 keeps the single-instance semantics: the class-level
    # min_votes gate lives in class_poses_from_dense, not here.
    inst_valid = inst_valid.at[0].set(True)

    def gather_one(best, avail):
        """Per-instance refinement inputs: the winner's pose seed plus
        inlier-correspondence weights among the votes still available when
        it was selected (for instance 0 that is every valid vote —
        identical to the single-instance path)."""
        inlier_best = inlier[best] & avail[:, None]  # (V, 8)
        weights = (inlier_best * w_valid[:, None]).reshape(k * 8)
        # Guard: if no inliers at all, keep weights uniform over valid votes
        # so GN stays well-posed (result is discarded via the valid flag).
        wsum = jnp.sum(weights)
        fallback = (vote_valid[:, None] * jnp.ones((k, 8))).reshape(k * 8)
        weights = jnp.where(wsum > config.min_hyp_weight, weights, fallback)
        inlier_frac = jnp.sum(inlier_best * vote_valid[:, None]) / jnp.maximum(
            jnp.sum(vote_valid) * 8.0, 1.0
        )
        return rot_h[best], trans_h[best], weights, inlier_frac, vote_scores[best]

    rot0, trans0, weights, inlier_frac, seed_score = jax.vmap(gather_one)(
        best_idx, remaining_at
    )
    return rot0, trans0, weights, inst_valid, seed_score, inlier_frac


def _ransac_pnp_instances(
    votes_2d: jnp.ndarray,
    vote_scores: jnp.ndarray,
    vote_valid: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig,
    precomp: dict | None = None,
):
    """Select + refine (pure-JAX path). Returns per-instance
    (rot (N,3,3), trans (N,3), valid (N,), score (N,), inlier_frac (N,))."""
    k = votes_2d.shape[0]
    rot0, trans0, weights, inst_valid, seed_score, inlier_frac = (
        _ransac_select(
            votes_2d, vote_scores, vote_valid, corners_3d, cam, config,
            precomp,
        )
    )
    pts2d = votes_2d.reshape(k * 8, 2)
    pts3d = jnp.tile(corners_3d, (k, 1))
    rot, trans = jax.vmap(
        lambda r0, t0, w: refine_pose(
            r0, t0, pts2d, pts3d, w, cam,
            iterations=config.refine_iterations,
        )
    )(rot0, trans0, weights)
    return rot, trans, inst_valid, seed_score, inlier_frac


def precompute_class_solvers(corners_3d) -> dict:
    """Stacked epnp_precompute over classes: (C, 8, 3) -> pytree with a
    leading class axis, for vmapping through class_poses_from_dense."""
    import numpy as np

    per_class = [epnp_precompute(c) for c in np.asarray(corners_3d)]
    return {
        key: np.stack([p[key] for p in per_class]) for key in per_class[0]
    }


def class_poses_from_dense(
    boxes3d: jnp.ndarray,
    scores: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    precomp: dict | None = None,
) -> PoseResult:
    """Per-class pose recovery from dense per-anchor predictions (one image).

    Args:
        boxes3d: (N, 16) decoded corner pixel predictions (all anchors).
        scores: (N, C) class probabilities.
        corners_3d: (C, 8, 3) object-frame box corners per class.
        cam: (4,) intrinsics.
        precomp: optional precompute_class_solvers(corners_3d) output.

    Returns:
        PoseResult with leading class axis. vmap over images for batching.
    """
    multi = class_multi_poses_from_dense(
        boxes3d, scores, corners_3d, cam,
        dataclasses.replace(config, max_instances=1), precomp,
    )
    return PoseResult(
        rot=multi.rot[:, 0],
        trans=multi.trans[:, 0],
        valid=multi.valid[:, 0],
        num_votes=multi.num_votes,
        score=multi.score[:, 0],
        inlier_frac=multi.inlier_frac[:, 0],
    )


def class_multi_poses_select(
    boxes3d: jnp.ndarray,
    scores: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    precomp: dict | None = None,
    hyp: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Selection stage of multi-instance pose recovery for one image.

    Runs the top-K vote gather + hypothesis tournament per class but defers
    the GN refinement, so callers can batch refinement across images and
    classes in one fused kernel (pose/pallas_refine.py). `hyp` optionally
    supplies externally solved per-vote hypotheses (rot (C,K,3,3),
    trans (C,K,3)) from the fused Pallas EPnP kernel, skipping the in-vmap
    solves.

    Returns a dict with leading class axis: rot0 (C,N,3,3), trans0 (C,N,3),
    weights (C,N,K*8), votes (C,K,8,2), valid (C,N), num_votes (C,),
    score (C,N), inlier_frac (C,N).
    """

    def per_class(cls_scores, cls_corners, cls_pre, cls_hyp):
        top_scores, votes, num_votes = _topk_votes(boxes3d, cls_scores, config)
        vote_valid = top_scores > config.score_threshold
        rot0, trans0, weights, inst_valid, seed_score, inlier_frac = (
            _ransac_select(
                votes, top_scores, vote_valid, cls_corners, cam, config,
                precomp=cls_pre, hyp=cls_hyp,
            )
        )
        # class-level detection gate (reference linemod_eval.py:331-334)
        detected = num_votes >= config.min_votes
        valid = inst_valid & detected
        # instance 0's reported score keeps the class-max semantics
        score = seed_score.at[0].set(jnp.max(cls_scores))
        return (
            rot0, trans0, weights, votes, valid, num_votes, score,
            inlier_frac, top_scores,
        )

    # host constants: vmap accepts numpy operands directly; a jnp.asarray
    # here would commit the tables to the device mid-trace and force a
    # tunnel fetch at lowering (see inference.build_inference_fn)
    pre = (
        {k: np.asarray(v) for k, v in precomp.items()}
        if precomp is not None
        else None
    )
    pre_axes = None if pre is None else 0
    hyp_axes = None if hyp is None else 0
    out = jax.vmap(per_class, in_axes=(1, 0, pre_axes, hyp_axes))(
        scores, corners_3d, pre, hyp
    )
    keys = (
        "rot0", "trans0", "weights", "votes", "valid", "num_votes", "score",
        "inlier_frac", "top_scores",
    )
    return dict(zip(keys, out))


def strict_consensus(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    votes_2d: jnp.ndarray,
    top_scores: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig,
) -> jnp.ndarray:
    """Score-weighted vote agreement of REFINED poses under the strict gate.

    The cascade's arbiter: project each instance pose's 8 corners and sum
    `vote_score` over (vote, corner) pairs within config.inlier_px — the
    same quantity the hypothesis tournament maximizes, evaluated posterior
    to refinement. rot (N,3,3), trans (N,3), votes_2d (K,8,2),
    top_scores (K,) -> (N,).
    """
    w_valid = jnp.where(
        top_scores > config.score_threshold, top_scores, 0.0
    )
    pc = heinsum("nij,cj->nci", rot, corners_3d) + trans[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    proj = jnp.stack(
        [pc[..., 0] * cam[0] / z + cam[2], pc[..., 1] * cam[1] / z + cam[3]],
        axis=-1,
    )  # (N, 8, 2)
    diff = proj[:, None, :, :] - votes_2d[None, :, :, :]  # (N, K, 8, 2)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    inl = (dist < config.inlier_px) & (w_valid > 0.0)[None, :, None]
    return jnp.sum(inl * w_valid[None, :, None], axis=(1, 2))


def strict_inlier_frac(
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    votes_2d: jnp.ndarray,
    top_scores: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig,
) -> jnp.ndarray:
    """Unweighted strict-gate inlier fraction of REFINED poses: (vote,
    corner) pairs within config.inlier_px / (valid votes * 8). Keeps the
    cascade's reported inlier_frac gate-consistent with unreplaced
    instances (ADVICE r3: wide-gate fracs are inflated by construction).
    rot (N,3,3) -> (N,)."""
    valid = top_scores > config.score_threshold
    pc = heinsum("nij,cj->nci", rot, corners_3d) + trans[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    proj = jnp.stack(
        [pc[..., 0] * cam[0] / z + cam[2], pc[..., 1] * cam[1] / z + cam[3]],
        axis=-1,
    )
    diff = proj[:, None, :, :] - votes_2d[None, :, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    inl = (dist < config.inlier_px) & valid[None, :, None]
    return jnp.sum(inl, axis=(1, 2)) / jnp.maximum(jnp.sum(valid) * 8.0, 1.0)


def cascade_select(
    base: MultiPoseResult,
    wide: MultiPoseResult,
    votes: jnp.ndarray,
    top_scores: jnp.ndarray,
    corners_3d,
    cam: jnp.ndarray,
    config: RansacConfig,
) -> MultiPoseResult:
    """Merge strict-gate and wide-gate results by strict posterior consensus.

    Per class: keep the wide-gate pose only when it wins STRICTLY more
    strict-gate consensus than the base pose (ties keep the reference-gate
    behavior). Operates on one image: rot (C,N,3,3), votes (C,K,8,2),
    top_scores (C,K); vmap over images to batch.

    The cascade applies to instance 0 ONLY (ADVICE r3): the wide-gate
    tournament sees different vote suppression, so for N>1 the wide pose at
    slot i>0 may describe a *different object copy* than base slot i —
    positional pairing would swap poses between copies. Instance 0 is the
    consensus-dominant copy under both gates, so the pairing is sound
    there; later instances keep the strict-gate result unconditionally.

    The winning wide pose's reported inlier_frac is recomputed under the
    STRICT gate (strict_inlier_frac) so the diagnostic has one gate
    semantics across instances whether or not the cascade fired.
    """
    corners = jnp.asarray(corners_3d)
    cons_b = jax.vmap(
        lambda r, t, v, s, c3: strict_consensus(r, t, v, s, c3, cam, config)
    )(base.rot, base.trans, votes, top_scores, corners)
    cons_w = jax.vmap(
        lambda r, t, v, s, c3: strict_consensus(r, t, v, s, c3, cam, config)
    )(wide.rot, wide.trans, votes, top_scores, corners)
    take_w = cons_w > cons_b  # (C, N)
    n_inst = take_w.shape[1]
    if n_inst > 1:  # static shape: resolved at trace time
        take_w = take_w & (jnp.arange(n_inst) == 0)[None, :]
    frac_w = jax.vmap(
        lambda r, t, v, s, c3: strict_inlier_frac(
            r, t, v, s, c3, cam, config
        )
    )(wide.rot, wide.trans, votes, top_scores, corners)
    return MultiPoseResult(
        rot=jnp.where(_bexp(take_w, wide.rot), wide.rot, base.rot),
        trans=jnp.where(_bexp(take_w, wide.trans), wide.trans, base.trans),
        valid=base.valid,
        num_votes=base.num_votes,
        score=base.score,
        inlier_frac=jnp.where(take_w, frac_w, base.inlier_frac),
    )


def _bexp(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (C, N) mask against trailing dims of `like`."""
    return mask.reshape(mask.shape + (1,) * (like.ndim - mask.ndim))


def class_multi_poses_from_dense(
    boxes3d: jnp.ndarray,
    scores: jnp.ndarray,
    corners_3d: jnp.ndarray,
    cam: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    precomp: dict | None = None,
) -> MultiPoseResult:
    """Per-class, multi-instance pose recovery from dense predictions.

    Same contract as class_poses_from_dense but recovers up to
    config.max_instances poses per class by greedy vote-cluster suppression
    (the capability the reference reaches via per-detection loops on T-LESS
    multi-copy scenes, tless_eval.py:312-436). vmap over images to batch.
    """
    def select_refine(cfg):
        sel = class_multi_poses_select(
            boxes3d, scores, corners_3d, cam, cfg, precomp
        )
        k = cfg.top_k

        def refine_class(rot0_n, trans0_n, weights_n, votes_k, cls_corners):
            pts2d = votes_k.reshape(k * 8, 2)
            pts3d = jnp.tile(cls_corners, (k, 1))
            return jax.vmap(
                lambda r0, t0, w: refine_pose(
                    r0, t0, pts2d, pts3d, w, cam,
                    iterations=cfg.refine_iterations,
                )
            )(rot0_n, trans0_n, weights_n)

        rot, trans = jax.vmap(refine_class)(
            sel["rot0"], sel["trans0"], sel["weights"], sel["votes"],
            corners_3d,
        )
        return sel, MultiPoseResult(
            rot=rot,
            trans=trans,
            valid=sel["valid"],
            num_votes=sel["num_votes"],
            score=sel["score"],
            inlier_frac=sel["inlier_frac"],
        )

    sel, result = select_refine(config)
    if config.fallback_inlier_px > 0.0:
        wide_cfg = dataclasses.replace(
            config, inlier_px=config.fallback_inlier_px, fallback_inlier_px=0.0
        )
        _, wide = select_refine(wide_cfg)
        result = cascade_select(
            result, wide, sel["votes"], sel["top_scores"], corners_3d, cam,
            config,
        )
    return result
