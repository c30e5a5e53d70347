"""RANSAC cascade gate (`RansacConfig.fallback_inlier_px`).

Round-3 VERDICT Missing #3 / ADVICE r3: the cascaded wide-gate arbiter
(pose/ransac.py cascade_select + strict_consensus) shipped with zero test
coverage and its only production run was a crash. These tests pin down:

- fallback off (0.0) takes the exact pre-cascade code path (the branch is
  a Python-level `if` at trace time) and a degenerate cascade whose wide
  gate EQUALS the strict gate is a bit-exact no-op (ties keep base);
- the arbiter replaces the base pose ONLY when the wide pose strictly
  gains strict-gate consensus, and keeps base on ties;
- the winning wide pose's inlier_frac is re-reported under the STRICT
  gate (one semantics across instances, ADVICE r3 finding 2);
- multi-instance results only cascade instance 0 (positional pairing
  across gates is unsound for copies, ADVICE r3 finding 1);
- both production call sites execute: the pure-JAX
  class_multi_poses_from_dense path and build_inference_fn's batched
  Pallas path (interpret mode on CPU).

Reference behavior being generalized: the fixed 5 px inlier gate of
linemod_eval.py:479-485 — the cascade widens it only when a posterior
consensus check proves the wide hypothesis better under the ORIGINAL
gate.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.geometry.projection import project_box3d
from pyrapose_tpu.pose.ransac import (
    MultiPoseResult,
    RansacConfig,
    cascade_select,
    class_multi_poses_from_dense,
    strict_consensus,
    strict_inlier_frac,
)

from tests.test_multi_instance import CAM, _dense_votes, _rot_z, _spec


def _project16(spec, cls, rot, trans):
    return np.asarray(
        project_box3d(
            jnp.asarray(spec.corners3d[cls])[None],
            jnp.asarray(rot)[None],
            jnp.asarray(trans)[None],
            jnp.asarray(CAM)[None],
        )
    )[0]


def _exact_votes(spec, cls, rot, trans, k=16):
    """(K, 8, 2) votes that are exact projections of one pose."""
    c16 = _project16(spec, cls, rot, trans).reshape(8, 2)
    return np.tile(c16[None], (k, 1, 1)).astype(np.float32)


def _mpr(rot, trans, c, n):
    return MultiPoseResult(
        rot=jnp.asarray(np.broadcast_to(rot, (c, n, 3, 3)).copy()),
        trans=jnp.asarray(np.broadcast_to(trans, (c, n, 3)).copy()),
        valid=jnp.ones((c, n), bool),
        num_votes=jnp.full((c,), 16, jnp.int32),
        score=jnp.full((c, n), 0.9, jnp.float32),
        inlier_frac=jnp.full((c, n), 0.5, jnp.float32),
    )


class TestCascadeArbiter:
    """cascade_select on hand-built results: deterministic win/lose/tie."""

    def setup_method(self):
        self.spec = _spec(n_classes=1)
        self.rot = _rot_z(20)
        self.trans = np.array([-0.1, 0.05, 0.9], np.float32)
        self.votes = jnp.asarray(
            _exact_votes(self.spec, 0, self.rot, self.trans)[None]
        )  # (C=1, K, 8, 2)
        self.top_scores = jnp.full((1, 16), 0.9, jnp.float32)
        self.corners = jnp.asarray(self.spec.corners3d)
        self.cam = jnp.asarray(CAM)
        self.config = RansacConfig(inlier_px=5.0, fallback_inlier_px=12.0)
        # a pose whose corners land > inlier_px from every vote
        self.bad_trans = self.trans + np.array([0.05, 0.05, 0.0], np.float32)

    def test_wide_wins_with_consensus_gain(self):
        base = _mpr(self.rot, self.bad_trans, 1, 1)
        wide = _mpr(self.rot, self.trans, 1, 1)  # wide found the true pose
        out = cascade_select(
            base, wide, self.votes, self.top_scores, self.corners, self.cam,
            self.config,
        )
        np.testing.assert_array_equal(np.asarray(out.trans), np.asarray(wide.trans))
        # bookkeeping stays base's: valid/num_votes/score
        np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(base.valid))
        np.testing.assert_array_equal(np.asarray(out.score), np.asarray(base.score))

    def test_base_kept_when_wide_gains_nothing(self):
        base = _mpr(self.rot, self.trans, 1, 1)
        wide = _mpr(self.rot, self.bad_trans, 1, 1)  # wide is worse
        out = cascade_select(
            base, wide, self.votes, self.top_scores, self.corners, self.cam,
            self.config,
        )
        np.testing.assert_array_equal(np.asarray(out.trans), np.asarray(base.trans))
        np.testing.assert_array_equal(
            np.asarray(out.inlier_frac), np.asarray(base.inlier_frac)
        )

    def test_tie_keeps_base_bits(self):
        """Identical poses => cons_w == cons_b => strict inequality fails
        => base kept verbatim (the fallback==strict degenerate cascade)."""
        base = _mpr(self.rot, self.trans, 1, 1)
        wide = _mpr(self.rot, self.trans, 1, 1)
        out = cascade_select(
            base, wide, self.votes, self.top_scores, self.corners, self.cam,
            self.config,
        )
        np.testing.assert_array_equal(np.asarray(out.rot), np.asarray(base.rot))
        np.testing.assert_array_equal(
            np.asarray(out.inlier_frac), np.asarray(base.inlier_frac)
        )

    def test_winner_inlier_frac_is_strict_gate(self):
        """When wide wins, inlier_frac is recomputed under the strict gate
        (exact-projection pose => 1.0), not copied from the wide result."""
        base = _mpr(self.rot, self.bad_trans, 1, 1)
        wide = _mpr(self.rot, self.trans, 1, 1)._replace(
            inlier_frac=jnp.full((1, 1), 0.123, jnp.float32)  # wide-gate junk
        )
        out = cascade_select(
            base, wide, self.votes, self.top_scores, self.corners, self.cam,
            self.config,
        )
        expect = strict_inlier_frac(
            wide.rot[0], wide.trans[0], self.votes[0], self.top_scores[0],
            self.corners[0], self.cam, self.config,
        )
        np.testing.assert_allclose(
            np.asarray(out.inlier_frac[0]), np.asarray(expect), atol=1e-6
        )
        assert float(out.inlier_frac[0, 0]) > 0.99

    def test_multi_instance_only_slot0_cascades(self):
        """ADVICE r3: wide slot i>0 may describe a different object copy;
        the cascade must leave instances beyond 0 at the strict result even
        when the wide pose at that slot has more consensus."""
        n = 2
        base = _mpr(self.rot, self.bad_trans, 1, n)  # both slots bad
        wide = _mpr(self.rot, self.trans, 1, n)  # both slots perfect
        out = cascade_select(
            base, wide, self.votes, self.top_scores, self.corners, self.cam,
            self.config,
        )
        # slot 0 cascaded, slot 1 untouched
        np.testing.assert_array_equal(
            np.asarray(out.trans[0, 0]), np.asarray(wide.trans[0, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(out.trans[0, 1]), np.asarray(base.trans[0, 1])
        )

    def test_strict_consensus_monotone_in_proximity(self):
        good = strict_consensus(
            jnp.asarray(self.rot)[None], jnp.asarray(self.trans)[None],
            self.votes[0], self.top_scores[0], self.corners[0], self.cam,
            self.config,
        )
        bad = strict_consensus(
            jnp.asarray(self.rot)[None], jnp.asarray(self.bad_trans)[None],
            self.votes[0], self.top_scores[0], self.corners[0], self.cam,
            self.config,
        )
        assert float(good[0]) > float(bad[0])


class TestCascadeEndToEnd:
    """The production call sites, fallback on vs off."""

    def test_fallback_zero_bit_identical(self):
        """fallback_inlier_px=0 is the pre-cascade path: results must be
        bit-identical to a config that never mentions the field."""
        spec = _spec()
        rot, t = _rot_z(25), np.array([-0.1, 0.02, 0.9], np.float32)
        boxes3d, scores = _dense_votes(spec, {0: [(rot, t)]})
        base_cfg = RansacConfig(top_k=48, approx_top_k=False)
        zero_cfg = dataclasses.replace(base_cfg, fallback_inlier_px=0.0)
        a = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            base_cfg,
        )
        b = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            zero_cfg,
        )
        for f in ("rot", "trans", "valid", "num_votes", "score", "inlier_frac"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            )

    def test_fallback_on_recovers_clean_pose(self):
        """On clean votes the cascade must not degrade the strict result:
        the recovered pose still hits the GT translation."""
        spec = _spec()
        rot, t = _rot_z(25), np.array([-0.1, 0.02, 0.9], np.float32)
        boxes3d, scores = _dense_votes(spec, {0: [(rot, t)]})
        cfg = RansacConfig(
            top_k=48, approx_top_k=False, fallback_inlier_px=12.0
        )
        out = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            cfg,
        )
        assert bool(out.valid[0, 0])
        assert np.linalg.norm(np.asarray(out.trans[0, 0]) - t) < 0.02

    def test_fallback_rescues_wide_noise(self):
        """Votes noisier than the strict gate: with a 1 px strict gate the
        consensus collapses; the 8 px fallback must recover the pose when
        (and only because) its refined pose regains strict consensus."""
        spec = _spec()
        rot, t = _rot_z(25), np.array([-0.1, 0.02, 0.9], np.float32)
        boxes3d, scores = _dense_votes(
            spec, {0: [(rot, t)]}, noise_px=3.0, seed=3
        )
        strict = RansacConfig(
            top_k=48, approx_top_k=False, inlier_px=1.0
        )
        casc = dataclasses.replace(strict, fallback_inlier_px=8.0)
        out_s = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            strict,
        )
        out_c = class_multi_poses_from_dense(
            boxes3d, scores, jnp.asarray(spec.corners3d), jnp.asarray(CAM),
            casc,
        )
        err_s = np.linalg.norm(np.asarray(out_s.trans[0, 0]) - t)
        err_c = np.linalg.norm(np.asarray(out_c.trans[0, 0]) - t)
        assert err_c <= err_s + 1e-6
        # 3 px vote noise bounds the recovery; the point is the cascade
        # lands in the usable regime while the strict gate's collapsed
        # consensus does not (measured: err_c 0.063 vs err_s above it)
        assert err_c < 0.1

    def test_inference_fn_cascade_path_runs(self):
        """build_inference_fn with fallback>0 exercises the batched/Pallas
        cascade call site (inference.py) end to end on CPU interpret."""
        from pyrapose_tpu.inference import build_inference_fn
        from pyrapose_tpu.models import ModelConfig, PyraPose

        spec = _spec()
        h = w = 64
        cfg = ModelConfig(
            num_classes=spec.num_classes, compute_dtype="float32"
        )
        model = PyraPose(config=cfg)
        ransac = RansacConfig(
            top_k=8, approx_top_k=False, fallback_inlier_px=12.0
        )
        fn = build_inference_fn(
            model, spec.corners3d, image_shape=(h, w), ransac=ransac
        )
        images = jnp.zeros((1, h, w, 3), jnp.uint8)
        cam = jnp.asarray(CAM)[None]
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
        result, _aux = fn(variables, images, cam)
        assert np.asarray(result.rot).shape[-2:] == (3, 3)
        assert np.all(np.isfinite(np.asarray(result.trans)))
