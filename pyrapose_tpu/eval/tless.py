"""T-LESS evaluation protocol: IoU-matched detection curves + pose metrics.

Reproduces the reference T-LESS driver (utils/tless_eval.py) on top of the
on-device inference pipeline:

- GT match by 2D IoU > 0.5 between the detection box and the GT box
  (tless_eval.py:371-379), with detection-rate tallies at the 12 IoU
  thresholds {.5,.55,.6,.65,.7,.75,.8,.85,.9,.925,.95,.975}
  (tless_eval.py:382-436, report :158-169);
- pose scored with ADI for every class (tless_eval.py:665), accumulated as
  a 20-point ADD(-S) curve over thresholds 0.05d..1.0d
  (tless_eval.py:668-726);
- rotation/translation gate re < 5 deg and te < 5 cm (tless_eval.py:648-650),
  reprojection error < 5 px (tless_eval.py:651-656), and optional
  VSD < 0.3 with tau = 20 mm against a test depth image
  (tless_eval.py:659-662, via the point-splat renderer).

The detection box is the axis-aligned hull of the estimated pose's
reprojected 3D box corners (the reference takes the legacy graph's separate
2D-box output, tless_eval.py:312; this framework's single head predicts
corners only).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data.spec import DatasetSpec
from pyrapose_tpu.eval.driver import as_multi
from pyrapose_tpu.eval.metrics import (
    add_metric,
    adi_metric,
    reprojection_error,
    rotation_error_deg,
    translation_error,
    vsd_metric,
)
from pyrapose_tpu.geometry.projection import project_points, transform_points
from pyrapose_tpu.pose.ransac import PoseResult

IOU_THRESHOLDS = (
    0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.925, 0.95, 0.975
)
ADD_CURVE = tuple(round(0.05 * i, 3) for i in range(1, 21))  # 0.05d .. 1.0d


@dataclasses.dataclass
class TlessReport:
    """Per-class counters for the curve report (tless_eval.py:174-255)."""

    num_classes: int

    def __post_init__(self):
        c = self.num_classes
        n_iou = len(IOU_THRESHOLDS)
        self.gt_count = np.zeros(c, np.int64)
        self.tp = np.zeros((n_iou, c), np.int64)
        self.fp = np.zeros((n_iou, c), np.int64)
        self.add_curve = np.zeros((len(ADD_CURVE), c), np.int64)
        self.less5 = np.zeros(c, np.int64)  # re<5deg & te<5cm
        self.rep_less5 = np.zeros(c, np.int64)  # reproj < 5px
        self.vsd_less_t = np.zeros(c, np.int64)  # vsd < 0.3
        self.vsd_count = np.zeros(c, np.int64)
        self.matched = np.zeros(c, np.int64)  # IoU>0.5 matches (pose scored)

    def report(self) -> dict:
        with np.errstate(divide="ignore", invalid="ignore"):
            det_recall = {
                t: float(self.tp[i].sum() / max(self.gt_count.sum(), 1))
                for i, t in enumerate(IOU_THRESHOLDS)
            }
            det_precision = {
                t: float(
                    self.tp[i].sum() / max(self.tp[i].sum() + self.fp[i].sum(), 1)
                )
                for i, t in enumerate(IOU_THRESHOLDS)
            }
            add_curve = {
                t: float(self.add_curve[i].sum() / max(self.matched.sum(), 1))
                for i, t in enumerate(ADD_CURVE)
            }
            m = max(self.matched.sum(), 1)
            out = {
                "detection_recall_by_iou": det_recall,
                "detection_precision_by_iou": det_precision,
                "add_curve": add_curve,
                "add_0.1d": add_curve[0.1],
                "less5": float(self.less5.sum() / m),
                "reproj_less5px": float(self.rep_less5.sum() / m),
                "per_class_recall_05": (
                    self.tp[0] / np.maximum(self.gt_count, 1)
                ),
                "support": self.gt_count,
            }
            if self.vsd_count.sum() > 0:
                out["vsd_less_0.3"] = float(
                    self.vsd_less_t.sum() / self.vsd_count.sum()
                )
            return out

    def format_report(self) -> str:
        r = self.report()
        lines = ["tless evaluation:"]
        for t in IOU_THRESHOLDS:
            lines.append(
                f"  IoU {t:<5}: recall {r['detection_recall_by_iou'][t]:.4f}"
                f"  precision {r['detection_precision_by_iou'][t]:.4f}"
            )
        lines.append(f"  ADD(-S) curve (fraction of matched GT):")
        for t in ADD_CURVE:
            lines.append(f"    < {t:.2f}d: {r['add_curve'][t]:.4f}")
        lines.append(f"  re<5deg & te<5cm: {r['less5']:.4f}")
        lines.append(f"  reproj<5px: {r['reproj_less5px']:.4f}")
        if "vsd_less_0.3" in r:
            lines.append(f"  vsd<0.3: {r['vsd_less_0.3']:.4f}")
        return "\n".join(lines)


def _iou_single(a: np.ndarray, b: np.ndarray) -> float:
    """boxoverlap equivalent (tless_eval.py:143-171)."""
    iw = min(a[2], b[2]) - max(a[0], b[0])
    ih = min(a[3], b[3]) - max(a[1], b[1])
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = (
        (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    )
    return float(inter / union) if union > 0 else 0.0


def make_tless_scorer(
    model_points: np.ndarray, diameters: np.ndarray
):
    """Jitted per-image scorer over (class, instance, GT slot): ADI / re /
    te / reproj error tables plus each instance's projected-corner hull box.

    Instance-aware: multi-copy scenes get a full (N_est x K_gt) table per
    class for host-side greedy IoU matching (reference iterates NMS
    detections instead, tless_eval.py:312-436)."""
    points = jnp.asarray(model_points)  # (C, P, 3)
    del diameters  # thresholding happens host-side with spec.diameters

    @jax.jit
    def score(rot, trans, corners3d, gt_rot, gt_trans, cam):
        """rot (C, N, 3, 3), trans (C, N, 3) -> tables (C, N, K) + boxes
        (C, N, 4)."""

        def per_class(c, rot_c, trans_c):
            pts = jnp.take(points, c, axis=0)
            crn = jnp.take(corners3d, c, axis=0)

            def per_inst(re_, te_):
                def per_slot(rg, tg):
                    return (
                        adi_metric(re_, te_, rg, tg, pts),
                        add_metric(re_, te_, rg, tg, pts),
                        rotation_error_deg(re_, rg),
                        translation_error(te_, tg),
                        reprojection_error(re_, te_, rg, tg, pts, cam),
                    )

                tables = jax.vmap(per_slot)(gt_rot, gt_trans)  # each (K,)
                # detection box: hull of estimated-pose corner reprojection
                proj = project_points(transform_points(crn, re_, te_), cam)
                box = jnp.concatenate(
                    [jnp.min(proj, axis=0), jnp.max(proj, axis=0)]
                )
                return tables + (box,)

            return jax.vmap(per_inst)(rot_c, trans_c)

        cs = jnp.arange(points.shape[0])
        return jax.vmap(per_class)(cs, rot, trans)

    return score


def evaluate_tless(
    spec: DatasetSpec,
    infer_fn: Callable,
    variables,
    batches: Iterable,
    model_points: np.ndarray | None = None,
    vsd_delta: float = 0.3,
    vsd_tau: float = 20.0,
    verbose: bool = True,
    icp: bool = False,
) -> dict:
    """Full T-LESS protocol over (images, gt[, depth]) batches.

    depth (optional, meters): per-image test depth; drives the VSD tally
    (converted to mm internally — the reference's VSD works in mm,
    tless_eval.py:659-662) and, when icp=True, pre-scoring pose refinement.
    """
    icp_refine = None
    if icp:
        from pyrapose_tpu.eval.driver import make_icp_refine_fn

        icp_refine = make_icp_refine_fn(
            model_points if model_points is not None else spec.corners3d
        )
    if model_points is None:
        model_points = spec.corners3d
    scorer = make_tless_scorer(model_points, spec.diameters)
    rep = TlessReport(spec.num_classes)
    corners = np.asarray(spec.corners3d, np.float32)  # host constant

    vsd_fn = jax.jit(
        lambda re_, te_, rg, tg, pts, dep, cam: vsd_metric(
            re_, te_, rg, tg, pts, dep, cam, vsd_delta, vsd_tau
        )
    )
    points_mm = np.asarray(model_points, np.float32) * 1000.0  # host constant

    per_image = jax.vmap(scorer, in_axes=(0, 0, None, 0, 0, 0))

    for batch in batches:
        images_u8, gt = batch[0], batch[1]
        depth = batch[2] if len(batch) > 2 else None
        cam = jnp.asarray(gt.cam)
        poses, _aux = infer_fn(variables, jnp.asarray(images_u8), cam)
        if icp_refine is not None:
            if depth is None:
                raise ValueError("icp=True requires (images, gt, depth) batches")
            poses = icp_refine(
                poses, _aux["masks"], jnp.asarray(depth, jnp.float32), cam
            )
        mposes = as_multi(poses)
        (err_adi, err_add, rot_err, t_err, rep_err, det_box) = map(
            np.asarray,
            per_image(
                mposes.rot,
                mposes.trans,
                corners,
                jnp.asarray(gt.rot),
                jnp.asarray(gt.trans),
                cam,
            ),
        )  # tables (B, C, N, K); det_box (B, C, N, 4)
        inst_valid = np.asarray(mposes.valid)  # (B, C, N)
        gt_labels = np.asarray(gt.labels)
        gt_valid = np.asarray(gt.valid)
        gt_boxes = np.asarray(gt.boxes)

        for b in range(err_adi.shape[0]):
            for c in range(spec.num_classes):
                slots = np.where((gt_labels[b] == c) & gt_valid[b])[0]
                rep.gt_count[c] += len(slots)
                insts = np.where(inst_valid[b, c])[0]
                if len(insts) == 0:
                    continue
                if len(slots) == 0:
                    # detections with no GT of that class: false positives at
                    # every IoU threshold
                    rep.fp[:, c] += len(insts)
                    continue
                # greedy IoU matching of detections to GT instances
                iou_tab = np.zeros((len(insts), len(slots)), np.float64)
                for ii, i in enumerate(insts):
                    for jj, j in enumerate(slots):
                        iou_tab[ii, jj] = _iou_single(
                            det_box[b, c, i], gt_boxes[b, j]
                        )
                order = np.argsort(-iou_tab, axis=None)
                used_e: set = set()
                used_g: set = set()
                pairs = []
                for flat in order:
                    ii, jj = np.unravel_index(flat, iou_tab.shape)
                    if ii in used_e or jj in used_g:
                        continue
                    used_e.add(ii)
                    used_g.add(jj)
                    pairs.append((insts[ii], slots[jj], iou_tab[ii, jj]))
                # unmatched detections: false positive at every threshold
                rep.fp[:, c] += len(insts) - len(pairs)
                for i, j, iou in pairs:
                    for ti, t in enumerate(IOU_THRESHOLDS):
                        if iou > t:
                            rep.tp[ti, c] += 1
                        else:
                            rep.fp[ti, c] += 1
                    if iou <= 0.5:
                        continue
                    # pose metrics only for IoU-matched detections
                    # (tless_eval.py:379-436)
                    rep.matched[c] += 1
                    err = float(err_adi[b, c, i, j])
                    for ti, t in enumerate(ADD_CURVE):
                        if err < t * float(spec.diameters[c]):
                            rep.add_curve[ti, c] += 1
                    if (
                        float(rot_err[b, c, i, j]) < 5.0
                        and float(t_err[b, c, i, j]) < 0.05
                    ):
                        rep.less5[c] += 1
                    if float(rep_err[b, c, i, j]) < 5.0:
                        rep.rep_less5[c] += 1
                    if depth is not None:
                        e_vsd = float(
                            vsd_fn(
                                jnp.asarray(mposes.rot[b, c, i]),
                                jnp.asarray(mposes.trans[b, c, i]) * 1000.0,
                                jnp.asarray(gt.rot[b, j]),
                                jnp.asarray(gt.trans[b, j]) * 1000.0,
                                points_mm[c],
                                # loader depth is meters; VSD works in mm
                                # (tless_eval.py:659-662)
                                jnp.asarray(depth[b], jnp.float32) * 1000.0,
                                cam[b],
                            )
                        )
                        rep.vsd_count[c] += 1
                        if e_vsd < 0.3:
                            rep.vsd_less_t[c] += 1

    if verbose:
        print(rep.format_report())
    out = rep.report()
    out["accumulator"] = rep
    return out
