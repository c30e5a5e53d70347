"""Detection mAP evaluation (Pascal-VOC and COCO-style).

Host-side scorer over collected `Detections`, reproducing the reference's
generic AP evaluator (/root/reference/PyraPose/utils/eval.py):

- `voc_ap`: all-points interpolated AP (eval.py:29-55 `_compute_ap`:
  precision envelope over recall, summed over recall steps);
- `evaluate_detections`: greedy per-image GT matching at an IoU threshold,
  double-assignment counted as false positive (eval.py:172-208), per-class AP
  weighted-averaged into mAP (eval.py:219-235 prints per-class AP; the mean
  here follows the callback's simple average, callbacks/eval.py:80-84);
- `coco_map`: the COCO protocol's AP averaged over IoU 0.5:0.95 in 0.05
  steps (the capability of utils/coco_eval.py without pycocotools, which is
  not available in this environment).
"""

from __future__ import annotations

import numpy as np


def voc_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-points interpolated average precision (eval.py:29-55)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M) IoU (reference Cython compute_overlap.pyx)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def average_precision_per_class(
    detections: list[dict],
    annotations: list[dict],
    num_classes: int,
    iou_threshold: float = 0.5,
) -> dict[int, tuple[float, int]]:
    """Per-class (AP, num_annotations).

    detections: per image {boxes (D,4), scores (D,), labels (D,)} arrays
    (padding rows label < 0 are ignored).
    annotations: per image {boxes (K,4), labels (K,)} ground truth.
    """
    out = {}
    for c in range(num_classes):
        scores, tp, fp = [], [], []
        n_gt = 0
        for det, ann in zip(detections, annotations):
            gt_mask = ann["labels"] == c
            gt_boxes = ann["boxes"][gt_mask]
            n_gt += len(gt_boxes)
            d_mask = det["labels"] == c
            d_boxes = det["boxes"][d_mask]
            d_scores = det["scores"][d_mask]
            order = np.argsort(-d_scores)
            assigned = np.zeros(len(gt_boxes), bool)
            iou = _iou_matrix(d_boxes, gt_boxes)
            for di in order:
                scores.append(d_scores[di])
                if len(gt_boxes) == 0:
                    tp.append(0.0)
                    fp.append(1.0)
                    continue
                gi = int(np.argmax(iou[di]))
                # greedy match; double assignment is a false positive
                # (eval.py:196-208)
                if iou[di, gi] >= iou_threshold and not assigned[gi]:
                    assigned[gi] = True
                    tp.append(1.0)
                    fp.append(0.0)
                else:
                    tp.append(0.0)
                    fp.append(1.0)
        if n_gt == 0:
            out[c] = (0.0, 0)
            continue
        order = np.argsort(-np.asarray(scores))
        tp = np.cumsum(np.asarray(tp)[order])
        fp = np.cumsum(np.asarray(fp)[order])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        out[c] = (voc_ap(recall, precision), n_gt)
    return out


def evaluate_detections(
    detections: list[dict],
    annotations: list[dict],
    num_classes: int,
    iou_threshold: float = 0.5,
) -> dict:
    """Pascal-VOC mAP at one IoU threshold (reference evaluate(), eval.py:147-235)."""
    per_class = average_precision_per_class(
        detections, annotations, num_classes, iou_threshold
    )
    present = [c for c, (_, n) in per_class.items() if n > 0]
    mean_ap = float(np.mean([per_class[c][0] for c in present])) if present else 0.0
    return {"per_class_ap": per_class, "mAP": mean_ap}


def coco_map(
    detections: list[dict],
    annotations: list[dict],
    num_classes: int,
) -> dict:
    """COCO AP@[.5:.95] plus AP50/AP75 (capability of utils/coco_eval.py)."""
    thresholds = np.arange(0.5, 1.0, 0.05)
    aps = []
    by_thresh = {}
    for t in thresholds:
        r = evaluate_detections(detections, annotations, num_classes, float(t))
        aps.append(r["mAP"])
        by_thresh[round(float(t), 2)] = r["mAP"]
    return {
        "AP": float(np.mean(aps)),
        "AP50": by_thresh[0.5],
        "AP75": by_thresh[0.75],
        "by_threshold": by_thresh,
    }
