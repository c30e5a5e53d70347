"""Detection path: corner-hull boxes, fixed-shape NMS, VOC/COCO mAP."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.eval.detection import (
    DetectionConfig,
    clip_boxes,
    corners16_to_aabb,
    filter_detections,
)
from pyrapose_tpu.eval.map import coco_map, evaluate_detections, voc_ap


def _corners16(x1, y1, x2, y2):
    """A 16-vector whose hull is the given box."""
    pts = np.array(
        [
            [x1, y1], [x2, y1], [x2, y2], [x1, y2],
            [(x1 + x2) / 2, y1], [(x1 + x2) / 2, y2],
            [x1, (y1 + y2) / 2], [x2, (y1 + y2) / 2],
        ],
        np.float32,
    )
    return pts.reshape(16)


class TestBoxes:
    def test_hull(self):
        c = _corners16(10, 20, 50, 80)
        box = np.asarray(corners16_to_aabb(jnp.asarray(c)))
        np.testing.assert_allclose(box, [10, 20, 50, 80])

    def test_clip(self):
        boxes = jnp.asarray([[-5.0, -5.0, 700.0, 500.0]])
        out = np.asarray(clip_boxes(boxes, (480, 640)))
        np.testing.assert_allclose(out[0], [0, 0, 639, 479])


class TestFilterDetections:
    def _dense(self, entries, n=200, c=3):
        """entries: list of (anchor_idx, cls, score, box)."""
        boxes3d = np.zeros((n, 16), np.float32)
        scores = np.zeros((n, c), np.float32)
        for idx, cls, s, box in entries:
            boxes3d[idx] = _corners16(*box)
            scores[idx, cls] = s
        return jnp.asarray(boxes3d), jnp.asarray(scores)

    def test_nms_suppresses_overlap(self):
        boxes3d, scores = self._dense(
            [
                (0, 1, 0.9, (10, 10, 50, 50)),
                (1, 1, 0.8, (12, 12, 52, 52)),  # IoU > 0.5 with det 0
                (2, 1, 0.7, (200, 200, 250, 250)),
            ]
        )
        cfg = DetectionConfig(max_detections=10, per_class_candidates=16)
        det = filter_detections(boxes3d, scores, (480, 640), cfg)
        kept = np.asarray(det.labels) >= 0
        assert kept.sum() == 2
        np.testing.assert_allclose(
            np.sort(np.asarray(det.scores)[kept])[::-1], [0.9, 0.7], atol=1e-6
        )

    def test_cross_class_not_suppressed(self):
        boxes3d, scores = self._dense(
            [
                (0, 0, 0.9, (10, 10, 50, 50)),
                (1, 2, 0.8, (10, 10, 50, 50)),  # same box, other class
            ]
        )
        cfg = DetectionConfig(max_detections=10, per_class_candidates=16)
        det = filter_detections(boxes3d, scores, (480, 640), cfg)
        kept = np.asarray(det.labels) >= 0
        assert kept.sum() == 2
        assert set(np.asarray(det.labels)[kept]) == {0, 2}

    def test_score_threshold_and_padding(self):
        boxes3d, scores = self._dense([(0, 1, 0.04, (10, 10, 50, 50))])
        cfg = DetectionConfig(max_detections=10, per_class_candidates=16)
        det = filter_detections(boxes3d, scores, (480, 640), cfg)
        # 0.04 < 0.05 threshold (filter_detections.py:28) -> all padding
        assert np.all(np.asarray(det.labels) == -1)
        assert np.all(np.asarray(det.scores) == -1.0)
        assert det.boxes.shape == (10, 4)
        assert det.boxes3d.shape == (10, 16)


class TestMap:
    def test_voc_ap_perfect(self):
        assert voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)

    def test_voc_ap_half(self):
        # one TP then one FP: AP = 0.5 at recall 0.5... precision envelope
        ap = voc_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5]))
        assert ap == pytest.approx(0.5)

    def _det(self, boxes, scores, labels):
        return dict(
            boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            scores=np.asarray(scores, np.float32),
            labels=np.asarray(labels, np.int64),
        )

    def _ann(self, boxes, labels):
        return dict(
            boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
        )

    def test_perfect_detection(self):
        dets = [self._det([[10, 10, 50, 50]], [0.9], [0])]
        anns = [self._ann([[10, 10, 50, 50]], [0])]
        r = evaluate_detections(dets, anns, num_classes=2)
        assert r["mAP"] == pytest.approx(1.0)

    def test_double_assignment_is_fp(self):
        # two GTs, two detections both on GT A: the second is a false
        # positive (eval.py:196-208), so recall stays 0.5 and AP = 0.5.
        # (If double assignment were counted TP, recall would reach 1.0
        # and AP would be 1.0.)
        dets = [
            self._det(
                [[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.8], [0, 0]
            )
        ]
        anns = [
            self._ann([[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0])
        ]
        r = evaluate_detections(dets, anns, num_classes=1)
        assert r["mAP"] == pytest.approx(0.5)

    def test_missed_gt_lowers_recall(self):
        dets = [self._det([[10, 10, 50, 50]], [0.9], [0])]
        anns = [self._ann([[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0])]
        r = evaluate_detections(dets, anns, num_classes=1)
        assert r["mAP"] == pytest.approx(0.5)

    def test_coco_map_bounds(self):
        dets = [self._det([[10, 10, 50, 50]], [0.9], [0])]
        anns = [self._ann([[10, 10, 50, 50]], [0])]
        r = coco_map(dets, anns, num_classes=1)
        assert r["AP"] == pytest.approx(1.0)
        assert r["AP50"] == pytest.approx(1.0)
        assert r["AP75"] == pytest.approx(1.0)
