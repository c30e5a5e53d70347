import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.geometry import anchor_targets, anchors_for_shape, encode_box3d
from pyrapose_tpu.geometry.targets import TargetConfig

C = 3  # classes
K = 4  # gt slots


def _make_gt(boxes, labels, n_valid):
    gt_boxes = np.zeros((K, 4), np.float32)
    gt_labels = np.zeros((K,), np.int32)
    gt_corners = np.zeros((K, 16), np.float32)
    gt_valid = np.zeros((K,), bool)
    for i, (b, l) in enumerate(zip(boxes, labels)):
        gt_boxes[i] = b
        gt_labels[i] = l
        gt_corners[i] = np.arange(16) + 10.0 * i
        gt_valid[i] = i < n_valid
    return (
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_corners),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_valid),
    )


class TestAnchorTargets:
    def setup_method(self):
        self.anchors = jnp.asarray(anchors_for_shape((480, 640)))
        self.n = self.anchors.shape[0]
        self.p3 = 60 * 80

    def _targets(self, gt, mask_slots=None):
        if mask_slots is None:
            mask_slots = jnp.full((self.p3,), -1, jnp.int32)
        return anchor_targets(self.anchors, *gt, mask_slots, num_classes=C)

    def test_perfect_match_positive(self):
        # gt equals an exact anchor -> IoU 1 -> positive with that class
        anchor = np.asarray(self.anchors[12345])
        gt = _make_gt([anchor], [2], 1)
        t = self._targets(gt)
        labels = np.asarray(t.labels)
        assert labels[12345, -1] == 1.0  # positive state
        assert labels[12345, 2] == 1.0  # class 2 one-hot
        assert labels[12345, 0] == 0.0 and labels[12345, 1] == 0.0
        # regression state matches and encodes the gt corners
        reg = np.asarray(t.regression)
        assert reg[12345, -1] == 1.0
        expected = np.asarray(
            encode_box3d(self.anchors[12345 : 12346], gt[1][:1])
        )
        np.testing.assert_allclose(reg[12345, :16], expected[0], rtol=1e-5)

    def test_no_valid_gt_all_negative(self):
        gt = _make_gt([[100, 100, 200, 200]], [1], 0)  # n_valid=0
        t = self._targets(gt)
        labels = np.asarray(t.labels)
        assert (labels[:, -1] == 0.0).all()
        assert (labels[:, :-1] == 0.0).all()

    def test_ignore_band(self):
        # shift a gt box so IoU with its best anchor lands in (0.4, 0.5)
        anchor = np.asarray(self.anchors[12345])
        w = anchor[2] - anchor[0]
        # shifting by dx gives IoU (w-dx)/(w+dx); IoU=0.45 -> dx = w*(0.55/1.45)
        dx = w * (1 - 0.45) / (1 + 0.45)
        box = anchor + np.array([dx, 0, dx, 0])
        gt = _make_gt([box], [0], 1)
        t = self._targets(gt)
        labels = np.asarray(t.labels)
        assert labels[12345, -1] == -1.0  # ignore
        assert labels[12345, :-1].sum() == 0.0

    def test_multi_gt_argmax_assignment(self):
        a1 = np.asarray(self.anchors[1000])
        a2 = np.asarray(self.anchors[40000])
        gt = _make_gt([a1, a2], [0, 1], 2)
        t = self._targets(gt)
        labels = np.asarray(t.labels)
        assert labels[1000, 0] == 1.0 and labels[1000, -1] == 1.0
        assert labels[40000, 1] == 1.0 and labels[40000, -1] == 1.0

    def test_mask_rasterization(self):
        gt = _make_gt([[0, 0, 64, 64]], [1], 1)
        mask_slots = np.full((self.p3,), -1, np.int32)
        mask_slots[:100] = 0  # 100 pixels covered by gt slot 0
        t = self._targets(gt, jnp.asarray(mask_slots))
        m = np.asarray(t.mask)
        assert m.shape == (self.p3, C + 1)
        assert (m[:100, 1] == 1.0).all()
        assert (m[:100, -1] == 1.0).all()
        assert m[100:, :].sum() == 0.0

    def test_mask_min_pixels(self):
        # a single-pixel instance is dropped (reference requires > 1 pixel)
        gt = _make_gt([[0, 0, 64, 64]], [1], 1)
        mask_slots = np.full((self.p3,), -1, np.int32)
        mask_slots[0] = 0
        t = self._targets(gt, jnp.asarray(mask_slots))
        assert np.asarray(t.mask).sum() == 0.0

    def test_mask_invalid_slot_ignored(self):
        gt = _make_gt([[0, 0, 64, 64]], [1], 1)
        mask_slots = np.full((self.p3,), -1, np.int32)
        mask_slots[:50] = 2  # points at an invalid (padding) slot
        t = self._targets(gt, jnp.asarray(mask_slots))
        assert np.asarray(t.mask).sum() == 0.0

    def test_out_of_image_anchors_ignored(self):
        gt = _make_gt([[100, 100, 200, 200]], [1], 1)
        mask_slots = jnp.full((self.p3,), -1, jnp.int32)
        t = anchor_targets(
            self.anchors, *gt, mask_slots, num_classes=C,
            image_hw=jnp.array([240, 320]),
        )
        labels = np.asarray(t.labels)
        centers = np.asarray((self.anchors[:, :2] + self.anchors[:, 2:]) / 2)
        outside = (centers[:, 0] >= 320) | (centers[:, 1] >= 240)
        assert (labels[outside, -1] == -1.0).all()

    def test_vmap_batch(self):
        gt1 = _make_gt([np.asarray(self.anchors[5])], [0], 1)
        gt2 = _make_gt([np.asarray(self.anchors[77])], [2], 1)
        batched = tuple(jnp.stack([a, b]) for a, b in zip(gt1, gt2))
        mask_slots = jnp.full((2, self.p3), -1, jnp.int32)
        fn = jax.vmap(
            lambda b, c, l, v, m: anchor_targets(
                self.anchors, b, c, l, v, m, num_classes=C
            )
        )
        t = fn(*batched, mask_slots)
        assert t.labels.shape == (2, self.n, C + 1)
        assert np.asarray(t.labels)[0, 5, -1] == 1.0
        assert np.asarray(t.labels)[1, 77, -1] == 1.0
