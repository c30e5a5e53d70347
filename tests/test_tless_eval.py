"""T-LESS protocol driver tests with an oracle/perturbed inference stub."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import LINEMOD_SPEC, SyntheticPoseDataset
from pyrapose_tpu.eval.tless import ADD_CURVE, IOU_THRESHOLDS, evaluate_tless
from pyrapose_tpu.pose.ransac import PoseResult


def _spec(image_shape=(96, 128)):
    # T-LESS scores every class with ADI; mimic that on the LineMOD spec
    return dataclasses.replace(
        LINEMOD_SPEC,
        image_shape=image_shape,
        symmetric=tuple(range(LINEMOD_SPEC.num_classes)),
    )


def _oracle_infer(ds, spec, rot_noise=0.0, t_noise=0.0, drop_class=None):
    """infer_fn stub: returns GT poses (optionally perturbed) as PoseResult."""
    c = spec.num_classes

    def infer(variables, images, cam):
        b = images.shape[0]
        # match images back to dataset indices by exhaustive comparison
        rot = np.tile(np.eye(3, dtype=np.float32), (b, c, 1, 1))
        trans = np.zeros((b, c, 3), np.float32)
        trans[..., 2] = 1.0
        valid = np.zeros((b, c), bool)
        for bi in range(b):
            gt = infer.gts[infer.cursor + bi]
            for k in range(gt.valid.shape[0]):
                if not gt.valid[k]:
                    continue
                cls = int(gt.labels[k])
                r = gt.rot[k]
                t = gt.trans[k].copy()
                if rot_noise:
                    ang = rot_noise * np.pi / 180.0
                    rz = np.array(
                        [
                            [np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1],
                        ],
                        np.float32,
                    )
                    r = rz @ r
                if t_noise:
                    t = t + np.array([0, 0, t_noise], np.float32)
                rot[bi, cls] = r
                trans[bi, cls] = t
                valid[bi, cls] = drop_class != cls
        infer.cursor += b
        poses = PoseResult(
            rot=jnp.asarray(rot),
            trans=jnp.asarray(trans),
            valid=jnp.asarray(valid),
            num_votes=jnp.full((b, c), 32, jnp.int32),
            score=jnp.where(jnp.asarray(valid), 0.9, 0.0),
            inlier_frac=jnp.ones((b, c)),
        )
        return poses, {}

    infer.cursor = 0
    infer.gts = []
    return infer


def _batches(ds, infer, n=8, bs=4):
    for i in range(0, n, bs):
        images, gt = ds.batch(list(range(i, i + bs)))
        for k in range(bs):
            infer.gts.append(
                type(gt)(*[np.asarray(f)[k] for f in gt])
            )
        yield images, gt


class TestTlessProtocol:
    def test_oracle_is_perfect(self):
        spec = _spec()
        ds = SyntheticPoseDataset(spec, num_images=8, seed=0)
        infer = _oracle_infer(ds, spec)
        r = evaluate_tless(
            spec, infer, None, _batches(ds, infer), verbose=False
        )
        assert r["add_0.1d"] == pytest.approx(1.0)
        assert r["less5"] == pytest.approx(1.0)
        assert r["reproj_less5px"] == pytest.approx(1.0)
        # oracle box == GT box -> every IoU threshold passes
        assert r["detection_recall_by_iou"][0.975] == pytest.approx(1.0)
        assert "vsd_less_0.3" not in r  # no depth provided

    def test_perturbed_pose_fails_strict_gates(self):
        spec = _spec()
        ds = SyntheticPoseDataset(spec, num_images=8, seed=0)
        # 12 deg rotation + 8 cm depth shift: fails less5, still detected
        infer = _oracle_infer(ds, spec, rot_noise=12.0, t_noise=0.08)
        r = evaluate_tless(
            spec, infer, None, _batches(ds, infer), verbose=False
        )
        assert r["less5"] == pytest.approx(0.0)
        assert r["detection_recall_by_iou"][0.5] > 0.5
        # curve is monotone in the threshold
        curve = [r["add_curve"][t] for t in ADD_CURVE]
        assert all(a <= b + 1e-9 for a, b in zip(curve, curve[1:]))

    def test_missing_detection_counts_against_recall(self):
        spec = _spec()
        ds = SyntheticPoseDataset(spec, num_images=8, seed=0)
        infer = _oracle_infer(ds, spec, drop_class=None)
        r_full = evaluate_tless(spec, infer, None, _batches(ds, infer), verbose=False)
        # drop the most frequent class
        acc = r_full["accumulator"]
        drop = int(np.argmax(acc.gt_count))
        infer2 = _oracle_infer(ds, spec, drop_class=drop)
        r = evaluate_tless(spec, infer2, None, _batches(ds, infer2), verbose=False)
        assert r["detection_recall_by_iou"][0.5] < r_full["detection_recall_by_iou"][0.5]

    def test_report_formats(self):
        spec = _spec()
        ds = SyntheticPoseDataset(spec, num_images=4, seed=0)
        infer = _oracle_infer(ds, spec)
        r = evaluate_tless(spec, infer, None, _batches(ds, infer, n=4), verbose=False)
        text = r["accumulator"].format_report()
        assert "IoU 0.5" in text and "ADD(-S) curve" in text
        assert len(IOU_THRESHOLDS) == 12 and len(ADD_CURVE) == 20
