import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import (
    LINEMOD_SPEC,
    GroundTruth,
    PipelineConfig,
    SyntheticPoseDataset,
    dataset_spec,
    make_target_fn,
    preprocess_images,
)
from pyrapose_tpu.data.spec import box_corners_from_extents


class TestSpec:
    def test_linemod_spec(self):
        spec = LINEMOD_SPEC
        assert spec.num_classes == 13
        assert spec.corners3d.shape == (13, 8, 3)
        assert spec.diameters.shape == (13,)
        # eggbox (obj 10) and glue (obj 11) are the symmetric classes
        sym_objs = {spec.class_to_obj_id[c] for c in spec.symmetric}
        assert sym_objs == {10, 11}
        # LineMOD Kinect intrinsics (linemod_eval.py:35-38)
        assert spec.intrinsics[0] == pytest.approx(572.4114)
        # meters: ape diameter ~0.102 m
        assert spec.diameters[0] == pytest.approx(0.102099, rel=1e-4)

    def test_corner_order_matches_reference(self):
        """Order (+++, ++-, +--, +-+, -++, -+-, ---, --+):
        preprocessing/linemod.py:78-86."""
        c = box_corners_from_extents(np.array([-1, -2, -3.0]), np.array([2, 4, 6.0]))
        expected = np.array(
            [
                [1, 2, 3], [1, 2, -3], [1, -2, -3], [1, -2, 3],
                [-1, 2, 3], [-1, 2, -3], [-1, -2, -3], [-1, -2, 3],
            ],
            np.float32,
        )
        np.testing.assert_array_equal(c, expected)

    def test_dataset_spec_builtin(self):
        assert dataset_spec("linemod") is LINEMOD_SPEC
        with pytest.raises(ValueError):
            dataset_spec("nonexistent")


class TestPreprocess:
    def test_caffe_mean_subtraction(self):
        img = jnp.full((1, 2, 2, 3), 128, jnp.uint8)
        out = np.asarray(preprocess_images(img))
        np.testing.assert_allclose(out[0, 0, 0], [128 - 123.68, 128 - 116.779, 128 - 103.939], atol=1e-3)


class TestPhotometric:
    def test_output_always_finite_uint8(self):
        """Chained add/contrast ops can push pixels negative; the gamma op
        must not turn those into NaN (fractional power of a negative)."""
        from pyrapose_tpu.data.augment import photometric_augment

        rng = np.random.default_rng(3)
        for _ in range(100):
            img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            out = photometric_augment(rng, img.astype(np.float32))
            assert out.dtype == np.uint8
            assert np.isfinite(out.astype(np.float64)).all()


class TestSynthetic:
    def test_deterministic(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(128, 128))
        ds = SyntheticPoseDataset(spec, num_images=4, seed=7)
        img1, gt1 = ds.sample(2)
        img2, gt2 = ds.sample(2)
        np.testing.assert_array_equal(img1, img2)
        np.testing.assert_array_equal(gt1.rot, gt2.rot)

    def test_gt_consistency(self):
        """Projected GT corners must land inside the annotated 2D bbox."""
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(240, 320))
        ds = SyntheticPoseDataset(spec, num_images=8, seed=1)
        for i in range(8):
            img, gt = ds.sample(i)
            assert img.shape == (240, 320, 3)
            for k in range(gt.valid.shape[0]):
                if not gt.valid[k]:
                    continue
                pix = ds._project_corners(int(gt.labels[k]), gt.rot[k], gt.trans[k])
                x1, y1, x2, y2 = gt.boxes[k]
                assert pix[:, 0].min() == pytest.approx(x1, abs=1e-3)
                assert pix[:, 1].max() == pytest.approx(y2, abs=1e-3)

    def test_mask_slots_reference_valid_instances(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(240, 320))
        ds = SyntheticPoseDataset(spec, num_images=4, seed=3)
        _, gt = ds.sample(0)
        slots = gt.mask_slots[gt.mask_slots >= 0]
        assert len(slots) > 0
        assert all(gt.valid[s] for s in np.unique(slots))

    def test_batch_shapes(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(128, 128))
        ds = SyntheticPoseDataset(spec, num_images=4, max_instances=6, seed=0)
        images, gt = ds.batch([0, 1, 2, 3])
        assert images.shape == (4, 128, 128, 3)
        assert gt.boxes.shape == (4, 6, 4)
        assert gt.rot.shape == (4, 6, 3, 3)
        assert gt.mask_slots.shape == (4, 16 * 16)


class TestTargetFn:
    def test_targets_from_synthetic_gt(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(128, 128))
        cfg = PipelineConfig(image_shape=(128, 128), max_instances=6, num_classes=13)
        ds = SyntheticPoseDataset(spec, num_images=2, max_instances=6, seed=0)
        _, gt = ds.batch([0, 1])
        fn = make_target_fn(spec.corners3d, cfg)
        targets = fn(jax.tree_util.tree_map(jnp.asarray, gt))
        n = cfg.anchors.num_anchors((128, 128))
        assert targets.labels.shape == (2, n, 14)
        assert targets.regression.shape == (2, n, 17)
        assert targets.mask.shape == (2, 16 * 16, 14)
        labels = np.asarray(targets.labels)
        # every valid synthetic instance is big enough to own >= 1 positive anchor
        assert (labels[..., -1] == 1).sum() > 0
        # positive anchors carry exactly one class
        pos = labels[..., -1] == 1
        assert np.all(labels[pos][:, :-1].sum(axis=1) == 1.0)
        # mask target has foreground pixels
        assert np.asarray(targets.mask)[..., -1].sum() > 0


class TestAnchorConfigFile:
    def test_ini_round_trip(self, tmp_path):
        """--config .ini anchor override (reference utils/config.py:23-36)."""
        from pyrapose_tpu.utils.config import anchor_config_from_file

        p = tmp_path / "anchors.ini"
        p.write_text(
            "[anchor_parameters]\n"
            "sizes = 16 32 64\n"
            "strides = 8 16 32\n"
            "ratios = 0.5 1 2\n"
            "scales = 1 1.5\n"
        )
        cfg = anchor_config_from_file(str(p))
        assert cfg.sizes == (16.0, 32.0, 64.0)
        assert cfg.scales == (1.0, 1.5)
        assert cfg.num_anchors_per_location == 6

    def test_partial_section_keeps_defaults(self, tmp_path):
        from pyrapose_tpu.utils.config import anchor_config_from_file

        p = tmp_path / "anchors.ini"
        p.write_text("[anchor_parameters]\nratios = 1\n")
        cfg = anchor_config_from_file(str(p))
        assert cfg.ratios == (1.0,)
        assert cfg.sizes == (32.0, 64.0, 128.0)

    def test_mismatched_lengths_raise(self, tmp_path):
        import pytest as _pytest

        from pyrapose_tpu.utils.config import anchor_config_from_file

        p = tmp_path / "anchors.ini"
        p.write_text("[anchor_parameters]\nsizes = 32 64\nstrides = 8 16 32\n")
        with _pytest.raises(ValueError, match="equal length"):
            anchor_config_from_file(str(p))


class TestResizeLetterbox:
    def test_identity_when_matching(self):
        from pyrapose_tpu.data.image import resize_letterbox

        img = np.zeros((480, 640, 3), np.uint8)
        out, cam, scale = resize_letterbox(img, (480, 640), (500.0, 500.0, 320.0, 240.0))
        assert scale == 1.0
        assert out.shape == (480, 640, 3)
        np.testing.assert_allclose(cam, [500, 500, 320, 240])

    def test_scale_rule_matches_reference(self):
        """min-side -> 480 capped by max-side 640 (utils/image.py:281-303)."""
        from pyrapose_tpu.data.image import compute_resize_scale

        # 960x1280: short side 960 -> x0.5 = 480, long side 640 ok
        assert compute_resize_scale((960, 1280)) == 0.5
        # 480x2000: min-side rule gives 1.0 but long side 2000 > 640 -> 0.32
        assert compute_resize_scale((480, 2000)) == 640 / 2000

    def test_letterbox_pads_and_scales_cam(self):
        from pyrapose_tpu.data.image import resize_letterbox

        img = np.full((240, 320, 3), 200, np.uint8)
        out, cam, scale = resize_letterbox(img, (480, 640), (100.0, 100.0, 160.0, 120.0))
        assert out.shape == (480, 640, 3)
        assert scale == 2.0
        assert out[0, 0, 0] == 200
        np.testing.assert_allclose(cam, [200, 200, 320, 240])

    def test_aspect_mismatch_pads_bottom_right(self):
        from pyrapose_tpu.data.image import resize_letterbox

        img = np.full((100, 640, 3), 77, np.uint8)  # very wide
        out, _cam, scale = resize_letterbox(img, (480, 640), None)
        assert out.shape == (480, 640, 3)
        nh = int(round(100 * scale))
        assert (out[:nh] == 77).all()
        assert (out[nh + 1 :] == 0).all()  # bottom padding
