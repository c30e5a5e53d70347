"""BOP -> COCO annotation converter + sensor augmentation tests."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pyrapose_tpu.data.annotate import (
    annotate_bop,
    canonicalize_continuous,
    canonicalize_discrete,
    _mat_to_quat,
)
from pyrapose_tpu.data.sensor_augment import (
    augment_depth,
    augment_rgb,
    value_noise_fbm,
)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


class TestSymmetry:
    def test_continuous_z_axis_removes_azimuth(self):
        """Two poses differing only by a rotation about the symmetry axis
        canonicalize to the same rotation."""
        trans = np.array([50.0, -30.0, 900.0])
        base = _rot_z(0.3) @ np.array(
            [[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64
        )
        axis = np.array([0.0, 0.0, 1.0])
        r1 = canonicalize_continuous(base, trans, axis)
        r2 = canonicalize_continuous(base @ _rot_z(1.1), trans, axis)
        np.testing.assert_allclose(r1, r2, atol=1e-9)

    def test_discrete_180_flip(self):
        """A pose and its 180-deg-symmetric counterpart canonicalize to the
        same rotation. The reference scheme disambiguates via the z-direction
        (annotate_BOP.py:75-83), so the symmetry must move the z axis —
        use a 180-deg flip about x (e.g. a box symmetric under that flip)."""
        cx, sx = np.cos(np.pi), np.sin(np.pi)
        flip_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float64)
        sym = np.eye(4)
        sym[:3, :3] = flip_x
        trans = np.array([0.0, 0.0, 900.0])
        a = 0.3  # tilt away from the degenerate 90-deg boundary
        rot = np.array(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
        )
        r1, t1 = canonicalize_discrete(rot, trans, sym)
        r2, t2 = canonicalize_discrete(rot @ flip_x, trans, sym)
        np.testing.assert_allclose(r1, r2, atol=1e-9)
        np.testing.assert_allclose(t1, t2, atol=1e-9)

    def test_quat_round_trip(self):
        from pyrapose_tpu.data.bop import _quat_to_mat_np

        rng = np.random.default_rng(0)
        for _ in range(20):
            v = rng.normal(size=3)
            a = np.linalg.norm(v)
            k = v / a
            kx = np.array(
                [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
            )
            rot = np.eye(3) + np.sin(a) * kx + (1 - np.cos(a)) * kx @ kx
            q = _mat_to_quat(rot)
            np.testing.assert_allclose(_quat_to_mat_np(q), rot, atol=1e-6)


def _make_bop_scene(root):
    sdir = os.path.join(root, "000001")
    for sub in ("rgb", "depth", "mask_visib"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    models_info = {
        "1": dict(diameter=100.0, min_x=-40.0, min_y=-35.0, min_z=-30.0,
                  size_x=80.0, size_y=70.0, size_z=60.0,
                  symmetries_continuous=[{"axis": [0, 0, 1], "offset": [0, 0, 0]}]),
        "2": dict(diameter=120.0, min_x=-30.0, min_y=-30.0, min_z=-30.0,
                  size_x=60.0, size_y=60.0, size_z=60.0),
    }
    with open(os.path.join(root, "models_info.json"), "w") as f:
        json.dump(models_info, f)
    k = [500.0, 0.0, 64.0, 0.0, 500.0, 48.0, 0.0, 0.0, 1.0]
    scene_camera = {"0": {"cam_K": k, "depth_scale": 1.0}}
    eye = [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]
    scene_gt = {
        "0": [
            {"obj_id": 1, "cam_R_m2c": eye, "cam_t_m2c": [0.0, 0.0, 900.0]},
            {"obj_id": 2, "cam_R_m2c": eye, "cam_t_m2c": [30.0, 10.0, 1100.0]},
        ]
    }
    scene_gt_info = {
        "0": [
            {"bbox_obj": [40, 20, 50, 40], "visib_fract": 0.9},
            {"bbox_obj": [70, 40, 30, 30], "visib_fract": 0.2},
        ]
    }
    for name, data in (("scene_camera", scene_camera), ("scene_gt", scene_gt),
                       ("scene_gt_info", scene_gt_info)):
        with open(os.path.join(sdir, f"{name}.json"), "w") as f:
            json.dump(data, f)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(
        os.path.join(sdir, "rgb", "000000.png")
    )
    depth = np.full((96, 128), 900, np.uint16)
    Image.fromarray(depth).save(os.path.join(sdir, "depth", "000000.png"))
    for gi in range(2):
        m = np.zeros((96, 128), np.uint8)
        m[20 + gi * 30 : 40 + gi * 30, 40:90] = 255
        Image.fromarray(m).save(
            os.path.join(sdir, "mask_visib", f"000000_{gi:06d}.png")
        )


class TestAnnotateBop:
    def test_conversion_layout(self, tmp_path):
        bop = str(tmp_path / "bop")
        out = str(tmp_path / "out")
        os.makedirs(bop)
        _make_bop_scene(bop)
        result = annotate_bop(bop, out, set_name="train")
        assert len(result["images"]) == 1
        assert len(result["annotations"]) == 2
        img = result["images"][0]
        assert img["fx"] == 500.0 and img["cx"] == 64.0
        ann = result["annotations"][0]
        assert len(ann["pose"]) == 7
        assert len(ann["segmentation"]) == 16
        assert ann["feature_visibility"] == pytest.approx(0.9)
        # object 1 is continuous-symmetric: pose canonicalized but still a
        # valid rotation
        q = np.asarray(ann["pose"][3:])
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-6)
        # files exist
        assert os.path.exists(os.path.join(out, "annotations", "instances_train.json"))
        assert os.path.exists(os.path.join(out, "images", "train", "00000000_rgb.png"))
        assert os.path.exists(os.path.join(out, "images", "train", "00000000_dep.png"))
        mask = np.asarray(
            Image.open(os.path.join(out, "images", "train", "00000000_mask.png"))
        )
        assert set(np.unique(mask)) == {0, 1, 2}

    def test_min_visibility_filter(self, tmp_path):
        bop = str(tmp_path / "bop")
        out = str(tmp_path / "out")
        os.makedirs(bop)
        _make_bop_scene(bop)
        result = annotate_bop(bop, out, min_visib=0.5)
        assert len(result["annotations"]) == 1

    def test_loader_round_trip(self, tmp_path):
        """The converter's output is loadable by the BOP dataset loader."""
        from pyrapose_tpu.data.datasets import create_dataset
        from pyrapose_tpu.data.spec import dataset_spec

        bop = str(tmp_path / "bop")
        out = str(tmp_path / "out")
        os.makedirs(bop)
        _make_bop_scene(bop)
        annotate_bop(bop, out, set_name="train")
        dataset_spec.cache_clear()
        ds = create_dataset("homebrewed", out, set_name="train")
        img, gt = ds.sample(0)
        # native 96x128 frames letterbox to the spec resolution; intrinsics
        # scale along (640/128 = 5x), poses untouched
        assert img.shape == (*ds.spec.image_shape, 3)
        scale = ds.spec.image_shape[1] / 128
        # annotation 2 (visib 0.2) is dropped by the train-split visibility
        # filter (linemod.py:227-229)
        assert gt.valid.sum() == 1
        assert gt.trans[0, 2] == pytest.approx(0.9)  # mm -> m
        assert gt.cam[0] == pytest.approx(500.0 * scale)


class TestSensorAugment:
    def test_depth_stays_plausible(self):
        rng = np.random.default_rng(0)
        depth = np.full((64, 64), 900.0)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 1
        out = augment_depth(depth, mask, rng)
        assert out.shape == depth.shape
        inside = out[20:44, 20:44]
        # depth preserved within a few percent inside the object
        valid = inside[inside > 0]
        assert len(valid) > 0
        assert np.abs(np.median(valid) - 900.0) < 50.0
        # outside the mask the shadow forces zeros
        assert out[0, 0] == 0.0

    def test_rgb_uint8_shape(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        out = augment_rgb(img, rng)
        assert out.dtype == np.uint8
        assert out.shape == img.shape

    def test_value_noise_range_and_smoothness(self):
        rng = np.random.default_rng(0)
        n = value_noise_fbm(rng, (64, 64), 0.1, 4)
        assert n.shape == (64, 64)
        assert np.abs(n).max() <= 1.0
        # band-limited: neighboring pixels correlated
        dx = np.abs(np.diff(n, axis=1))
        assert dx.mean() < 0.2
