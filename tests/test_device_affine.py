"""On-device affine augmentation (data/device_affine.py).

Contract: the jitted scale+translate warp and its ground-truth compensation
match the host path (data/augment.py, itself matched to reference
utils/image.py:150-248) — same warp grid as cv2.warpAffine, identical box
transform and pose compensation, identical keep-filter semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig, SyntheticPoseDataset
from pyrapose_tpu.data.augment import (
    AugmentConfig,
    compensate_pose,
    transform_aabb,
    warp_image as host_warp,
)
from pyrapose_tpu.data.device_affine import (
    affine_batch,
    sample_affine,
    transform_gt,
    warp_image,
    warp_slots,
)
from pyrapose_tpu.data.pipeline import GroundTruth

H, W = 64, 80


def _matrix(s, bx, by):
    return np.array([[s, 0.0, bx], [0.0, s, by], [0.0, 0.0, 1.0]])


def _smooth_image(h=H, w=W, c=3, seed=0):
    """Low-frequency image: bilinear-implementation differences (cv2
    fixed-point vs XLA f32) stay tiny away from sharp edges."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (h // 8, w // 8, c)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(small), (h, w, c), "linear")
    return np.asarray(img, np.float32)


class TestWarpImage:
    @pytest.mark.parametrize(
        "s,bx,by", [(1.0, 0.0, 0.0), (1.15, 5.0, -7.0), (0.85, -4.5, 9.25)]
    )
    def test_matches_cv2_grid(self, s, bx, by):
        img = _smooth_image()
        got = np.asarray(warp_image(jnp.asarray(img), s, bx, by))
        want = host_warp(img, _matrix(s, bx, by)).astype(np.float32)
        # compare away from the zero-fill border (sub-pixel edge handling
        # differs between implementations)
        src_x = (np.arange(W) - bx) / s
        src_y = (np.arange(H) - by) / s
        ok = (
            ((src_y > 1) & (src_y < H - 2))[:, None]
            & ((src_x > 1) & (src_x < W - 2))[None, :]
        )
        diff = np.abs(got - want)[ok]
        assert diff.max() < 1.0, diff.max()  # 0-255 scale

    def test_identity_is_exact(self):
        img = _smooth_image(seed=1)
        got = np.asarray(warp_image(jnp.asarray(img), 1.0, 0.0, 0.0))
        np.testing.assert_allclose(got, img, atol=1e-4)

    def test_outside_is_zero(self):
        img = np.full((H, W, 3), 200.0, np.float32)
        # translate right+down by half the canvas: top/left strip has no
        # source pixels -> zero fill like cv2 BORDER_CONSTANT
        got = np.asarray(warp_image(jnp.asarray(img), 1.0, W // 2, H // 2))
        assert got[: H // 2 - 1, :, :].max() == 0.0
        assert got[:, : W // 2 - 1, :].max() == 0.0
        assert got[H // 2 + 2 :, W // 2 + 2 :, :].min() > 199.0


class TestTransformGT:
    def _gt(self):
        boxes = np.array(
            [[10.0, 8.0, 30.0, 28.0], [2.0, 2.0, 70.0, 60.0], [0, 0, 0, 0]],
            np.float32,
        )
        rot = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
        trans = np.array(
            [[0.05, -0.02, 0.9], [-0.1, 0.04, 1.2], [0, 0, 1]], np.float32
        )
        cam = np.array([120.0, 118.0, W / 2 + 3.0, H / 2 - 2.0], np.float32)
        slots = -np.ones((H // 8) * (W // 8), np.int32)
        return GroundTruth(
            boxes=jnp.asarray(boxes),
            rot=jnp.asarray(rot),
            trans=jnp.asarray(trans),
            labels=jnp.asarray([1, 2, 0], jnp.int32),
            valid=jnp.asarray([True, True, False]),
            cam=jnp.asarray(cam),
            mask_slots=jnp.asarray(slots),
        )

    def test_matches_host_box_math_and_intrinsics_fold(self):
        gt = self._gt()
        s, bx, by = 1.1, 6.0, -3.0
        m = _matrix(s, bx, by)
        out = transform_gt(gt, (H, W), (H // 8, W // 8), s, bx, by)
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(out.boxes[i]),
                transform_aabb(m, np.asarray(gt.boxes[i])),
                rtol=1e-5,
            )
        # pose and rotation are UNTOUCHED; the affine is folded into the
        # intrinsics instead (host twin: augment.transform_cam)
        from pyrapose_tpu.data.augment import transform_cam

        np.testing.assert_array_equal(np.asarray(out.rot), np.asarray(gt.rot))
        np.testing.assert_array_equal(np.asarray(out.trans), np.asarray(gt.trans))
        np.testing.assert_allclose(
            np.asarray(out.cam), transform_cam(m, np.asarray(gt.cam)),
            rtol=1e-6,
        )

    def test_corner_targets_exact_under_affine(self):
        """The load-bearing property: projecting the UNCHANGED pose with the
        folded intrinsics lands exactly on the affine image of the original
        projection — i.e. augmented corner targets sit on the warped pixels.
        The reference's translation-only compensation (compensate_pose,
        image.py:230-248) misses this by several px at the aug extremes."""
        from pyrapose_tpu.geometry.projection import project_box3d

        gt = self._gt()
        corners = jnp.asarray(
            np.random.default_rng(3).uniform(-0.05, 0.05, (8, 3)).astype(np.float32)
        )
        for s, bx, by in [(1.2, 12.0, -9.0), (0.8, -7.0, 5.0)]:
            out = transform_gt(gt, (H, W), (H // 8, W // 8), s, bx, by)
            for i in range(2):
                orig = np.asarray(
                    project_box3d(corners, gt.rot[i], gt.trans[i], gt.cam)
                ).reshape(8, 2)
                new = np.asarray(
                    project_box3d(corners, out.rot[i], out.trans[i], out.cam)
                ).reshape(8, 2)
                np.testing.assert_allclose(
                    new, orig * s + np.array([bx, by]), rtol=0, atol=1e-3
                )
                # the reference's compensated pose does NOT have this
                # property (the gap this redesign removes)
                comp = compensate_pose(
                    _matrix(s, bx, by), np.asarray(gt.trans[i]),
                    np.asarray(gt.cam),
                )
                ref = np.asarray(
                    project_box3d(
                        corners, gt.rot[i], jnp.asarray(comp), gt.cam
                    )
                ).reshape(8, 2)
                assert np.abs(ref - (orig * s + np.array([bx, by]))).max() > 0.05

    def test_keep_filter_clears_valid(self):
        gt = self._gt()
        # scale up + shift: the big box [2,2,70,60] leaves the 64x80 canvas
        out = transform_gt(gt, (H, W), (H // 8, W // 8), 1.2, 10.0, 8.0)
        valid = np.asarray(out.valid)
        assert not valid[1]  # pushed out of bounds -> dropped
        assert not valid[2]  # was already invalid, stays invalid

    def test_identity_keeps_everything(self):
        gt = self._gt()
        out = transform_gt(gt, (H, W), (H // 8, W // 8), 1.0, 0.0, 0.0)
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(gt.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out.boxes), np.asarray(gt.boxes), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.trans), np.asarray(gt.trans), atol=1e-7
        )


class TestWarpSlots:
    def test_identity(self):
        h3, w3 = 8, 10
        rng = np.random.default_rng(0)
        slots = rng.integers(-1, 4, h3 * w3).astype(np.int32)
        got = np.asarray(warp_slots(jnp.asarray(slots), (h3, w3), 1.0, 0.0, 0.0))
        np.testing.assert_array_equal(got, slots)

    def test_translate_two_cells(self):
        h3, w3 = 8, 10
        grid = -np.ones((h3, w3), np.int32)
        grid[2, 3] = 5
        # +16 px right, +8 px down = +2 cols, +1 row at P3 stride 8
        got = np.asarray(
            warp_slots(jnp.asarray(grid.reshape(-1)), (h3, w3), 1.0, 16.0, 8.0)
        ).reshape(h3, w3)
        assert got[3, 5] == 5
        assert (got == 5).sum() == 1
        # vacated region is background, not garbage
        assert got[0, :].max() == -1 and got[:, 0].max() == -1


class TestAffineBatch:
    def test_degenerate_config_is_identity(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
        ds = SyntheticPoseDataset(spec, num_images=4, max_instances=4, seed=0)
        images, gt = ds.batch([0, 1, 2, 3])
        cfg = AugmentConfig(
            min_translation=(0.0, 0.0), max_translation=(0.0, 0.0),
            min_scaling=1.0, max_scaling=1.0,
        )
        imgs = jnp.asarray(np.asarray(images), jnp.float32)
        out_img, out_gt = jax.jit(
            lambda k, im, g: affine_batch(k, im, g, cfg)
        )(jax.random.PRNGKey(0), imgs, jax.tree_util.tree_map(jnp.asarray, gt))
        np.testing.assert_allclose(np.asarray(out_img), np.asarray(imgs),
                                   atol=1e-3)
        np.testing.assert_array_equal(
            np.asarray(out_gt.valid), np.asarray(gt.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out_gt.trans), np.asarray(gt.trans), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out_gt.mask_slots), np.asarray(gt.mask_slots)
        )

    def test_randomized_batch_varies_per_sample(self):
        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
        ds = SyntheticPoseDataset(spec, num_images=2, max_instances=4, seed=0)
        images, gt = ds.batch([0, 0])  # identical inputs
        imgs = jnp.asarray(np.asarray(images), jnp.float32)
        out_img, out_gt = affine_batch(
            jax.random.PRNGKey(1), imgs, jax.tree_util.tree_map(jnp.asarray, gt)
        )
        # two different affines on the same frame -> different pixels +
        # different folded intrinsics (poses are untouched by design)
        assert float(jnp.abs(out_img[0] - out_img[1]).max()) > 1.0
        assert float(jnp.abs(out_gt.cam[0] - out_gt.cam[1]).max()) > 1e-4
        assert float(jnp.abs(out_gt.trans[0] - out_gt.trans[1]).max()) == 0.0

    def test_sample_affine_respects_ranges(self):
        cfg = AugmentConfig()
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        s, bx, by = jax.vmap(
            lambda k: jnp.stack(sample_affine(k, (H, W), cfg))
        )(keys).T
        assert float(s.min()) >= cfg.min_scaling
        assert float(s.max()) <= cfg.max_scaling
        # b = c(1-s) + t with |t| <= 0.2*dim and s in [0.8, 1.2]
        assert float(jnp.abs(bx).max()) <= 0.2 * W + 0.2 * (W / 2) + 1e-3
        assert float(jnp.abs(by).max()) <= 0.2 * H + 0.2 * (H / 2) + 1e-3


class TestCachedStepWithAffine:
    def test_step_runs_and_loss_finite(self):
        from pyrapose_tpu.data.device_cache import DeviceCache
        from pyrapose_tpu.models import ModelConfig
        from pyrapose_tpu.parallel import create_mesh
        from pyrapose_tpu.train import create_train_state
        from pyrapose_tpu.train.step import make_cached_train_step

        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
        ds = SyntheticPoseDataset(spec, num_images=8, max_instances=4, seed=0)
        cache = DeviceCache.build(ds, verbose=False)
        mesh = create_mesh(jax.devices()[:1])
        pipe = PipelineConfig(image_shape=(H, W), num_classes=spec.num_classes)
        config = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                             compute_dtype="float32")
        state = create_train_state(
            jax.random.PRNGKey(0), config, image_shape=(H, W)
        )
        step = make_cached_train_step(
            mesh, spec.corners3d, pipe, donate=False,
            augment_seed=0, affine=AugmentConfig(),
        )
        state, parts = step(
            state, cache.images, cache.gt, jnp.arange(4, dtype=jnp.int32)
        )
        assert np.isfinite(float(parts["loss"]))

    def test_affine_requires_seed(self):
        from pyrapose_tpu.train.step import _fused_step_body

        with pytest.raises(ValueError, match="augment_seed"):
            _fused_step_body(
                np.zeros((2, 8, 3), np.float32),
                PipelineConfig(image_shape=(H, W), num_classes=2),
                None, AugmentConfig(),
            )
