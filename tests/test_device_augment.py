"""Device-side photometric augmentation (data/device_augment.py).

Checks the affine-composition math against the host reference ops
(data/augment.py, themselves distribution-matched to the reference imgaug
pipeline utils/image.py:154-190), the blur kernel vs cv2, determinism, and
the fused-train-step integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import augment as host_aug
from pyrapose_tpu.data.device_augment import (
    _blur_reflect,
    apply_photometric,
    photometric_batch,
    sample_photometric,
)

H = W = 32


@pytest.fixture()
def img(rng):
    return rng.integers(0, 255, (H, W, 3)).astype(np.float32)


class TestAffineForms:
    """Each affine op's (M, c) must reproduce the host op exactly."""

    def _apply_M(self, M, c, x):
        return x @ np.asarray(M).T + np.asarray(c)

    def test_grayscale_mix_matrix(self, img):
        alpha = 0.13
        M = (1 - alpha) * np.eye(3) + alpha * np.ones((3, 3)) / 3.0
        got = self._apply_M(M, np.zeros(3), img)
        want = (1 - alpha) * img + alpha * img.mean(axis=-1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_hue_sat_matrix(self, img):
        shift = 7.0 / 100.0
        M = (1 + shift) * np.eye(3) - shift * np.ones((3, 3)) / 3.0
        got = self._apply_M(M, np.zeros(3), img)
        mean = img.mean(axis=-1, keepdims=True)
        want = mean + (img - mean) * (1 + shift)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_contrast_matrix(self, img):
        a = 1.21
        got = self._apply_M(a * np.eye(3), np.full(3, 127.5 * (1 - a)), img)
        want = (img - 127.5) * a + 127.5
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestPipeline:
    def test_identity_when_nothing_fires(self, img):
        """fires all-False must reproduce the input exactly (module the
        uint8-style rounding)."""
        params = {
            "M": jnp.tile(jnp.eye(3)[None], (3, 1, 1)),
            "c": jnp.zeros((3, 3)),
            "taps": jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0]),
            "gamma": jnp.asarray(1.0),
        }
        out = np.asarray(apply_photometric(params, jnp.asarray(img)))
        np.testing.assert_array_equal(out, np.round(img))

    def test_blur_matches_cv2(self, img):
        """cv2.GaussianBlur(sigma=0, small ksize) uses fixed binomial
        kernels; the device taps reproduce them exactly."""
        cv2 = pytest.importorskip("cv2")
        for taps, k in (
            (np.array([0.0, 0.25, 0.5, 0.25, 0.0], np.float32), 3),
            (np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32), 5),
        ):
            ours = np.asarray(_blur_reflect(jnp.asarray(img), jnp.asarray(taps)))
            ref = cv2.GaussianBlur(img, (k, k), 0)
            np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_output_range_and_determinism(self, img):
        imgs = jnp.asarray(np.stack([img] * 4))
        key = jax.random.PRNGKey(3)
        a = np.asarray(photometric_batch(key, imgs))
        b = np.asarray(photometric_batch(key, imgs))
        np.testing.assert_array_equal(a, b)
        assert a.min() >= 0.0 and a.max() <= 255.0
        # per-sample keys: the 4 identical inputs get different jitters
        assert not np.array_equal(a[0], a[1])

    def test_distribution_matches_host(self, rng):
        """Loose moment check: device and host photometric soups shift image
        statistics comparably over many draws (exact bit-match is impossible
        by design, SURVEY §7.3)."""
        img = rng.integers(40, 215, (H, W, 3)).astype(np.float32)
        n = 48
        host_means, dev_means = [], []
        for i in range(n):
            out = host_aug.photometric_augment(
                np.random.default_rng(i), img.astype(np.uint8)
            )
            host_means.append(out.mean())
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        imgs = jnp.asarray(np.stack([img] * n))
        dev = np.asarray(
            jax.vmap(lambda k, im: apply_photometric(sample_photometric(k), im))(
                keys, imgs
            )
        )
        dev_means = dev.mean(axis=(1, 2, 3))
        # mean brightness distributions line up within a few gray levels
        assert abs(np.mean(host_means) - np.mean(dev_means)) < 6.0
        assert abs(np.std(host_means) - np.std(dev_means)) < 8.0


class TestFusedStepIntegration:
    def test_augment_seed_changes_loss_deterministically(self):
        import dataclasses

        from pyrapose_tpu.data import (
            LINEMOD_SPEC,
            PipelineConfig,
            SyntheticPoseDataset,
        )
        from pyrapose_tpu.models import ModelConfig
        from pyrapose_tpu.parallel import create_mesh
        from pyrapose_tpu.train import create_train_state, make_fused_train_step

        spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
        cfg = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                          compute_dtype="float32")
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   image_shape=(H, W))
        pipe = PipelineConfig(image_shape=(H, W), max_instances=4,
                              num_classes=spec.num_classes)
        mesh = create_mesh(jax.devices()[:1])
        ds = SyntheticPoseDataset(spec, num_images=2, max_instances=4, seed=0)
        images_u8, gt = ds.batch([0, 1])
        args = (jnp.asarray(images_u8), jax.tree_util.tree_map(jnp.asarray, gt))

        plain = make_fused_train_step(mesh, spec.corners3d, pipe, donate=False)
        auged = make_fused_train_step(mesh, spec.corners3d, pipe, donate=False,
                                      augment_seed=7)
        _, p_plain = plain(state, *args)
        _, p_aug1 = auged(state, *args)
        _, p_aug2 = auged(state, *args)
        assert np.isfinite(float(p_aug1["loss"]))
        # augmentation changes the pixels -> the loss
        assert float(p_aug1["loss"]) != pytest.approx(
            float(p_plain["loss"]), rel=1e-6
        )
        # same seed + same step -> identical augmented loss
        assert float(p_aug1["loss"]) == pytest.approx(
            float(p_aug2["loss"]), rel=1e-7
        )


class TestDeviceAugmentCli:
    def test_host_loader_is_decode_only_under_device_augment(self, tmp_path):
        """--device-augment moves BOTH augmentation stages on device: the
        host dataset must come back with augment=None (decode only), while
        the default path keeps the full host AugmentConfig."""
        from types import SimpleNamespace

        from pyrapose_tpu.cli.train import _build_dataset
        from pyrapose_tpu.data.spec import dataset_spec
        from tests.test_datasets import _make_bop_tree

        root = tmp_path / "ds"
        _make_bop_tree(str(root), [1, 2], n_images=2)
        spec = dataset_spec("linemod", str(root))

        def args(dev):
            return SimpleNamespace(
                dataset="linemod", data_path=str(root), seed=0,
                device_augment=dev, cache_images=0.0, steps_per_epoch=None,
                batch_size=2,
            )

        assert _build_dataset(args(True), spec, augment=True).augment is None
        host = _build_dataset(args(False), spec, augment=True).augment
        assert host is not None and host.photometric
