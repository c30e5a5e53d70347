"""HBM-resident dataset cache (`--device-cache`).

The cache replaces the host loader for small BOP-scale sets: every frame is
staged to device once and minibatches are gathered on device (the host sends
only index vectors). Contract: training through the cache is bit-identical
to training through the HostPrefetcher on the same schedule — the cache is a
transport change, not a semantics change.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig, SyntheticPoseDataset
from pyrapose_tpu.data.device_cache import DeviceCache
from pyrapose_tpu.data.prefetch import HostPrefetcher
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh
from pyrapose_tpu.train import create_train_state
from pyrapose_tpu.train.step import (
    make_cached_train_step,
    make_fused_train_step,
)

H = W = 64
SPEC = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))


def _dataset(n=12):
    return SyntheticPoseDataset(SPEC, num_images=n, max_instances=4, seed=0)


def _losses(mesh, step_fn, batches, state):
    out = []
    for images, gt in batches:
        state, parts = step_fn(state, images, gt)
        out.append(float(parts["loss"]))
    return out


class TestDeviceCache:
    def test_matches_host_loader_exactly(self):
        ds = _dataset()
        schedule = [[3, 7, 1, 9], [0, 4, 2, 8], [5, 11, 6, 10]]
        mesh = create_mesh(jax.devices()[:1])
        pipe = PipelineConfig(image_shape=(H, W), num_classes=SPEC.num_classes)
        config = ModelConfig(num_classes=SPEC.num_classes,
                             compute_dtype="float32")

        def fresh_state():
            return create_train_state(
                jax.random.PRNGKey(0), config, image_shape=(H, W)
            )

        step_fn = make_fused_train_step(
            mesh, SPEC.corners3d, pipe, donate=False
        )
        host = _losses(
            mesh, step_fn,
            HostPrefetcher(ds, 4, schedule=schedule, num_workers=2),
            fresh_state(),
        )
        cache = DeviceCache.build(ds, mesh=mesh, num_workers=2, verbose=False)
        cached = _losses(mesh, step_fn, cache.batches(schedule), fresh_state())
        np.testing.assert_array_equal(np.asarray(host), np.asarray(cached))

        # the single-dispatch in-jit gather path (what `--device-cache` runs)
        cached_step = make_cached_train_step(
            mesh, SPEC.corners3d, pipe, donate=False
        )
        s = fresh_state()
        injit = []
        for idx in schedule:
            s, parts = cached_step(
                s, cache.images, cache.gt, np.asarray(idx, np.int32)
            )
            injit.append(float(parts["loss"]))
        np.testing.assert_array_equal(np.asarray(host), np.asarray(injit))

    def test_cached_step_data_parallel_matches_single_device(self):
        """On a DP mesh the in-jit gather must produce a batch-sharded
        minibatch (each device computes only its rows); the losses must
        match the single-device run up to reduction-order noise."""
        if len(jax.devices()) < 4:
            import pytest

            pytest.skip("needs >=4 devices")
        ds = _dataset()
        schedule = [[3, 7, 1, 9], [0, 4, 2, 8]]
        pipe = PipelineConfig(image_shape=(H, W), num_classes=SPEC.num_classes)
        config = ModelConfig(num_classes=SPEC.num_classes,
                             compute_dtype="float32")

        def losses_on(mesh):
            cache = DeviceCache.build(ds, mesh=mesh, verbose=False)
            step = make_cached_train_step(
                mesh, SPEC.corners3d, pipe, donate=False
            )
            s = create_train_state(
                jax.random.PRNGKey(0), config, image_shape=(H, W)
            )
            out = []
            for idx in schedule:
                s, parts = step(
                    s, cache.images, cache.gt, np.asarray(idx, np.int32)
                )
                out.append(float(parts["loss"]))
            return out

        single = losses_on(create_mesh(jax.devices()[:1]))
        dp = losses_on(create_mesh(jax.devices()[:4]))
        np.testing.assert_allclose(single, dp, rtol=2e-5, atol=2e-5)

    def test_take_shapes_and_len(self):
        ds = _dataset(n=6)
        cache = DeviceCache.build(ds, verbose=False)
        assert len(cache) == 6
        images, gt = cache.take(np.array([5, 0, 3]))
        assert images.shape == (3, H, W, 3) and images.dtype == jnp.uint8
        ref_images, ref_gt = ds.batch([5, 0, 3])
        np.testing.assert_array_equal(np.asarray(images), ref_images)
        for got, want in zip(gt, ref_gt):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rejects_augmented_dataset(self):
        import pytest

        from pyrapose_tpu.data.augment import AugmentConfig

        class FakeAug:
            augment = AugmentConfig()

            def __len__(self):
                return 1

        with pytest.raises(ValueError, match="un-augmented"):
            DeviceCache.build(FakeAug())


class TestDiskCache:
    """Decoded-set persistence: a supervised restart must reload the decode
    pass from disk (seconds) instead of re-decoding PNGs (minutes on
    few-core hosts)."""

    def test_roundtrip_and_reuse(self, tmp_path):
        path = str(tmp_path / "device_cache.npz")
        ds = _dataset(n=6)
        c1 = DeviceCache.build(ds, verbose=False, disk_cache=path)
        assert (tmp_path / "device_cache.npz").exists()

        calls = []
        orig = ds.sample

        def counting_sample(i, **kw):
            calls.append(i)
            return orig(i, **kw)

        ds.sample = counting_sample
        c2 = DeviceCache.build(ds, verbose=False, disk_cache=path)
        assert calls == []  # loaded from disk, zero decodes
        np.testing.assert_array_equal(
            np.asarray(c1.images), np.asarray(c2.images)
        )
        for a, b in zip(c1.gt, c2.gt):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stale_file_is_ignored(self, tmp_path):
        path = str(tmp_path / "device_cache.npz")
        DeviceCache.build(_dataset(n=6), verbose=False, disk_cache=path)
        # different sample count => different dataset => must re-decode
        c = DeviceCache.build(_dataset(n=4), verbose=False, disk_cache=path)
        assert len(c) == 4

    def test_unreadable_file_is_ignored(self, tmp_path):
        path = str(tmp_path / "device_cache.npz")
        (tmp_path / "device_cache.npz").write_bytes(b"not an npz")
        c = DeviceCache.build(_dataset(n=4), verbose=False, disk_cache=path)
        assert len(c) == 4

    def test_content_key_mismatch_forces_redecode(self, tmp_path):
        """Same frame COUNT, different content identity (another --seed's
        --device-cache-frames subset, a different letterbox geometry) must
        re-decode: reusing the old file would silently train on the wrong
        frames while logs claim the new subset."""
        path = str(tmp_path / "device_cache.npz")
        ds = _dataset(n=6)
        DeviceCache.build(ds, verbose=False, disk_cache=path,
                          disk_key="shape=(64, 64)|n=6|subset=aaaa")
        calls = []
        orig = ds.sample

        def counting_sample(i, **kw):
            calls.append(i)
            return orig(i, **kw)

        ds.sample = counting_sample
        # matching key: reused, zero decodes
        DeviceCache.build(ds, verbose=False, disk_cache=path,
                          disk_key="shape=(64, 64)|n=6|subset=aaaa")
        assert calls == []
        # different key, same n: must re-decode
        DeviceCache.build(ds, verbose=False, disk_cache=path,
                          disk_key="shape=(64, 64)|n=6|subset=bbbb")
        assert calls != []

    def test_legacy_keyless_file_accepted_with_warning(self, tmp_path, capsys):
        """Files saved before content keys existed must stay usable (a
        supervised restart cannot afford a multi-minute re-decode), but the
        unverifiable identity is called out."""
        path = str(tmp_path / "device_cache.npz")
        ds = _dataset(n=4)
        DeviceCache.build(ds, verbose=False, disk_cache=path)  # no key
        calls = []
        orig = ds.sample

        def counting_sample(i, **kw):
            calls.append(i)
            return orig(i, **kw)

        ds.sample = counting_sample
        DeviceCache.build(ds, verbose=False, disk_cache=path,
                          disk_key="shape=(64, 64)|n=4|subset=full")
        assert calls == []  # accepted, no re-decode
        assert "cannot verify" in capsys.readouterr().out


class TestStagingHeartbeat:
    """A multi-GB restage under host contention is slow-but-alive, not a
    stall: build() must drive the caller's heartbeat through every staging
    phase so a StallWatchdog armed mid-training (rotation restage,
    cli/train.py) never misfires on a healthy stage."""

    def test_beats_during_decode_and_put(self):
        beats = []
        DeviceCache.build(
            _dataset(n=8), verbose=False, load_batch=2,
            heartbeat=lambda: beats.append(1),
        )
        # >= one beat per decoded load batch (8/2 = 4) + around the put
        assert len(beats) >= 6

    def test_beats_during_disk_load(self, tmp_path):
        path = str(tmp_path / "device_cache.npz")
        DeviceCache.build(_dataset(n=4), verbose=False, disk_cache=path)
        beats = []
        DeviceCache.build(
            _dataset(n=4), verbose=False, disk_cache=path,
            heartbeat=lambda: beats.append(1),
        )
        # around the disk load + around the put; no decode beats (0 decodes)
        assert len(beats) >= 4


def test_subset_dataset_remaps_indices():
    from pyrapose_tpu.data.device_cache import SubsetDataset

    class Base:
        augment = None

        def __len__(self):
            return 10

        def batch(self, indices):
            return list(indices)

    sub = SubsetDataset(Base(), [7, 2, 9])
    assert len(sub) == 3
    assert sub.batch([0, 2]) == [7, 9]
    assert sub.augment is None
