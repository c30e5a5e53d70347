"""ops/gather.py: Pallas row gather vs jnp.take, and the cached-step wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.ops.gather import gather_rows_pallas


def test_matches_take_uint8_image_rows():
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.integers(0, 255, (12, 32, 32, 3), dtype=np.uint8))
    # 32*32*3 = 3072 = 24 * 128 -> kernel path
    idx = jnp.asarray([5, 0, 11, 5], jnp.int32)
    got = gather_rows_pallas(cache, idx)
    want = jnp.take(cache, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fallback_on_untileable_rows():
    cache = jnp.arange(5 * 7, dtype=jnp.float32).reshape(5, 7)  # 7 % 128 != 0
    idx = jnp.asarray([4, 2], jnp.int32)
    got = gather_rows_pallas(cache, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(cache)[[4, 2]])


def test_cached_step_single_device_uses_kernel_and_trains():
    import dataclasses

    from pyrapose_tpu.data import PipelineConfig
    from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
    from pyrapose_tpu.models import ModelConfig
    from pyrapose_tpu.parallel import create_mesh
    from pyrapose_tpu.train import create_train_state
    from pyrapose_tpu.train.step import make_cached_train_step

    from pyrapose_tpu.data import LINEMOD_SPEC

    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(64, 64))
    pipe = PipelineConfig(image_shape=(64, 64), num_classes=spec.num_classes)
    cfg = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                      compute_dtype="float32")
    mesh = create_mesh(jax.devices()[:1])
    state = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(64, 64))
    ds = SyntheticPoseDataset(spec, num_images=8, seed=0)
    imgs, gt = ds.batch(list(range(8)))
    step = make_cached_train_step(mesh, spec.corners3d, pipe, donate=False)
    _, parts = step(
        state, jnp.asarray(imgs), jax.tree_util.tree_map(jnp.asarray, gt),
        jnp.asarray([1, 3, 0, 2], jnp.int32),
    )
    assert np.isfinite(float(parts["loss"]))
