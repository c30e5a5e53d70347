"""Batch-sharded inference over the data mesh vs single-device inference.

Serving-style throughput scaling (SURVEY §2.3: DP over ICI as the
first-class strategy): build_inference_fn(mesh=...) shard_maps the whole
image->pose pipeline over the 'data' axis with replicated params and zero
collectives. Per-image results must match the unsharded path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data import LINEMOD_SPEC, SyntheticPoseDataset
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.parallel import create_mesh

H = W = 64


def test_sharded_inference_matches_single_device():
    assert jax.device_count() == 8
    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
    cfg = ModelConfig(
        num_classes=spec.num_classes,
        backbone="resnet10",
        compute_dtype="float32",
    )
    model = PyraPose(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )

    ds = SyntheticPoseDataset(spec, num_images=8, max_instances=2, seed=3)
    images_u8, _gt = ds.batch(list(range(8)))
    images = jnp.asarray(images_u8)
    cam = jnp.tile(jnp.asarray(spec.intrinsics, jnp.float32), (8, 1))

    infer_single = build_inference_fn(model, spec.corners3d, (H, W))
    infer_sharded = build_inference_fn(
        model, spec.corners3d, (H, W), mesh=create_mesh()
    )

    poses_s, aux_s = infer_single(variables, images, cam)
    poses_m, aux_m = infer_sharded(variables, images, cam)

    np.testing.assert_allclose(
        np.asarray(aux_m["scores"]), np.asarray(aux_s["scores"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(poses_m.valid), np.asarray(poses_s.valid)
    )
    valid = np.asarray(poses_s.valid)
    np.testing.assert_allclose(
        np.asarray(poses_m.rot)[valid], np.asarray(poses_s.rot)[valid],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(poses_m.trans)[valid], np.asarray(poses_s.trans)[valid],
        atol=1e-3,
    )
    # the sharded outputs really live batch-split across the 8 devices
    assert len(poses_m.rot.sharding.device_set) == 8


def test_sharded_detection_only_path():
    assert jax.device_count() == 8
    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
    cfg = ModelConfig(
        num_classes=spec.num_classes,
        backbone="resnet10",
        compute_dtype="float32",
    )
    model = PyraPose(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )
    images = jnp.zeros((8, H, W, 3), jnp.uint8)
    cam = jnp.tile(jnp.asarray(spec.intrinsics, jnp.float32), (8, 1))
    infer = build_inference_fn(
        model, spec.corners3d, (H, W), with_pose=False, mesh=create_mesh()
    )
    none_out, aux = infer(variables, images, cam)
    assert none_out is None
    assert aux["boxes3d"].shape[0] == 8
