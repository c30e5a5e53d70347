"""Spatial (activation-grid) sharding: the CNN analogue of sequence
parallelism (SURVEY §2.3 extension; round-1 VERDICT listed it as absent).

A 2-D (data x spatial) mesh splits image rows across the spatial axis;
GSPMD partitions the convolutions and inserts halo exchanges. The test
asserts the fused train step on a 2x4 mesh reproduces the single-device
step bit-for-bit-ish (fp32 tolerance) — sharding must be semantics-free.

Runs in a subprocess with the virtual 8-device CPU environment
(__graft_entry__.cpu_mesh_env), like the DP sharding tests.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig, SyntheticPoseDataset
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh
from pyrapose_tpu.train import create_train_state
from pyrapose_tpu.train.step import make_fused_train_step

H = W = 64

_SPATIAL_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses, json
import numpy as np
import jax.numpy as jnp
from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig, SyntheticPoseDataset
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh_2d
from pyrapose_tpu.train import create_train_state
from pyrapose_tpu.train.step import make_fused_train_step

H = W = 64
spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
pipe = PipelineConfig(image_shape=(H, W), max_instances=4,
                      num_classes=spec.num_classes)
cfg = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                  compute_dtype="float32")
assert jax.device_count() == 8
mesh = create_mesh_2d(2, 4)
state = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(H, W))
step = make_fused_train_step(mesh, spec.corners3d, pipe, donate=False)
ds = SyntheticPoseDataset(spec, num_images=2, max_instances=4, seed=0)
images_u8, gt = ds.batch([0, 1])
s2, parts = step(state, jnp.asarray(images_u8),
                 jax.tree_util.tree_map(jnp.asarray, gt))
leaf = s2.params["cls_head"]["out"]["kernel"]
out = {{
    "loss": float(parts["loss"]),
    "replicated": bool(leaf.sharding.is_fully_replicated),
    "kernel": np.asarray(leaf).tolist(),
}}
open({out_path!r}, "w").write(json.dumps(out))
"""


@pytest.mark.slow
def test_spatial_sharding_matches_single_device(tmp_path):
    out_path = str(tmp_path / "out.json")
    script = _SPATIAL_SCRIPT.format(out_path=out_path)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env = ge.cpu_mesh_env(8, base_env=env)
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"spatial subprocess failed:\n{proc.stderr[-3000:]}"
    with open(out_path) as f:
        result = json.load(f)
    assert np.isfinite(result["loss"])
    assert result["replicated"]

    # single-device reference
    import dataclasses

    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))
    pipe = PipelineConfig(image_shape=(H, W), max_instances=4,
                          num_classes=spec.num_classes)
    cfg = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                      compute_dtype="float32")
    mesh1 = create_mesh(jax.devices()[:1])
    state = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(H, W))
    step = make_fused_train_step(mesh1, spec.corners3d, pipe, donate=False)
    ds = SyntheticPoseDataset(spec, num_images=2, max_instances=4, seed=0)
    images_u8, gt = ds.batch([0, 1])
    s_ref, parts_ref = step(
        state, jnp.asarray(images_u8), jax.tree_util.tree_map(jnp.asarray, gt)
    )
    assert result["loss"] == pytest.approx(float(parts_ref["loss"]), rel=1e-4)
    a = np.asarray(result["kernel"], np.float32)
    b = np.asarray(s_ref.params["cls_head"]["out"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
