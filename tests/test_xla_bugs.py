"""Regression tracker for upstream XLA issues the framework works around.

bf16 + mixed (data x spatial) mesh + grad: XLA's SPMD partitioner takes an
"involuntary full rematerialization" reshard path in the transposed
(backward) graph (cf. XLA b/433785288) that CORRUPTS the bf16 primal loss —
cls focal jumps from ~1.16 to ~36000 on a 4x2 mesh, while

- f32 on the same 4x2 mesh is exact (tests/test_spatial.py),
- bf16 on a pure-data mesh is exact,
- bf16 on a pure-spatial (1x8) mesh is exact,
- the bf16 forward alone (no grad) on 4x2 is exact.

The framework therefore forces float32 compute whenever both mesh axes are
active (cli/train.py, __graft_entry__._dryrun_body). This test is marked
xfail(strict=True): when an XLA upgrade fixes the partitioner it will
XPASS loudly, signalling the workaround can be dropped.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import __graft_entry__ as ge

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses, json
import jax.numpy as jnp
from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig, SyntheticPoseDataset
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh_2d
from pyrapose_tpu.train import create_train_state
from pyrapose_tpu.train.step import make_fused_train_step

h = w = 64
spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(h, w))
cfg = ModelConfig(num_classes=spec.num_classes, backbone="resnet10",
                  compute_dtype="bfloat16")
pipe = PipelineConfig(image_shape=(h, w), max_instances=4,
                      num_classes=spec.num_classes)
ds = SyntheticPoseDataset(spec, num_images=8, max_instances=4, seed=0)
images_u8, gt = ds.batch(list(range(8)))
mesh = create_mesh_2d(4, 2)
state = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(h, w))
step = make_fused_train_step(mesh, spec.corners3d, pipe, donate=False)
_, parts = step(state, jnp.asarray(images_u8),
                jax.tree_util.tree_map(jnp.asarray, gt))
open({out_path!r}, "w").write(json.dumps({{"loss_cls": float(parts["loss_cls"])}}))
"""


@pytest.mark.slow
@pytest.mark.xfail(
    strict=True,
    reason="XLA SPMD bf16 backward miscompiles on mixed data x spatial mesh "
    "(b/433785288-adjacent); XPASS here means the workaround in "
    "cli/train.py and __graft_entry__ can be removed",
)
def test_bf16_mixed_mesh_grad_is_correct(tmp_path):
    out_path = str(tmp_path / "out.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env = ge.cpu_mesh_env(8, base_env=env)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(out_path=out_path)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out_path) as f:
        loss_cls = json.load(f)["loss_cls"]
    # single-device bf16 reference value is ~1.157; the miscompiled mixed
    # mesh produces ~36203
    assert np.isfinite(loss_cls) and loss_cls < 10.0
