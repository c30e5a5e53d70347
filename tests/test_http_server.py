"""HTTP serving frontend: real request/response cycle against a live server.

The stdlib-HTTP counterpart of the reference's ROS service mode
(pyrapose_node.py PoseEstimationServer): spin up ThreadingHTTPServer on an
ephemeral port with a small estimator, then exercise /healthz, /poses, the
bad-body path, and unknown routes.
"""

import dataclasses
import io
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pyrapose_tpu.data import LINEMOD_SPEC
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig
from pyrapose_tpu.serving.http_server import make_handler


@pytest.fixture(scope="module")
def server():
    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(64, 64))
    mc = ModelConfig(num_classes=spec.num_classes, backbone="resnet10")
    model = PyraPose(config=mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    est = PoseEstimator(
        spec, variables, ServingConfig(score_threshold=0.5), model_config=mc
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(est))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as resp:
        assert resp.status == 200
        assert json.loads(resp.read()) == {"status": "ok"}


def test_poses_roundtrip(server):
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    # wrong size on purpose: the server resizes to the spec resolution
    Image.fromarray(
        rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    req = urllib.request.Request(
        f"{server}/poses", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        payload = json.loads(resp.read())
    assert "poses" in payload
    for p in payload["poses"]:
        assert set(p) >= {"name", "obj_id", "confidence", "translation",
                          "quaternion_wxyz"}
        assert len(p["translation"]) == 3
        assert len(p["quaternion_wxyz"]) == 4


def test_bad_body_is_400(server):
    req = urllib.request.Request(
        f"{server}/poses", data=b"not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


def test_unknown_route_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert err.value.code == 404
