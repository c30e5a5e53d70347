"""Backbone registry: every backbone yields C3/C4/C5 at strides 8/16/32."""

import jax
import jax.numpy as jnp
import pytest

from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.models.pyrapose import _make_backbone


@pytest.mark.parametrize(
    "name,c5_channels",
    [
        ("resnet50", 2048),
        ("densenet121", 1024),
        ("efficientnetb0", 320),
    ],
)
def test_backbone_feature_shapes(name, c5_channels):
    bb = _make_backbone(name, jnp.bfloat16, True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    c3, c4, c5 = bb.apply(variables, x, train=False)
    assert c3.shape[1:3] == (8, 8)  # stride 8
    assert c4.shape[1:3] == (4, 4)  # stride 16
    assert c5.shape[1:3] == (2, 2)  # stride 32
    assert c5.shape[-1] == c5_channels


def test_unknown_backbone_raises():
    with pytest.raises(ValueError, match="unknown backbone"):
        _make_backbone("vgg16", jnp.bfloat16, True)


def test_full_model_with_densenet():
    model = PyraPose(config=ModelConfig(num_classes=4, backbone="densenet121"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    n = model.config.anchors.num_anchors((64, 64))
    assert out["box3d"].shape == (1, n, 16)
    assert out["cls_logits"].shape == (1, n, 4)


def test_full_model_with_efficientnet():
    model = PyraPose(config=ModelConfig(num_classes=4, backbone="efficientnetb1"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["mask_logits"].shape[-1] == 4
