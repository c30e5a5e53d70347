"""int8 PTQ path (models/quantize.py): exact dequant math, interception
coverage, and end-to-end closeness to the f32/bf16 model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.models.quantize import (
    DEFAULT_SKIP,
    quantize_variables,
    quantized_apply,
    strip_quantized_kernels,
)

H, W, C = 64, 64, 2


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = ModelConfig(num_classes=C, compute_dtype="float32")
    model = PyraPose(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32),
        train=False,
    )
    return model, variables


def test_table_covers_convs_and_skips_heads(model_and_vars):
    _, variables = model_and_vars
    table = quantize_variables(variables)
    assert len(table) > 40  # resnet50 + pfpn + towers
    for path in DEFAULT_SKIP:
        assert path not in table
    # per-output-channel scales with the right width
    entry = table[("pfpn", "lateral_p3")]
    assert entry["w"].dtype == jnp.int8
    assert entry["scale"].shape == (entry["w"].shape[-1],)


def test_dequant_roundtrip_error_bounded(model_and_vars):
    _, variables = model_and_vars
    table = quantize_variables(variables)
    w = np.asarray(
        variables["params"]["pfpn"]["lateral_p3"]["kernel"], np.float32
    )
    e = table[("pfpn", "lateral_p3")]
    w_hat = np.asarray(e["w"], np.float32) * np.asarray(e["scale"])
    # symmetric per-channel int8: error <= scale/2 per element
    assert np.all(
        np.abs(w - w_hat) <= np.asarray(e["scale"]) / 2 + 1e-9
    )


def test_efficientnet_depthwise_kept_f32_and_strip_safe():
    """MBConv depthwise kernels are 4-D but _qconv implements only dense
    convs: they must stay OUT of the table, or strip_quantized_kernels
    deletes parameters the f32 path still reads (regression: efficientnet
    int8 crashed with a flax missing-param error)."""
    cfg = ModelConfig(
        num_classes=C, backbone="efficientnetb0", compute_dtype="float32"
    )
    model = PyraPose(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32),
        train=False,
    )
    table = quantize_variables(variables)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(variables["params"])
    depthwise = [
        tuple(p[:-1]) for p, leaf in flat.items()
        if p[-1] == "kernel" and np.ndim(leaf) == 4 and leaf.shape[2] == 1
    ]
    assert depthwise, "efficientnet should have depthwise convs"
    assert all(p not in table for p in depthwise)
    # the stripped tree must still run end-to-end through the int8 path
    slim = strip_quantized_kernels(variables, table)
    out = quantized_apply(
        model, slim, table, jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_quantized_apply_close_to_f32(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 50, (1, H, W, 3)).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    table = quantize_variables(variables)
    got = quantized_apply(model, variables, table, x, train=False)
    assert set(got) == set(ref)
    for k in ref:
        r, g = np.asarray(ref[k], np.float32), np.asarray(got[k], np.float32)
        # random-init logits are O(1); PTQ noise must stay well below that
        scale = max(np.abs(r).max(), 1e-3)
        rel = np.abs(r - g).max() / scale
        assert rel < 0.35, f"{k}: rel err {rel}"
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.98, f"{k}: corr {corr}"


def test_stripped_tree_still_applies(model_and_vars):
    model, variables = model_and_vars
    table = quantize_variables(variables)
    slim = strip_quantized_kernels(variables, table)
    # quantized kernels gone...
    assert "kernel" not in slim["params"]["pfpn"]["lateral_p3"]
    # ...but the skip-set heads keep theirs
    assert "kernel" in slim["params"]["box3d_head"]["out"]
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    out = quantized_apply(model, slim, table, x, train=False)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_inference_fn_int8_path(model_and_vars):
    from pyrapose_tpu.data import LINEMOD_SPEC
    from pyrapose_tpu.inference import build_inference_fn

    model, variables = model_and_vars
    corners = np.asarray(LINEMOD_SPEC.corners3d)[:C]
    table = quantize_variables(variables)
    infer = build_inference_fn(model, corners, (H, W), qtable=table)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8))
    cam = jnp.asarray([[60.0, 60.0, 32.0, 32.0]])
    poses, aux = infer(variables, images, cam)
    assert np.isfinite(np.asarray(aux["scores"])).all()
    assert np.isfinite(np.asarray(poses.trans)).all()


def test_static_calibration_close_to_dynamic(model_and_vars):
    from pyrapose_tpu.models.quantize import calibrate_activation_scales

    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 50, (1, H, W, 3)).astype(np.float32))
    table = quantize_variables(variables)
    calib = calibrate_activation_scales(
        model, variables, table, x, train=False
    )
    # every quantized conv observed an input
    assert all("x_scale" in e for e in calib.values())
    dyn = quantized_apply(model, variables, table, x, train=False)
    sta = quantized_apply(model, variables, calib, x, train=False)
    for k in dyn:
        d = np.asarray(dyn[k], np.float32)
        s = np.asarray(sta[k], np.float32)
        scale = max(np.abs(d).max(), 1e-3)
        assert np.abs(d - s).max() / scale < 0.15, k
