import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.geometry import AnchorConfig
from pyrapose_tpu.models import ModelConfig, create_model, decode_predictions

# Small model/input for CPU tests: 64x64 input -> P3 8x8, P4 4x4, P5 2x2.
SMALL = ModelConfig(num_classes=2, compute_dtype="float32")
H, W = 64, 64
N_ANCHORS = 9 * (8 * 8 + 4 * 4 + 2 * 2)
P3 = 8 * 8


@pytest.fixture(scope="module")
def small_model_and_params():
    model = create_model(SMALL)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


class TestPyraPose:
    def test_output_shapes(self, small_model_and_params):
        model, variables = small_model_and_params
        x = jnp.ones((2, H, W, 3), jnp.float32)
        out = model.apply(variables, x)
        assert out["box3d"].shape == (2, N_ANCHORS, 16)
        assert out["cls_logits"].shape == (2, N_ANCHORS, 2)
        assert out["mask_logits"].shape == (2, P3, 2)
        for v in out.values():
            assert v.dtype == jnp.float32

    def test_prior_probability_bias(self, small_model_and_params):
        """At init the classification head should emit sigmoid ~= 0.01."""
        model, variables = small_model_and_params
        x = jnp.zeros((1, H, W, 3), jnp.float32)
        out = model.apply(variables, x)
        probs = np.asarray(jax.nn.sigmoid(out["cls_logits"]))
        np.testing.assert_allclose(probs.mean(), 0.01, atol=5e-3)

    def test_decode_predictions_shapes(self, small_model_and_params):
        model, variables = small_model_and_params
        x = jnp.ones((1, H, W, 3), jnp.float32)
        out = model.apply(variables, x)
        dec = decode_predictions(out, (H, W), SMALL)
        assert dec["boxes3d"].shape == (1, N_ANCHORS, 16)
        assert dec["scores"].shape == (1, N_ANCHORS, 2)
        s = np.asarray(dec["scores"])
        assert ((s >= 0) & (s <= 1)).all()

    def test_jit_forward(self, small_model_and_params):
        model, variables = small_model_and_params
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        x = jnp.ones((1, H, W, 3), jnp.float32)
        out1 = fwd(variables, x)
        out2 = model.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out1["cls_logits"]), np.asarray(out2["cls_logits"]), atol=1e-5
        )

    def test_grad_flows(self, small_model_and_params):
        model, variables = small_model_and_params
        x = jnp.ones((1, H, W, 3), jnp.float32)

        def loss_fn(params):
            out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x)
            return jnp.sum(out["box3d"] ** 2) + jnp.sum(out["cls_logits"] ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0

    def test_bf16_compute_path(self):
        model = create_model(ModelConfig(num_classes=2, compute_dtype="bfloat16"))
        x = jnp.zeros((1, H, W, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        # outputs are cast back to f32 regardless of compute dtype
        assert out["box3d"].dtype == jnp.float32
        # params stay f32
        kernel = variables["params"]["backbone"]["stem_conv"]["kernel"]
        assert kernel.dtype == jnp.float32

    def test_remat_is_output_and_param_identical(self):
        """remat=True (block-level jax.checkpoint) must not change the param
        tree, the forward outputs, or gradient flow — it only trades compute
        for activation memory."""
        cfg = ModelConfig(
            num_classes=2, backbone="resnet10", compute_dtype="float32"
        )
        model = create_model(cfg)
        model_r = create_model(
            ModelConfig(
                num_classes=2, backbone="resnet10",
                compute_dtype="float32", remat=True,
            )
        )
        x = jnp.ones((2, H, W, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(3), x)
        out = model.apply(v, x, train=True)
        out_r = model_r.apply(v, x, train=True)  # same tree -> same params
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), np.asarray(out_r["cls_logits"]),
            atol=1e-6,
        )

        def loss(params):
            o = model_r.apply(
                {"params": params, "batch_stats": v["batch_stats"]}
                if "batch_stats" in v else {"params": params},
                x, train=True,
            )
            return jnp.sum(o["box3d"].astype(jnp.float32) ** 2)

        g = jax.grad(loss)(v["params"])
        total = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0
        )
        assert np.isfinite(total) and total > 0

    def test_anchor_count_matches_model(self):
        cfg = AnchorConfig()
        assert cfg.num_anchors((H, W)) == N_ANCHORS
