"""Post-training int8 quantization of the serving path.

The v5e MXU executes int8 x int8 -> int32 at twice its bf16 rate
(394 vs 197 TOPS) and int8 kernels quarter the weight HBM traffic, so a
quantized conv stack raises the inference ceiling well past the bf16
roofline (docs/ARCHITECTURE.md). The reference has no quantization story
(TF2.1 Keras serving, pyrapose_node.py) — this is a TPU-native extension,
off by default.

Scheme (standard conv-net PTQ, chosen for zero calibration requirements):

- weights: symmetric per-OUTPUT-CHANNEL int8, quantized offline from the
  trained f32 checkpoint (`quantize_variables`);
- activations: symmetric per-tensor int8 with a DYNAMIC scale (abs-max
  computed inside the jitted program, one cheap VPU reduction per conv) —
  no calibration dataset, robust to domain shift;
- accumulation in int32 (`preferred_element_type`), dequantized by
  x_scale * w_scale[out_ch]; bias/BN/relu stay in the model's compute
  dtype (elementwise, VPU-bound, cheap);
- the three head OUTPUT convs are left un-quantized by default: they feed
  the corner regression / logits directly, where per-tensor activation
  error lands 1:1 on the output (`skip` parameter).

Mechanism: no duplicated model definition. `quantized_apply` wraps
`model.apply` with a flax call interceptor that swaps every nn.Conv whose
path appears in the table for the int8 computation; the f32 kernel is
never read (XLA dead-code-eliminates the unused parameter), all other
modules (BN, pooling, heads' skip set) run unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn
import flax.traverse_util

# head output convs: quantization error lands directly on corner offsets /
# logits, so keep them in the compute dtype by default
DEFAULT_SKIP = (
    ("box3d_head", "out"),
    ("cls_head", "out"),
    ("mask_head", "out"),
)


def quantize_variables(
    variables: dict,
    skip: tuple[tuple[str, ...], ...] = DEFAULT_SKIP,
) -> dict:
    """Build the int8 side table from trained variables.

    Returns {conv_path_tuple: {"w": int8 HWIO, "scale": f32 (Cout,),
    "bias": f32 (Cout,) | ()}}. Every 4-D "kernel" leaf in params is a
    conv; per-output-channel symmetric scales keep the quantization error
    independent across filters (the standard requirement for conv PTQ to
    hold accuracy).
    """
    flat = flax.traverse_util.flatten_dict(variables["params"])
    table: dict[tuple[str, ...], dict[str, jnp.ndarray]] = {}
    for path, leaf in flat.items():
        if path[-1] != "kernel" or np.ndim(leaf) != 4:
            continue
        # depthwise convs (efficientnet MBConv) have kernel shape
        # (H, W, 1, O): _qconv implements only the dense
        # feature_group_count==1 case, and the interceptor refuses to swap
        # them — they must not enter the table, or strip_quantized_kernels
        # would delete kernels the f32 path still reads
        if leaf.shape[2] == 1:
            continue
        mod_path = tuple(path[:-1])
        if mod_path in skip:
            continue
        w = np.asarray(leaf, np.float32)  # (H, W, I, O)
        scale = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0  # (O,)
        scale = np.maximum(scale, 1e-12)
        w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        bias = flat.get(path[:-1] + ("bias",))
        table[mod_path] = {
            "w": jnp.asarray(w_q),
            "scale": jnp.asarray(scale, jnp.float32),
            "bias": (
                jnp.asarray(bias, jnp.float32)
                if bias is not None
                else jnp.zeros((), jnp.float32)
            ),
        }
    return table


def calibrate_activation_scales(
    model: nn.Module,
    variables: dict,
    qtable: dict,
    sample_images: "jnp.ndarray",
    margin: float = 1.05,
    **apply_kwargs: Any,
) -> dict:
    """Static PTQ calibration: replace the dynamic per-tensor activation
    scale with a fixed one measured on representative inputs.

    Runs the UN-quantized model over `sample_images` with an observing
    interceptor, records each table'd conv's input abs-max, and returns a
    new table whose entries carry `x_scale` (with a safety margin for
    unseen inputs — activations past it saturate at +-127, which focal/
    regression heads tolerate). `_qconv` then skips the abs-max + its
    serialization point: the quantized program becomes a pure feed-forward
    int8 pipeline.
    """
    observed: dict[tuple[str, ...], float] = {}

    def observer(next_fun, call_args, call_kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Conv)
            and context.method_name == "__call__"
            and tuple(mod.scope.path) in qtable
        ):
            path = tuple(mod.scope.path)
            amax = float(jnp.max(jnp.abs(call_args[0].astype(jnp.float32))))
            observed[path] = max(observed.get(path, 0.0), amax)
        return next_fun(*call_args, **call_kwargs)

    with nn.intercept_methods(observer):
        model.apply(variables, sample_images, **apply_kwargs)

    out = {}
    for path, entry in qtable.items():
        e = dict(entry)
        if path in observed:
            e["x_scale"] = jnp.asarray(
                max(observed[path] * margin / 127.0, 1e-12), jnp.float32
            )
        out[path] = e
    return out


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _qconv(mod: nn.Conv, x: jnp.ndarray, entry: dict) -> jnp.ndarray:
    """int8 replacement for one nn.Conv call (NHWC/HWIO, as all model
    convs are)."""
    out_dtype = mod.dtype or x.dtype
    xf = x.astype(jnp.float32)
    x_scale = entry.get("x_scale")
    if x_scale is None:  # dynamic fallback: abs-max per call
        x_scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q,
        entry["w"],
        window_strides=_as_pair(mod.strides),
        padding=mod.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * entry["scale"])
    if mod.use_bias:
        y = y + entry["bias"]
    return y.astype(out_dtype)


def quantized_apply(
    model: nn.Module, variables: dict, qtable: dict, *args: Any, **kwargs: Any
):
    """model.apply with every table'd nn.Conv swapped for its int8 form."""

    def interceptor(next_fun, call_args, call_kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Conv)
            and context.method_name == "__call__"
            and tuple(mod.scope.path) in qtable
        ):
            # a table'd conv MUST be swappable: strip_quantized_kernels
            # deletes every table'd f32 kernel, so silently falling back to
            # next_fun here would read a deleted parameter. _qconv
            # implements the dense case only; grouped/dilated convs must be
            # kept out of the table (quantize_variables skips depthwise by
            # kernel shape; use its `skip` arg for anything else).
            if mod.feature_group_count != 1 or _as_pair(
                getattr(mod, "kernel_dilation", 1) or 1
            ) != (1, 1):
                raise ValueError(
                    f"quantization table contains conv {mod.scope.path} "
                    "with feature_group_count != 1 or dilation; exclude it "
                    "via quantize_variables(skip=...)"
                )
            return _qconv(mod, call_args[0], qtable[tuple(mod.scope.path)])
        return next_fun(*call_args, **call_kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, *args, **kwargs)


def strip_quantized_kernels(variables: dict, qtable: dict) -> dict:
    """Drop the f32 kernels the quantized path never reads (HBM saving:
    ~4x per quantized conv). The returned tree is only valid for
    `quantized_apply` with the same table."""
    flat = flax.traverse_util.flatten_dict(variables["params"])
    kept = {
        path: leaf
        for path, leaf in flat.items()
        if not (path[-1] == "kernel" and tuple(path[:-1]) in qtable)
    }
    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(kept)
    return out
