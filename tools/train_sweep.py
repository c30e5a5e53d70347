"""Train-step throughput sweep: batch x remat on the real chip.

Measures the fused training step (pre-staged batches, donated state — the
same methodology as bench.py's train_img_s_per_chip) across configurations,
and reports per-config FLOPs from XLA cost analysis so throughput can be
read against the hardware roofline (train MFU), not just against the
inference number.

Usage:  python tools/train_sweep.py [--iters 20] [--profile-dir DIR]
Prints one JSON line per config and a final summary line.
"""

from __future__ import annotations

# runnable from anywhere: the package lives next to tools/
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def _peak_tflops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0,
             "v6 lite": 918.0, "v6e": 918.0}
    for k, v in table.items():
        if k in kind:
            return v
    return None


def measure(batch: int, remat: bool, iters: int, profile_dir: str | None = None):
    from pyrapose_tpu.data.pipeline import PipelineConfig
    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
    from pyrapose_tpu.models import ModelConfig
    from pyrapose_tpu.parallel import create_mesh
    from pyrapose_tpu.train import create_train_state
    from pyrapose_tpu.train.step import make_fused_train_step

    spec = dataclasses.replace(dataset_spec("linemod"), image_shape=(480, 640))
    pipe = PipelineConfig(image_shape=(480, 640), num_classes=spec.num_classes)
    config = ModelConfig(num_classes=spec.num_classes, backbone="resnet50",
                         remat=remat)
    mesh = create_mesh(jax.devices()[:1])
    state = create_train_state(jax.random.PRNGKey(0), config,
                               image_shape=(480, 640))
    step = make_fused_train_step(mesh, spec.corners3d, pipe, donate=True)

    ds = SyntheticPoseDataset(spec, num_images=batch, seed=0)
    imgs_u8, gt = ds.batch(list(range(batch)))
    imgs_j = jnp.asarray(imgs_u8)
    gt_j = jax.tree_util.tree_map(jnp.asarray, gt)

    # FLOPs of the whole fused step (fwd+bwd+optimizer+target-gen) per image
    tflops_per_img = None
    try:
        cost = (
            jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__") else step)
            .lower(state, imgs_j, gt_j).compile().cost_analysis()
        )
        if cost and cost.get("flops"):
            tflops_per_img = float(cost["flops"]) / 1e12 / batch
    except Exception:
        pass

    t0c = time.perf_counter()
    for _ in range(2):
        state, parts = step(state, imgs_j, gt_j)
    jax.block_until_ready(parts["loss"])
    compile_s = time.perf_counter() - t0c

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, parts = step(state, imgs_j, gt_j)
    jax.block_until_ready(parts["loss"])
    dt = (time.perf_counter() - t0) / iters
    if profile_dir:
        jax.profiler.stop_trace()

    img_s = batch / dt
    out = {"batch": batch, "remat": remat, "step_ms": round(dt * 1e3, 2),
           "img_s_per_chip": round(img_s, 1),
           "compile_s": round(compile_s, 1)}
    if tflops_per_img:
        out["train_tflops_per_img"] = round(tflops_per_img, 4)
        achieved = tflops_per_img * img_s
        out["achieved_tflops"] = round(achieved, 1)
        peak = _peak_tflops()
        if peak:
            out["train_mfu_pct"] = round(100.0 * achieved / peak, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--remat", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--profile-dir", default=None,
                    help="capture a trace for the FIRST config only")
    args = ap.parse_args()

    results = []
    first = True
    for remat in args.remat:
        for batch in args.batches:
            try:
                r = measure(batch, bool(remat), args.iters,
                            args.profile_dir if first else None)
            except Exception as exc:  # e.g. OOM at large batch without remat
                r = {"batch": batch, "remat": bool(remat),
                     "error": str(exc)[:160]}
            first = False
            print(json.dumps(r), flush=True)
            results.append(r)
    best = max((r for r in results if "img_s_per_chip" in r),
               key=lambda r: r["img_s_per_chip"], default=None)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
