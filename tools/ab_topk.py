"""A/B: `approx_max_k` vs exact top-k in the RANSAC vote gather.

`pose/ransac.py` defaults to `jax.lax.approx_max_k(..., recall_target=0.95)`
for the per-class vote gather — a TPU-optimized partial sort that deviates
from the reference's exact thresholding (reference linemod_eval.py:317-334).
The in-code justification is that the hypothesis tournament + GN refinement
wash out near-tie differences; this tool backs (or refutes) that claim with
a measured recall delta and step-time delta on a trained checkpoint.

Usage:
    python tools/ab_topk.py linemod /path/to/data CKPT \
        [--set-name val] [--batch-size 8] [--max-batches N]

Prints one JSON line per arm plus a final `ab_topk` comparison line; record
the result in docs/ARCHITECTURE.md (VERDICT round-1 item 8).
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
import numpy as np


def build(args, approx: bool):
    from pyrapose_tpu.inference import RansacConfig, build_inference_fn
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.train.checkpoint import restore_variables
    from pyrapose_tpu.data.spec import dataset_spec

    spec = dataset_spec(args.dataset, args.data_path)
    if args.image_min_side:
        shape = (args.image_min_side, args.image_max_side)
        spec = dataclasses.replace(spec, image_shape=shape)
    config = ModelConfig(num_classes=spec.num_classes, backbone=args.backbone)
    PyraPose(config=config)  # validate backbone name early
    params, batch_stats = restore_variables(
        args.snapshot, config=config, image_shape=spec.image_shape
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    ransac = RansacConfig(
        score_threshold=args.score_threshold, approx_top_k=approx,
        top_k=args.ransac_top_k,
    )
    infer = build_inference_fn(
        PyraPose(config=config), spec.corners3d, spec.image_shape, ransac
    )
    return spec, infer, variables


def run_arm(args, approx: bool) -> dict:
    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.eval.driver import evaluate_dataset
    from pyrapose_tpu.eval.drivers import load_model_points

    spec, infer, variables = build(args, approx)
    ds = create_dataset(args.dataset, args.data_path, args.set_name, spec=spec)
    model_points = load_model_points(args.data_path, spec)

    batches = list(ds.epoch_batches(args.batch_size, shuffle=False))
    if args.max_batches:
        batches = batches[: args.max_batches]

    # timing: pure jitted inference, warm (first batch compiles)
    imgs0, gt0 = batches[0][0], batches[0][1]
    cam0 = jnp.asarray(gt0.cam)
    poses, _ = infer(variables, jnp.asarray(imgs0), cam0)
    jax.block_until_ready(poses.rot)
    t0 = time.perf_counter()
    reps = 0
    for imgs, gt in batches[: max(1, min(8, len(batches)))]:
        poses, _ = infer(variables, jnp.asarray(imgs), jnp.asarray(gt.cam))
        jax.block_until_ready(poses.rot)
        reps += imgs.shape[0]
    dt = time.perf_counter() - t0

    report = evaluate_dataset(
        spec, infer, variables, iter(batches),
        model_points=model_points, verbose=False,
    )
    out = {
        "arm": "approx" if approx else "exact",
        "mean_recall": report["mean_recall"],
        "mean_detection_rate": report["mean_detection_rate"],
        "img_s": reps / dt,
        "images": sum(b[0].shape[0] for b in batches),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("data_path")
    p.add_argument("snapshot")
    p.add_argument("--set-name", default="val")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--ransac-top-k", type=int, default=32,
                   help="vote-pool size per class (A/B at the K actually "
                   "used for reporting; approx-vs-exact cost grows with K)")
    p.add_argument("--image-min-side", type=int, default=0)
    p.add_argument("--image-max-side", type=int, default=0)
    args = p.parse_args()

    a = run_arm(args, approx=True)
    b = run_arm(args, approx=False)
    print(json.dumps({
        "metric": "ab_topk",
        "recall_delta_approx_minus_exact": a["mean_recall"] - b["mean_recall"],
        "speedup_approx_over_exact": a["img_s"] / max(b["img_s"], 1e-9),
        "approx": a, "exact": b,
    }))


if __name__ == "__main__":
    main()
