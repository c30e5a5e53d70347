#!/usr/bin/env python3
"""Error-structure probe: is the corner-regression val error zero-mean
scatter (true generalization noise) or a systematic bias (pipeline bug)?

Prints mean/median of the signed (dx, dy) residual per corner index and
the residual norm after removing the per-image mean shift.

Usage: python tools/corner_bias.py DATA CKPT [--split valmid] [--n 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("ckpt")
    ap.add_argument("--split", default="valmid")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.data.pipeline import (
        PipelineConfig, preprocess_images, targets_from_poses,
    )
    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.geometry import anchors_for_shape, decode_box3d
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.train.checkpoint import latest_checkpoint

    spec = dataset_spec("linemod", args.data_root)
    ds = create_dataset("linemod", args.data_root, set_name=args.split,
                        spec=spec, augment=None, seed=0)
    ckpt = latest_checkpoint(args.ckpt) or args.ckpt
    print("checkpoint:", ckpt)
    payload = ocp.PyTreeCheckpointer().restore(ckpt)
    params, batch_stats = payload["params"], payload["batch_stats"]
    config = ModelConfig(num_classes=spec.num_classes, backbone="resnet50",
                         frozen_bn=False)
    model = PyraPose(config=config)
    pipe = PipelineConfig(image_shape=spec.image_shape,
                          num_classes=spec.num_classes)
    anchors = np.asarray(anchors_for_shape(spec.image_shape, pipe.anchors))
    corners = jnp.asarray(spec.corners3d)

    @jax.jit
    def fwd(images_u8):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          preprocess_images(images_u8), train=False)
        return decode_box3d(jnp.asarray(anchors)[None], out["box3d"])

    res = []  # signed residuals (n_pos, 8, 2)
    per_img_mean = []
    for i in range(0, args.n, 4):
        images, gt = ds.batch(list(range(i, min(i + 4, args.n))))
        pred = np.asarray(fwd(jnp.asarray(images)))
        tg = jax.vmap(lambda g: targets_from_poses(g, corners, pipe))(gt)
        state = np.asarray(tg.labels[..., -1])
        gtc = np.asarray(decode_box3d(jnp.asarray(anchors)[None],
                                      tg.regression[..., :16]))
        for b in range(len(images)):
            pos = state[b] == 1.0
            if not pos.any():
                continue
            d = (pred[b][pos] - gtc[b][pos]).reshape(-1, 8, 2)
            res.append(d)
            per_img_mean.append(d.mean(axis=(0, 1)))

    d = np.concatenate(res)  # (N, 8, 2)
    print(f"split {args.split}: {d.shape[0]} positive anchors")
    print("global mean residual (dx, dy):", np.round(d.mean(axis=(0, 1)), 2))
    print("per-corner mean residual:")
    for j in range(8):
        m = d[:, j].mean(axis=0)
        print(f"  corner {j}: dx {m[0]:7.2f}  dy {m[1]:7.2f}  "
              f"|err| median {np.median(np.linalg.norm(d[:, j], axis=-1)):6.2f}")
    norm = np.linalg.norm(d, axis=-1)
    print("residual-norm median (raw):", round(float(np.median(norm)), 2))
    centered = d - d.mean(axis=0, keepdims=True)
    print("residual-norm median (minus per-corner mean):",
          round(float(np.median(np.linalg.norm(centered, axis=-1))), 2))
    pim = np.stack(per_img_mean)
    print("per-image mean shift spread (std over images):",
          np.round(pim.std(axis=0), 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
