#!/usr/bin/env python3
"""Corner-vote pixel-error probe: how precise is the dense 16-coordinate
regression, measured directly against the encoded targets?

This is the diagnostic that separates the two failure modes of the
accuracy-recipe (docs/USAGE.md):

- eval recall ~0 while this probe shows LOW error  -> decode/PnP-side bug
  (cross-check with the oracle: GT targets -> decode -> PnP must recall ~1);
- eval recall ~0 AND this probe shows HIGH error   -> learning problem.
  Compare train vs val splits: a large gap is generalization (need more
  data / stronger augmentation), a high *train* error means the regression
  never converged (LR schedule — see --cosine-decay).

PnP context for reading the numbers: the RANSAC reprojection gate is 5 px
(reference linemod_eval.py:479-485), so pose recovery needs a solid fraction
of votes under ~5 px. Median 10 px => recall ~0 even with perfect RANSAC.

Usage:
  python tools/corner_error.py DATASET ROOT CKPT_DIR [--split val] [--n 48]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("root")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--split", default="val")
    ap.add_argument("--n", type=int, default=48, help="images to probe")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--platform", default=None, help="e.g. cpu to force CPU")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.data.pipeline import (
        PipelineConfig,
        preprocess_images,
        targets_from_poses,
    )
    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.geometry import anchors_for_shape, decode_box3d
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.train.checkpoint import latest_checkpoint

    spec = dataset_spec(args.dataset, args.root)
    ds = create_dataset(
        args.dataset, args.root, set_name=args.split, spec=spec,
        augment=None, seed=0,
    )

    # accept either a snapshot dir (resolve newest step) or a step dir
    # itself — same contract as evaluate/infer (cli/evaluate.py)
    ckpt = latest_checkpoint(args.ckpt_dir) or args.ckpt_dir
    print("checkpoint:", ckpt)
    payload = ocp.PyTreeCheckpointer().restore(ckpt)
    params, batch_stats = payload["params"], payload["batch_stats"]

    config = ModelConfig(
        num_classes=spec.num_classes, backbone=args.backbone, frozen_bn=False
    )
    model = PyraPose(config=config)
    pipe = PipelineConfig(
        image_shape=spec.image_shape, num_classes=spec.num_classes
    )
    anchors = np.asarray(anchors_for_shape(spec.image_shape, pipe.anchors))
    corners = jnp.asarray(spec.corners3d)

    @jax.jit
    def fwd(images_u8):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            preprocess_images(images_u8),
            train=False,
        )
        boxes3d = decode_box3d(jnp.asarray(anchors)[None], out["box3d"])
        return boxes3d, jax.nn.sigmoid(out["cls_logits"])

    aw = anchors[:, 2] - anchors[:, 0]
    all_err, all_rel, all_score = [], [], []
    n_img = min(args.n, len(ds))
    bs = args.batch_size
    for i in range(0, n_img - n_img % bs, bs):
        images, gt = ds.batch(list(range(i, i + bs)))
        boxes3d, scores = fwd(jnp.asarray(images))
        boxes3d = np.asarray(boxes3d)
        scores = np.asarray(scores)
        tg = jax.vmap(lambda g: targets_from_poses(g, corners, pipe))(gt)
        state = np.asarray(tg.labels[..., -1])
        labels_oh = np.asarray(tg.labels[..., :-1])
        gt_corners = np.asarray(
            decode_box3d(jnp.asarray(anchors)[None], tg.regression[..., :16])
        )
        for b in range(len(images)):
            pos = state[b] == 1.0
            if not pos.any():
                continue
            d = boxes3d[b][pos].reshape(-1, 8, 2) - gt_corners[b][pos].reshape(
                -1, 8, 2
            )
            err = np.linalg.norm(d, axis=-1).mean(axis=-1)
            all_err.append(err)
            all_rel.append(err / aw[pos])
            cls = labels_oh[b][pos].argmax(-1)
            all_score.append(scores[b][pos, cls])

    if not all_err:
        print("no positive anchors found")
        return 1
    err = np.concatenate(all_err)
    rel = np.concatenate(all_rel)
    sc = np.concatenate(all_score)
    print(f"split: {args.split}  images: {n_img}  positive anchors: {len(err)}")
    print(
        f"corner error px : mean {err.mean():.2f}  median {np.median(err):.2f}"
        f"  p10 {np.percentile(err, 10):.2f}  p90 {np.percentile(err, 90):.2f}"
    )
    print(
        f"error/anchor_w  : mean {rel.mean():.3f}  median {np.median(rel):.3f}"
    )
    print(
        f"cls score at GT : mean {sc.mean():.3f}  median {np.median(sc):.3f}"
    )
    hi = sc > 0.5
    med_hi = float(np.median(err[hi])) if hi.any() else float("nan")
    print(
        f"votes with score>0.5: {hi.sum()} ({hi.mean() * 100:.1f}%)  "
        f"their err: median {med_hi:.2f} px"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
