#!/usr/bin/env python3
"""Loss-path probe: total_loss of a checkpoint on the SAME frames under
(a) raw targets, (b) device-affine identity warp, (c) random device-affine
warps + photometric — separating "model fits augmented-target mapping
better" from "loss populations differ".

Usage: python tools/loss_probe.py DATA CKPT [--n 8] [--platform cpu]
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
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--split", default="train")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from pyrapose_tpu.data.augment import AugmentConfig
    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.data.device_affine import affine_batch
    from pyrapose_tpu.data.device_augment import photometric_batch
    from pyrapose_tpu.data.pipeline import (
        PipelineConfig, preprocess_images, targets_from_poses,
    )
    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.losses import total_loss
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.train.checkpoint import latest_checkpoint

    spec = dataset_spec("linemod", args.data_root)
    ds = create_dataset("linemod", args.data_root, set_name=args.split,
                        spec=spec, augment=None, seed=0)
    ckpt = latest_checkpoint(args.ckpt) or args.ckpt
    payload = ocp.PyTreeCheckpointer().restore(ckpt)
    params, batch_stats = payload["params"], payload["batch_stats"]
    config = ModelConfig(num_classes=spec.num_classes, backbone="resnet50",
                         frozen_bn=False)
    model = PyraPose(config=config)
    pipe = PipelineConfig(image_shape=spec.image_shape,
                          num_classes=spec.num_classes)
    corners = np.asarray(spec.corners3d, np.float32)

    images_u8, gt = ds.batch(list(range(args.n)))
    images = jnp.asarray(images_u8).astype(jnp.float32)
    gt = jax.tree_util.tree_map(jnp.asarray, gt)

    def loss_of(images_f32, g, train: bool):
        tg = jax.vmap(lambda x: targets_from_poses(x, corners, pipe))(g)
        batch = {"labels": tg.labels, "regression": tg.regression,
                 "mask": tg.mask}
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, _ = model.apply(variables, preprocess_images(images_f32),
                                 train=True, mutable=["batch_stats"])
        else:
            out = model.apply(variables, preprocess_images(images_f32),
                              train=False)
        out_d = {"box3d": out["box3d"], "cls_logits": out["cls_logits"],
                 "mask_logits": out["mask_logits"]}
        _, parts = total_loss(out_d, batch)
        return parts

    _f = jax.jit(loss_of, static_argnames=("train",))

    def f(*a, **kw):
        return {k: round(float(v), 4) for k, v in _f(*a, **kw).items()}

    print("raw/train-BN :", f(images, gt, True))
    print("raw/frozen-BN:", f(images, gt, False))

    # identity warp through the affine path (s=1, b=0): convention check
    ident = AugmentConfig(min_scaling=1.0, max_scaling=1.0,
                          min_translation=(0.0, 0.0),
                          max_translation=(0.0, 0.0))
    imgs_i, gt_i = affine_batch(jax.random.PRNGKey(0), images, gt, ident)
    print("identity-affine/train-BN:", f(imgs_i, gt_i, True))

    # the training augmentation stream (photometric + random affine)
    key = jax.random.PRNGKey(0)
    imgs_p = photometric_batch(jax.random.fold_in(key, 0), images)
    imgs_a, gt_a = affine_batch(jax.random.fold_in(key, 1), imgs_p, gt,
                                AugmentConfig())
    print("photo+affine/train-BN   :", f(imgs_a, gt_a, True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
