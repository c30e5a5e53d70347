"""Train command: data-parallel training loop over the ICI mesh.

The jitted step fuses preprocessing, on-device target generation, forward,
losses, and the optimizer update — the host only decodes/augments images
(compare the reference's host-side target generation in fork workers,
bin/train.py:373-390).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data import PipelineConfig, make_target_fn, preprocess_images
from pyrapose_tpu.data.augment import AugmentConfig
from pyrapose_tpu.data.spec import dataset_spec
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh, shard_batch
from pyrapose_tpu.train import (
    ReduceLROnPlateau,
    create_train_state,
    get_learning_rate,
    make_sharded_train_step,
    set_learning_rate,
)
from pyrapose_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


def _build_dataset(args, spec, augment):
    if args.dataset == "synthetic":
        from pyrapose_tpu.data.synthetic import SyntheticPoseDataset

        n = (args.steps_per_epoch or 50) * args.batch_size
        return SyntheticPoseDataset(spec, num_images=max(n, 64), seed=args.seed)
    from pyrapose_tpu.data.datasets import create_dataset

    return create_dataset(
        args.dataset,
        args.data_path,
        set_name="train",
        spec=spec,
        augment=AugmentConfig() if augment else None,
        seed=args.seed,
    )


def run_train(args) -> int:
    image_shape = (args.image_min_side, args.image_max_side)
    spec = dataset_spec(args.dataset if args.dataset != "synthetic" else "linemod",
                        args.data_path)
    if spec.image_shape != image_shape:
        spec = dataclasses.replace(spec, image_shape=image_shape)

    config = ModelConfig(num_classes=spec.num_classes, backbone=args.backbone)
    pipe = PipelineConfig(image_shape=image_shape, num_classes=spec.num_classes)

    mesh = create_mesh()
    print(f"devices: {jax.device_count()} ({jax.devices()[0].platform})")

    state = create_train_state(
        jax.random.PRNGKey(args.seed),
        config,
        image_shape=image_shape,
        learning_rate=args.lr,
        freeze_backbone_stem=not args.freeze_backbone,
    )
    if args.snapshot:
        state = restore_checkpoint(state, args.snapshot)
        print(f"resumed from {args.snapshot} at step {int(state.step)}")

    step_fn = make_sharded_train_step(mesh, donate=True)
    target_fn = make_target_fn(spec.corners3d, pipe)
    dataset = _build_dataset(args, spec, augment=not args.no_augment)
    plateau = ReduceLROnPlateau()

    steps_per_epoch = args.steps_per_epoch or max(len(dataset) // args.batch_size, 1)

    for epoch in range(args.epochs):
        losses = []
        t0 = time.time()
        for it in range(steps_per_epoch):
            idx = [
                (epoch * steps_per_epoch * args.batch_size + it * args.batch_size + j)
                % len(dataset)
                for j in range(args.batch_size)
            ]
            images_u8, gt = dataset.batch(idx)
            targets = target_fn(jax.tree_util.tree_map(jnp.asarray, gt))
            batch = shard_batch(
                {
                    "images": np.asarray(
                        preprocess_images(jnp.asarray(images_u8))
                    ),
                    "labels": np.asarray(targets.labels),
                    "regression": np.asarray(targets.regression),
                    "mask": np.asarray(targets.mask),
                },
                mesh,
            )
            state, parts = step_fn(state, batch)
            losses.append(float(parts["loss"]))
        dt = time.time() - t0
        mean_loss = float(np.mean(losses))
        imps = steps_per_epoch * args.batch_size / dt
        lr = get_learning_rate(state)
        print(
            f"epoch {epoch + 1}/{args.epochs}: loss {mean_loss:.4f} "
            f"lr {lr:.2e} {imps:.1f} img/s"
        )
        new_lr = plateau.update(mean_loss, lr)
        if new_lr != lr:
            state = set_learning_rate(state, new_lr)
        path = save_checkpoint(state, args.snapshot_path)
        print(f"saved {path}")
    return 0
