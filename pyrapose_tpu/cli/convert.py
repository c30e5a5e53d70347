"""Convert command: keras .h5 checkpoint -> native orbax checkpoint.

The reference's convert-model CLI (bin/convert_model.py:58-84) rewrites a
training .h5 into an inference .h5 (graph surgery). This framework has no
training/inference graph split — the inference graph is a pure function over
the same parameter tree — so `convert` instead performs the one conversion
that still matters: importing reference keras weights (full checkpoint or
ImageNet backbone) into a framework checkpoint for parity evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run_convert(args) -> int:
    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.models.h5_import import (
        import_pyrapose_h5,
        import_resnet_imagenet,
    )
    from pyrapose_tpu.train.checkpoint import save_checkpoint
    from pyrapose_tpu.train.step import create_train_state

    spec = dataset_spec(args.dataset, args.data_path)
    config = ModelConfig(num_classes=spec.num_classes, backbone=args.backbone)
    state = create_train_state(
        jax.random.PRNGKey(0), config, image_shape=spec.image_shape
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.backbone_only:
        variables = import_resnet_imagenet(args.h5, variables, args.backbone)
    else:
        variables = import_pyrapose_h5(args.h5, variables)
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    path = save_checkpoint(state, args.output, step=0)
    print(f"converted {args.h5} -> {path}")
    return 0
