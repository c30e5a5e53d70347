"""Serve command: load a checkpoint and answer HTTP pose queries.

Non-ROS counterpart of the reference's service mode
(pyrapose_node.py PoseEstimationServer); ROS users import
pyrapose_tpu.serving.ros_node inside a ROS environment instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyrapose_tpu.data.spec import dataset_spec
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig
from pyrapose_tpu.serving.http_server import serve
from pyrapose_tpu.train.checkpoint import restore_params


def run_serve(args) -> int:
    import dataclasses

    spec = dataset_spec(
        args.dataset if args.dataset != "synthetic" else "linemod", args.data_path
    )
    image_shape = (
        getattr(args, "image_min_side", 480), getattr(args, "image_max_side", 640)
    )
    if spec.image_shape != image_shape:
        spec = dataclasses.replace(spec, image_shape=image_shape)
    config = ModelConfig(num_classes=spec.num_classes, backbone=args.backbone)
    if args.snapshot:
        params, batch_stats = restore_params(args.snapshot)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        model = PyraPose(config=config)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *spec.image_shape, 3), jnp.float32)
        )
        print("WARNING: no snapshot given, serving random weights")

    # ICP needs real surface points: refine against box corners corrupts
    # poses (8 virtual points off the object surface have meaningless
    # nearest-neighbor correspondences). Load sampled PLY clouds like the
    # eval drivers (reference loads meshes in its node too,
    # pyrapose_node.py:679-732); refuse ICP when none are available.
    model_points = None
    use_icp = args.icp
    if use_icp:
        from pyrapose_tpu.eval.drivers import load_model_points

        model_points = (
            load_model_points(args.data_path, spec) if args.data_path else None
        )
        if model_points is None:
            print(
                "WARNING: --icp requested but no mesh models found under "
                f"{args.data_path}/models; ICP disabled"
            )
            use_icp = False

    estimator = PoseEstimator(
        spec,
        variables,
        ServingConfig(score_threshold=args.score_threshold, icp=use_icp),
        model_config=config,
        model_points=model_points,
    )
    serve(estimator, args.host, args.port)
    return 0
