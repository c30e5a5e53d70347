"""Estimator construction shared by the serving frontends.

Both the HTTP server (cli/serve.py) and the ROS node script
(ros/pyrapose_ros/scripts/pyrapose_node.py) need the same load-checkpoint ->
PoseEstimator recipe (the reference duplicates it between bin/evaluate.py and
the ROS wrapper's __main__, pyrapose_node.py:773-814).
"""

from __future__ import annotations

import dataclasses

from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig


def estimator_from_checkpoint(
    dataset: str,
    snapshot: str | None,
    data_path: str | None = None,
    backbone: str = "resnet50",
    score_threshold: float = 0.5,
    icp: bool = False,
    image_shape: tuple[int, int] = (480, 640),
    int8: bool = False,
) -> PoseEstimator:
    """Load a checkpoint (or random weights, with a warning) into a ready
    PoseEstimator; resolves mesh model points when ICP is requested."""
    import jax
    import jax.numpy as jnp

    from pyrapose_tpu.data.spec import dataset_spec
    from pyrapose_tpu.models import ModelConfig, PyraPose
    from pyrapose_tpu.train.checkpoint import restore_variables

    spec = dataset_spec(
        dataset if dataset != "synthetic" else "linemod", data_path
    )
    if spec.image_shape != image_shape:
        spec = dataclasses.replace(spec, image_shape=image_shape)
    config = ModelConfig(num_classes=spec.num_classes, backbone=backbone)
    if snapshot:
        params, batch_stats = restore_variables(
            snapshot, config=config, image_shape=spec.image_shape
        )
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        model = PyraPose(config=config)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *spec.image_shape, 3), jnp.float32),
        )
        print("WARNING: no snapshot given, serving random weights")

    # ICP must refine against real surface points, not the 8 virtual box
    # corners (see engine.PoseEstimator): load sampled PLY clouds.
    model_points = None
    use_icp = icp
    if use_icp:
        from pyrapose_tpu.eval.drivers import load_model_points

        model_points = (
            load_model_points(data_path, spec) if data_path else None
        )
        if model_points is None:
            print(
                "WARNING: ICP requested but no mesh models found under "
                f"{data_path}/models; ICP disabled"
            )
            use_icp = False

    return PoseEstimator(
        spec,
        variables,
        ServingConfig(
            score_threshold=score_threshold, icp=use_icp, int8=int8
        ),
        model_config=config,
        model_points=model_points,
    )
