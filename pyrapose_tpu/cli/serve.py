"""Serve command: load a checkpoint and answer HTTP pose queries.

Non-ROS counterpart of the reference's service mode
(pyrapose_node.py PoseEstimationServer); ROS users import
pyrapose_tpu.serving.ros_node inside a ROS environment instead.
"""

from __future__ import annotations

from pyrapose_tpu.serving.factory import estimator_from_checkpoint
from pyrapose_tpu.serving.http_server import serve


def run_serve(args) -> int:
    estimator = estimator_from_checkpoint(
        args.dataset,
        args.snapshot,
        data_path=args.data_path,
        backbone=args.backbone,
        score_threshold=args.score_threshold,
        icp=args.icp,
        int8=getattr(args, "int8", False),
        image_shape=(
            getattr(args, "image_min_side", 480),
            getattr(args, "image_max_side", 640),
        ),
    )
    serve(estimator, args.host, args.port)
    return 0
