#!/usr/bin/env python3
"""ROS node entry point for pyrapose_tpu.

Capability match of the reference wrapper's __main__
(pyrapose_node.py:773-814): rosparams select continuous vs service mode; the
estimation itself is pyrapose_tpu.serving (jitted on-device pipeline).

Run inside a catkin workspace where this package's messages are built:
    roslaunch pyrapose_ros pyrapose.launch
"""

import rospy

from pyrapose_tpu.serving.factory import estimator_from_checkpoint
from pyrapose_tpu.serving.ros_node import PoseEstimationNode, run_service


def main():
    rospy.init_node("pyrapose")
    get = rospy.get_param
    estimator = estimator_from_checkpoint(
        get("~dataset", "linemod"),
        get("~snapshot", None) or None,
        data_path=get("~data_path", None) or None,
        backbone=get("~backbone", "resnet50"),
        score_threshold=float(get("~detection_threshold", 0.5)),
        icp=bool(get("~icp", False)),
    )
    node_type = get("~node_type", "continuous")
    rgb_topic = get("~image_topic", "/camera/rgb/image_raw")
    depth_topic = get("~depth_topic", "") or None
    if node_type == "service":
        run_service(estimator, rgb_topic=rgb_topic)
    else:
        PoseEstimationNode(estimator, rgb_topic=rgb_topic,
                           depth_topic=depth_topic)
        rospy.spin()


if __name__ == "__main__":
    main()
