"""ROS pose-estimation node (rospy-gated).

Same interface surface as the reference wrapper
(/root/reference/PyraPose_ROS_wrapper/src/pyrapose/pyrapose_node.py):

- continuous mode (PoseEstimationClass, :209-352): subscribes to an RGB
  topic (+ optional depth topic), publishes PoseArray on `/pyrapose/poses`
  and the segmentation image on `/pyrapose/masks` (:223-225, 319-334);
- service mode (PoseEstimationServer, :354-507): a `get_poses` service
  returning per-object name/pose/confidence (srv/returnPoses.srv).

rospy/cv_bridge are not available in this environment; the module imports
them lazily and raises a clear error otherwise. All estimation runs through
serving.engine.PoseEstimator — the jitted on-device pipeline — so this file
is only topic plumbing.
"""

from __future__ import annotations

import numpy as np

from pyrapose_tpu.serving.engine import PoseEstimator


def _require_ros():
    try:
        import rospy  # noqa: F401
        from cv_bridge import CvBridge  # noqa: F401
    except ImportError as exc:  # pragma: no cover - needs a ROS install
        raise RuntimeError(
            "ROS serving requires rospy and cv_bridge (run inside a ROS "
            "environment); for ROS-free serving use "
            "pyrapose_tpu.serving.http_server"
        ) from exc


def _to_pose_array(results, stamp, frame_id):  # pragma: no cover - ROS only
    from geometry_msgs.msg import Pose, PoseArray

    arr = PoseArray()
    arr.header.stamp = stamp
    arr.header.frame_id = frame_id
    for r in results:
        p = Pose()
        p.position.x, p.position.y, p.position.z = map(float, r["trans"])
        w, x, y, z = map(float, r["quat"])
        p.orientation.w, p.orientation.x = w, x
        p.orientation.y, p.orientation.z = y, z
        arr.poses.append(p)
    return arr


class PoseEstimationNode:  # pragma: no cover - needs a ROS install
    """Continuous mode: subscribe RGB (+depth), publish poses + masks."""

    def __init__(
        self,
        estimator: PoseEstimator,
        rgb_topic: str = "/camera/rgb/image_raw",
        depth_topic: str | None = None,
        frame_id: str = "camera",
    ):
        _require_ros()
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image

        self.estimator = estimator
        self.bridge = CvBridge()
        self.frame_id = frame_id
        self.depth = None
        # same topic names as the reference node (pyrapose_node.py:223-225)
        self.pose_pub = rospy.Publisher(
            "/pyrapose/poses", __import__("geometry_msgs.msg", fromlist=["PoseArray"]).PoseArray,
            queue_size=10,
        )
        self.mask_pub = rospy.Publisher("/pyrapose/masks", Image, queue_size=10)
        if depth_topic:
            rospy.Subscriber(depth_topic, Image, self._depth_cb, queue_size=1)
        rospy.Subscriber(rgb_topic, Image, self._rgb_cb, queue_size=1)

    def _depth_cb(self, msg):
        self.depth = (
            np.asarray(self.bridge.imgmsg_to_cv2(msg, "passthrough"), np.float32)
            / 1000.0
        )

    def _rgb_cb(self, msg):
        import rospy

        image = np.asarray(self.bridge.imgmsg_to_cv2(msg, "rgb8"), np.uint8)
        h, w = self.estimator.spec.image_shape
        if image.shape[:2] != (h, w):
            from PIL import Image as PILImage

            image = np.asarray(
                PILImage.fromarray(image).resize((w, h)), np.uint8
            )
        results = self.estimator.estimate(image, depth=self.depth)
        self.pose_pub.publish(
            _to_pose_array(results, msg.header.stamp, self.frame_id)
        )
        if results:
            merged = np.zeros((h, w), np.uint8)
            for r in results:
                merged[r["mask"]] = r["class_id"] + 1
            self.mask_pub.publish(self.bridge.cv2_to_imgmsg(merged, "mono8"))
        del rospy


def _resolve_srv_types(srv_class, msg_class):
    """Resolve the generated service/message classes.

    Resolution order: explicit argument, this repo's catkin package
    (ros/pyrapose_ros — builds returnPoses.srv + PoseWithConfidence.msg, the
    reference definitions srv/returnPoses.srv:1-2, msg/PoseWithConfidence.msg:
    1-3), then the reference's sibling package name. rospy needs generated
    classes (a plain callable cannot carry _request_class/_response_class),
    so failing to find one raises instead of registering a service that would
    crash on first call.
    """
    if srv_class is None:
        try:
            from pyrapose_ros.srv import returnPoses as srv_class  # type: ignore
        except ImportError:
            try:  # the reference's package name, if built in this workspace
                from object_detector_msgs.srv import get_poses as srv_class  # type: ignore
            except ImportError:
                raise RuntimeError(
                    "run_service needs the generated returnPoses service "
                    "class: build ros/pyrapose_ros in your catkin workspace "
                    "(catkin_make / catkin build), or pass srv_class"
                )
    if msg_class is None:
        try:
            from pyrapose_ros.msg import PoseWithConfidence as msg_class  # type: ignore
        except ImportError:
            try:
                from object_detector_msgs.msg import PoseWithConfidence as msg_class  # type: ignore
            except ImportError:
                raise RuntimeError(
                    "PoseWithConfidence message type not built; build "
                    "ros/pyrapose_ros in your catkin workspace"
                )
    return srv_class, msg_class


def make_service_handler(
    estimator: PoseEstimator,
    srv_class,
    msg_class,
    latest_frame,
):
    """Build the `get_poses` service callback.

    Reference semantics (pyrapose_node.py PoseEstimationServer:354-507): the
    request is EMPTY (srv/returnPoses.srv:1-2) — the server estimates on the
    most recent frame from the subscribed image topic. `latest_frame` is a
    zero-arg callable returning that frame (H,W,3 uint8) or None.

    Factored out of run_service so the full request->response path is
    testable without a ROS install (tests/test_ros_node.py).
    """
    from geometry_msgs.msg import Pose

    def handle(req):
        del req  # empty request (returnPoses.srv)
        image = latest_frame()
        response = srv_class._response_class()
        if image is None:
            return response  # no frame received yet -> empty pose list
        for r in estimator.estimate(np.asarray(image, np.uint8)):
            pose = Pose()
            pose.position.x, pose.position.y, pose.position.z = map(
                float, r["trans"]
            )
            (pose.orientation.w, pose.orientation.x,
             pose.orientation.y, pose.orientation.z) = map(float, r["quat"])
            entry = msg_class()
            entry.name = f"obj_{r['obj_id']:06d}"
            entry.confidence = float(r["score"])
            entry.pose = pose
            response.poses.append(entry)
        return response

    return handle


def run_service(
    estimator: PoseEstimator,
    srv_class=None,
    msg_class=None,
    rgb_topic: str = "/camera/rgb/image_raw",
    service_name: str = "get_poses",
):
    """Service mode: `get_poses` returning PoseWithConfidence[]
    (reference srv/returnPoses.srv, pyrapose_node.py:367-370).

    Subscribes to `rgb_topic` and answers each (empty-request) service call
    with poses for the most recent frame, matching the reference server."""
    _require_ros()
    import rospy
    from cv_bridge import CvBridge
    from sensor_msgs.msg import Image

    srv_class, msg_class = _resolve_srv_types(srv_class, msg_class)
    bridge = CvBridge()
    frame = {"image": None}

    def _rgb_cb(msg):
        frame["image"] = np.asarray(bridge.imgmsg_to_cv2(msg, "rgb8"), np.uint8)

    rospy.Subscriber(rgb_topic, Image, _rgb_cb, queue_size=1)
    handler = make_service_handler(
        estimator, srv_class, msg_class, lambda: frame["image"]
    )
    rospy.Service(service_name, srv_class, handler)
    rospy.spin()
