"""ROS1 hardware adapters for the inference client and the DAgger hand-off.

Speaks the same topic surface as the reference's Agilex nodes
(`train_deploy_alignment/inference/agilex/inference/agilex_inference_openpi_rtc.py:1205-1277,
1298-1380` and `dagger/agilex/agilex_openpi_dagger_collect.py:1950-1957`), so it
drops into the same robot bring-up:

- subscribe: `/camera_{f,l,r}/color/image_raw` (sensor_msgs/Image, bgr8) and
  `/puppet/joint_{left,right}` (sensor_msgs/JointState)
- publish:   `/master/joint_{left,right}` (JointState joint commands)
- DAgger master-arm bus: `/teach/master_enable_*`, `/teach/master_config_*`,
  `/teach/teach_mode_*`, `/master_controled/joint_*`

This module imports ``rospy`` lazily: it is robot-edge code for the deployment
host (Ubuntu 20.04 + ROS Noetic per the reference's setup docs) and is not
importable in the training image. The generic loop lives in
``inference_client.py`` — pair this with ``run_sync/run_smooth/run_rtc`` there:

    from ros_robot import Ros1Robot
    robot = Ros1Robot()
    run_smooth(policy, robot, prompt, publish_rate=25, infer_rate=4, max_steps=...)
"""

from __future__ import annotations

import threading

import numpy as np

_CAMERA_TOPICS = {
    "top_head": "/camera_f/color/image_raw",
    "hand_left": "/camera_l/color/image_raw",
    "hand_right": "/camera_r/color/image_raw",
}
_PUPPET_TOPICS = ("/puppet/joint_left", "/puppet/joint_right")
_CMD_TOPICS = ("/master/joint_left", "/master/joint_right")
_JOINT_NAMES = ["joint_0", "joint_1", "joint_2", "joint_3", "joint_4", "joint_5", "joint_6"]


def _require_rospy():
    try:
        import rospy  # noqa: F401

        return rospy
    except ImportError as e:  # pragma: no cover - robot-edge only
        raise ImportError(
            "ros_robot needs a ROS1 (Noetic) environment with rospy + sensor_msgs; "
            "run it on the robot IPC host, not the training/serving host."
        ) from e


def _image_to_chw_rgb(msg) -> np.ndarray:
    """sensor_msgs/Image (bgr8/rgb8) -> uint8 CHW RGB, no cv_bridge dependency."""
    arr = np.frombuffer(msg.data, dtype=np.uint8).reshape(msg.height, msg.width, -1)
    if msg.encoding == "bgr8":
        arr = arr[..., ::-1]
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


class Ros1Robot:
    """``RobotInterface`` over the reference's Agilex ROS1 topic layout.

    ``get_observation`` returns the latest camera frames (CHW uint8) and the
    14-dim state = [left 7 joints, right 7 joints]; ``publish_action`` splits a
    14-dim action into the two puppet-arm command topics.
    """

    def __init__(self, camera_topics: dict | None = None, *, node_name: str = "kai0_client"):
        rospy = _require_rospy()
        from sensor_msgs.msg import Image, JointState

        self._rospy = rospy
        self._JointState = JointState
        if not rospy.core.is_initialized():
            rospy.init_node(node_name, anonymous=True)

        self._lock = threading.Lock()
        self._frames: dict[str, np.ndarray | None] = {}
        self._joints = [None, None]

        for cam, topic in (camera_topics or _CAMERA_TOPICS).items():
            self._frames[cam] = None
            rospy.Subscriber(topic, Image, self._on_image, callback_args=cam,
                             queue_size=1000, tcp_nodelay=True)
        for i, topic in enumerate(_PUPPET_TOPICS):
            rospy.Subscriber(topic, JointState, self._on_joints, callback_args=i,
                             queue_size=1000, tcp_nodelay=True)
        self._pubs = [rospy.Publisher(t, JointState, queue_size=10) for t in _CMD_TOPICS]

    def _on_image(self, msg, cam):
        with self._lock:
            self._frames[cam] = _image_to_chw_rgb(msg)

    def _on_joints(self, msg, side):
        with self._lock:
            self._joints[side] = np.asarray(msg.position, dtype=np.float32)

    def wait_until_ready(self, timeout: float = 30.0) -> bool:
        deadline = self._rospy.get_time() + timeout
        rate = self._rospy.Rate(10)
        while self._rospy.get_time() < deadline:
            with self._lock:
                ready = all(v is not None for v in self._frames.values()) and all(
                    j is not None for j in self._joints
                )
            if ready:
                return True
            rate.sleep()
        return False

    def get_observation(self) -> dict:
        with self._lock:
            if any(v is None for v in self._frames.values()) or any(j is None for j in self._joints):
                raise RuntimeError("No synced frames yet — call wait_until_ready() first")
            images = {cam: frame.copy() for cam, frame in self._frames.items()}
            state = np.concatenate([self._joints[0][:7], self._joints[1][:7]])
        return {"images": images, "state": state.astype(np.float32)}

    def publish_action(self, action: np.ndarray) -> None:
        action = np.asarray(action, dtype=np.float64)
        for side, pub in enumerate(self._pubs):
            msg = self._JointState()
            msg.header.stamp = self._rospy.Time.now()
            msg.name = _JOINT_NAMES
            msg.position = action[side * 7 : side * 7 + 7].tolist()
            msg.velocity = [0.0] * 7
            msg.effort = [0.0] * 7
            pub.publish(msg)


class Ros1MasterArmBus:
    """``kai0_tpu.deploy.dagger.MasterArmBus`` over the reference's teach topics.

    Pair with ``MasterArmSwitcher`` for the DAgger hand-off; the topic names
    match the reference collector's publishers (:1950-1957).
    """

    def __init__(self, robot: Ros1Robot):
        rospy = _require_rospy()
        from sensor_msgs.msg import JointState
        from std_msgs.msg import Bool, Int32, String

        self._robot = robot
        self._Bool, self._Int32, self._String, self._JointState = Bool, Int32, String, JointState
        self._rospy = rospy
        pub = lambda t, T: rospy.Publisher(t, T, queue_size=10)  # noqa: E731
        self._enable = [pub("/teach/master_enable_left", Bool), pub("/teach/master_enable_right", Bool)]
        self._config = [pub("/teach/master_config_left", String), pub("/teach/master_config_right", String)]
        self._teach = [pub("/teach/teach_mode_left", Int32), pub("/teach/teach_mode_right", Int32)]
        self._joints = [
            pub("/master_controled/joint_left", JointState),
            pub("/master_controled/joint_right", JointState),
        ]

    def enable_masters(self, enabled: bool) -> None:
        for p in self._enable:
            p.publish(self._Bool(data=enabled))

    def set_master_config(self, config: str) -> None:
        for p in self._config:
            p.publish(self._String(data=config))

    def set_teach_mode(self, mode: int) -> None:
        for p in self._teach:
            p.publish(self._Int32(data=mode))

    def command_master_joints(self, left, right) -> None:
        for pub, pos in zip(self._joints, (left, right)):
            msg = self._JointState()
            msg.header.stamp = self._rospy.Time.now()
            msg.name = _JOINT_NAMES
            msg.position = list(pos)
            msg.velocity = [0.0] * 7
            msg.effort = [0.0] * 7
            pub.publish(msg)

    def slave_positions(self):
        with self._robot._lock:
            if any(j is None for j in self._robot._joints):
                return None
            return list(self._robot._joints[0]), list(self._robot._joints[1])
