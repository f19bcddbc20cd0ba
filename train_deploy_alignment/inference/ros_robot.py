"""ROS1 + ROS2 hardware adapters for the inference client and the DAgger hand-off.

``Ros1Robot`` speaks the same topic surface as the reference's Agilex nodes
(`train_deploy_alignment/inference/agilex/inference/agilex_inference_openpi_rtc.py:1205-1277,
1298-1380` and `dagger/agilex/agilex_openpi_dagger_collect.py:1950-1957`), so it
drops into the same robot bring-up:

- subscribe: `/camera_{f,l,r}/color/image_raw` (sensor_msgs/Image, bgr8) and
  `/puppet/joint_{left,right}` (sensor_msgs/JointState)
- publish:   `/master/joint_{left,right}` (JointState joint commands)
- DAgger master-arm bus: `/teach/master_enable_*`, `/teach/master_config_*`,
  `/teach/teach_mode_*`, `/master_controled/joint_*`

``Ros2Robot`` speaks the reference's ARX X5 surface
(`train_deploy_alignment/inference/arx/inference/arx_openpi_inference_rtc.py:385-620`):

- subscribe: `/arm_slave_{l,r}_status` (arx5_arm_msg/RobotStatus ``joint_pos``,
  falling back to sensor_msgs/JointState like the reference does)
- publish:   `/arm_master_{l,r}_status` (RobotStatus joint commands)
- cameras:   RealSense pipelines by serial (pyrealsense2, 640x480 RGB @ 30),
  exposed under the policy camera names top_head / hand_left / hand_right
- `smooth_return_to_zero` cosine ramp with the ARX gripper open values

Both classes import their ROS stack (``rospy`` / ``rclpy``) lazily: this is
robot-edge code for the deployment host (Ubuntu 20.04 per the reference's setup
docs) and is not importable in the training image. The generic loop lives in
``inference_client.py`` — pair either robot with ``run_sync/run_smooth/run_rtc``:

    from ros_robot import Ros1Robot, Ros2Robot
    robot = Ros1Robot()   # Agilex / ROS Noetic
    robot = Ros2Robot(camera_serials={...})  # ARX X5 / ROS2
    run_smooth(policy, robot, prompt, publish_rate=25, infer_rate=4, max_steps=...)
"""

from __future__ import annotations

import threading
import time

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


# --- ARX X5 over ROS2 ---------------------------------------------------------

_ARX_STATE_TOPICS = ("/arm_slave_l_status", "/arm_slave_r_status")
_ARX_CMD_TOPICS = ("/arm_master_l_status", "/arm_master_r_status")
# Reference return-to-zero pose: all joints 0, grippers held at 3.0 during the
# ramp and released to 5.0 (open) at the end (arx_openpi_inference_rtc.py:575-597).
_ARX_ZERO_POSE_GRIP = 3.0
_ARX_OPEN_GRIP = 5.0


def cosine_ramp(current: np.ndarray, target: np.ndarray, duration: float, hz: float) -> np.ndarray:
    """[n_steps+1, dim] half-cosine trajectory from current to target.

    The smooth return-to-zero schedule the reference publishes at 50 Hz
    (arx_openpi_inference_rtc.py:580-590); pure so it is unit-testable off-robot.
    """
    n = max(1, int(duration * hz))
    alpha = (1.0 - np.cos(np.linspace(0.0, 1.0, n + 1) * np.pi)) / 2.0
    return current[None, :] * (1.0 - alpha[:, None]) + target[None, :] * alpha[:, None]


def _require_rclpy():
    try:
        import rclpy  # noqa: F401

        return rclpy
    except ImportError as e:  # pragma: no cover - robot-edge only
        raise ImportError(
            "Ros2Robot needs a ROS2 environment with rclpy (+ arx5_arm_msg for the "
            "real arm); run it on the robot IPC host, not the training/serving host."
        ) from e


class Ros2Robot:
    """``RobotInterface`` over the reference's ARX X5 ROS2 + RealSense layout.

    Joint state arrives as arx5_arm_msg/RobotStatus (``joint_pos``, 7 per arm);
    like the reference we fall back to sensor_msgs/JointState (``position``) when
    the ARX message package is absent. Cameras are RealSense pipelines opened by
    serial number (reference init_cameras), surfaced under the policy camera
    names so ``ARXInputs`` consumes the observation unchanged.
    """

    def __init__(
        self,
        camera_serials: dict[str, str] | None = None,
        *,
        node_name: str = "kai0_client",
        state_topics: tuple[str, str] = _ARX_STATE_TOPICS,
        cmd_topics: tuple[str, str] = _ARX_CMD_TOPICS,
        warmup_frames: int = 30,
    ):
        rclpy = _require_rclpy()
        from rclpy.node import Node

        try:  # pragma: no cover - needs the ARX message package
            from arx5_arm_msg.msg import RobotStatus

            self._joint_field = "joint_pos"
        except ImportError:
            from sensor_msgs.msg import JointState as RobotStatus

            self._joint_field = "position"
        self._RobotStatus = RobotStatus

        if not rclpy.ok():
            rclpy.init()
        self._rclpy = rclpy
        self._node = Node(node_name)
        self._lock = threading.Lock()
        self._joints: list[np.ndarray | None] = [None, None]

        for side, topic in enumerate(state_topics):
            self._node.create_subscription(
                RobotStatus, topic, lambda msg, s=side: self._on_status(msg, s), 10
            )
        self._pubs = [self._node.create_publisher(RobotStatus, t, 10) for t in cmd_topics]

        self._spin = threading.Thread(
            target=rclpy.spin, args=(self._node,), daemon=True, name="ros2-spin"
        )
        self._spin.start()

        self._pipelines = {}
        if camera_serials:
            self._init_cameras(camera_serials, warmup_frames)

    def _init_cameras(self, serials: dict[str, str], warmup_frames: int) -> None:
        import pyrealsense2 as rs  # robot-edge dependency

        for cam, serial in serials.items():
            pipeline = rs.pipeline()
            cfg = rs.config()
            cfg.enable_device(serial)
            cfg.enable_stream(rs.stream.color, 640, 480, rs.format.rgb8, 30)
            pipeline.start(cfg)
            self._pipelines[cam] = pipeline
        for _ in range(warmup_frames):  # reference warms 30 frames per camera
            for pipeline in self._pipelines.values():
                pipeline.wait_for_frames(timeout_ms=5000)

    def _on_status(self, msg, side: int) -> None:
        pos = np.asarray(getattr(msg, self._joint_field), dtype=np.float32)
        with self._lock:
            self._joints[side] = pos

    def wait_until_ready(self, timeout: float = 15.0) -> bool:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline and self._rclpy.ok():
            with self._lock:
                if all(j is not None for j in self._joints):
                    return True
            time.sleep(0.1)
        return False

    def get_observation(self) -> dict:
        images = {}
        for cam, pipeline in self._pipelines.items():
            frames = pipeline.wait_for_frames(timeout_ms=1000)
            color = frames.get_color_frame()
            if color:
                hwc = np.asanyarray(color.get_data())  # rgb8 already
                images[cam] = np.ascontiguousarray(hwc.transpose(2, 0, 1))
        with self._lock:
            if any(j is None for j in self._joints):
                raise RuntimeError("No joint state yet — call wait_until_ready() first")
            state = np.concatenate([self._joints[0][:7], self._joints[1][:7]])
        return {"images": images, "state": state.astype(np.float32)}

    def publish_action(self, action: np.ndarray) -> None:
        action = np.asarray(action, dtype=np.float64)
        for side, pub in enumerate(self._pubs):
            msg = self._RobotStatus()
            setattr(msg, self._joint_field, [float(x) for x in action[side * 7 : side * 7 + 7]])
            pub.publish(msg)

    def smooth_return_to_zero(self, duration: float = 3.0, hz: float = 50.0) -> bool:
        with self._lock:
            if any(j is None for j in self._joints):
                return False
            current = np.concatenate([self._joints[0][:7], self._joints[1][:7]]).astype(np.float64)
        target = np.zeros(14)
        target[6] = target[13] = _ARX_ZERO_POSE_GRIP
        for pos in cosine_ramp(current, target, duration, hz):
            self.publish_action(pos)
            time.sleep(1.0 / hz)
        open_pos = np.zeros(14)
        open_pos[6] = open_pos[13] = _ARX_OPEN_GRIP
        self.publish_action(open_pos)
        return True

    def close(self) -> None:
        for pipeline in self._pipelines.values():
            pipeline.stop()
        self._node.destroy_node()
