"""Rosbag-replay contract tests for the ROS robot adapters (no ROS core needed).

The reference vendors full robot-side node graphs (Agilex Piper ROS1 nodes,
`train_deploy_alignment/inference/agilex/inference/agilex_inference_openpi_rtc.py:1205-1380`;
ARX X5 ROS2 controller, `train_deploy_alignment/inference/arx/inference/
arx_openpi_inference_rtc.py:385-620` + `dagger/arx/X5_ws/src/arxmsgros2/
arx5_arm_msg/msg/RobotStatus.msg`). We can't run those stacks here, but we CAN
pin the adapters' wire contract: these tests install fake ``rospy``/``rclpy``/
message packages, replay recorded topic streams through ``Ros1Robot``/
``Ros2Robot``, and assert every published message matches the reference's
message layouts field-for-field. The fake messages use ``__slots__`` copied
from the reference ``.msg`` definitions, so setting a field the real message
type doesn't have fails loudly.
"""

import importlib.util
import pathlib
import sys
import threading
import types

import numpy as np
import pytest


def _load_ros_robot(name: str):
    path = pathlib.Path(__file__).parent.parent / "train_deploy_alignment/inference/ros_robot.py"
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


class _Header:
    __slots__ = ("stamp",)

    def __init__(self):
        self.stamp = None


class _Image:
    """sensor_msgs/Image subset the reference camera nodes fill."""

    __slots__ = ("header", "height", "width", "encoding", "is_bigendian", "step", "data")

    def __init__(self, *, height=0, width=0, encoding="", data=b""):
        self.header = _Header()
        self.height = height
        self.width = width
        self.encoding = encoding
        self.is_bigendian = 0
        self.step = 0
        self.data = data


class _JointState:
    """sensor_msgs/JointState — the Piper puppet/master wire type."""

    __slots__ = ("header", "name", "position", "velocity", "effort")

    def __init__(self):
        self.header = _Header()
        self.name = []
        self.position = []
        self.velocity = []
        self.effort = []


class _ArxRobotStatus:
    """arx5_arm_msg/RobotStatus with exactly the reference's fields
    (dagger/arx/X5_ws/src/arxmsgros2/arx5_arm_msg/msg/RobotStatus.msg)."""

    __slots__ = ("header", "end_pos", "joint_pos", "joint_vel", "joint_cur")

    def __init__(self):
        self.header = _Header()
        self.end_pos = [0.0] * 6
        self.joint_pos = [0.0] * 7
        self.joint_vel = [0.0] * 7
        self.joint_cur = [0.0] * 7


def _simple_data_msg(name):
    cls = type(name, (), {"__slots__": ("data",), "__init__": lambda self, data=None: setattr(self, "data", data)})
    return cls


class _TopicBus:
    """Single-process pub/sub fabric shared by the fake ROS1 and ROS2 stacks."""

    def __init__(self):
        self.subscriptions = {}  # topic -> list[(msg_type, callback)]
        self.published = []  # list[(topic, msg_type, msg)]

    def subscribe(self, topic, msg_type, callback):
        self.subscriptions.setdefault(topic, []).append((msg_type, callback))

    def deliver(self, topic, msg):
        for msg_type, callback in self.subscriptions.get(topic, []):
            assert isinstance(msg, msg_type), f"{topic}: replayed {type(msg).__name__}, subscriber wants {msg_type.__name__}"
            callback(msg)

    def record(self, topic, msg_type, msg):
        assert isinstance(msg, msg_type), f"{topic}: published {type(msg).__name__} on a {msg_type.__name__} publisher"
        self.published.append((topic, msg_type, msg))

    def on(self, topic):
        return [msg for t, _, msg in self.published if t == topic]


class _BusPublisher:
    def __init__(self, bus, topic, msg_type):
        self._bus, self._topic, self._msg_type = bus, topic, msg_type

    def publish(self, msg):
        self._bus.record(self._topic, self._msg_type, msg)


def _install_fake_ros1(monkeypatch):
    bus = _TopicBus()

    rospy = types.ModuleType("rospy")
    rospy.core = types.SimpleNamespace(is_initialized=lambda: True)
    rospy.init_node = lambda *a, **k: None
    rospy.get_time = lambda: 0.0
    rospy.Rate = lambda hz: types.SimpleNamespace(sleep=lambda: None)
    rospy.Time = types.SimpleNamespace(now=lambda: 12345)

    def Subscriber(topic, msg_type, callback, callback_args=None, **_kw):
        if callback_args is not None:
            bus.subscribe(topic, msg_type, lambda msg: callback(msg, callback_args))
        else:
            bus.subscribe(topic, msg_type, callback)

    rospy.Subscriber = Subscriber
    rospy.Publisher = lambda topic, msg_type, queue_size=10: _BusPublisher(bus, topic, msg_type)

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs.msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs.msg.Image = _Image
    sensor_msgs.msg.JointState = _JointState

    std_msgs = types.ModuleType("std_msgs")
    std_msgs.msg = types.ModuleType("std_msgs.msg")
    std_msgs.msg.Bool = _simple_data_msg("Bool")
    std_msgs.msg.Int32 = _simple_data_msg("Int32")
    std_msgs.msg.String = _simple_data_msg("String")

    for name, module in [
        ("rospy", rospy),
        ("sensor_msgs", sensor_msgs),
        ("sensor_msgs.msg", sensor_msgs.msg),
        ("std_msgs", std_msgs),
        ("std_msgs.msg", std_msgs.msg),
    ]:
        monkeypatch.setitem(sys.modules, name, module)
    return bus


def _install_fake_ros2(monkeypatch, *, with_arx_msgs: bool):
    bus = _TopicBus()
    shutdown = threading.Event()

    rclpy = types.ModuleType("rclpy")
    rclpy.ok = lambda: not shutdown.is_set()
    rclpy.init = lambda *a, **k: None
    rclpy.spin = lambda node: shutdown.wait(timeout=30)

    class Node:
        def __init__(self, name):
            self._name = name

        def create_subscription(self, msg_type, topic, callback, qos):
            bus.subscribe(topic, msg_type, callback)

        def create_publisher(self, msg_type, topic, qos):
            return _BusPublisher(bus, topic, msg_type)

        def destroy_node(self):
            shutdown.set()

    rclpy.node = types.ModuleType("rclpy.node")
    rclpy.node.Node = Node

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs.msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs.msg.JointState = _JointState

    modules = [
        ("rclpy", rclpy),
        ("rclpy.node", rclpy.node),
        ("sensor_msgs", sensor_msgs),
        ("sensor_msgs.msg", sensor_msgs.msg),
    ]
    if with_arx_msgs:
        arx = types.ModuleType("arx5_arm_msg")
        arx.msg = types.ModuleType("arx5_arm_msg.msg")
        arx.msg.RobotStatus = _ArxRobotStatus
        modules += [("arx5_arm_msg", arx), ("arx5_arm_msg.msg", arx.msg)]
    else:
        # Ensure a previously-imported fake doesn't leak into the fallback test.
        monkeypatch.delitem(sys.modules, "arx5_arm_msg", raising=False)
        monkeypatch.delitem(sys.modules, "arx5_arm_msg.msg", raising=False)

    for name, module in modules:
        monkeypatch.setitem(sys.modules, name, module)
    return bus, shutdown


def _camera_image(rng, h=6, w=8, encoding="bgr8"):
    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    wire = rgb[..., ::-1] if encoding == "bgr8" else rgb
    return rgb, _Image(height=h, width=w, encoding=encoding, data=np.ascontiguousarray(wire).tobytes())


def _joint_state(position):
    msg = _JointState()
    msg.name = [f"joint_{i}" for i in range(len(position))]
    msg.position = [float(x) for x in position]
    return msg


# --------------------------------------------------------------------------------------
# ROS1 / Agilex Piper
# --------------------------------------------------------------------------------------


def test_ros1_replay_observation_contract(monkeypatch):
    """Replay the Agilex topic stream (3 bgr8 cameras + 2 puppet JointStates)
    and check the assembled observation: CHW RGB frames under the policy camera
    names, state = [left 7, right 7]."""
    bus = _install_fake_ros1(monkeypatch)
    rr = _load_ros_robot("ros_contract_r1_obs")
    robot = rr.Ros1Robot()

    rng = np.random.default_rng(0)
    expected = {}
    for cam, topic in rr._CAMERA_TOPICS.items():
        expected[cam], msg = _camera_image(rng)
        bus.deliver(topic, msg)
    left = rng.uniform(-1, 1, 7)
    right = rng.uniform(-1, 1, 7)
    bus.deliver("/puppet/joint_left", _joint_state(left))
    bus.deliver("/puppet/joint_right", _joint_state(right))

    assert robot.wait_until_ready(timeout=0.1)
    obs = robot.get_observation()
    assert set(obs["images"]) == {"top_head", "hand_left", "hand_right"}
    for cam, rgb in expected.items():
        np.testing.assert_array_equal(obs["images"][cam], rgb.transpose(2, 0, 1))
    np.testing.assert_allclose(obs["state"], np.concatenate([left, right]), atol=1e-6)
    assert obs["state"].dtype == np.float32

    # A later frame replaces the old one (latest-wins, like the reference deques).
    new_rgb, msg = _camera_image(rng)
    bus.deliver(rr._CAMERA_TOPICS["top_head"], msg)
    np.testing.assert_array_equal(robot.get_observation()["images"]["top_head"], new_rgb.transpose(2, 0, 1))


def test_ros1_publish_action_message_layout(monkeypatch):
    """publish_action must emit the exact JointState layout the Piper puppet
    nodes consume: 7 named joints per arm, position split left|right, zeroed
    velocity/effort, stamped header."""
    bus = _install_fake_ros1(monkeypatch)
    rr = _load_ros_robot("ros_contract_r1_pub")
    robot = rr.Ros1Robot()

    action = np.arange(14, dtype=np.float64) / 10.0
    robot.publish_action(action)

    for side, topic in enumerate(["/master/joint_left", "/master/joint_right"]):
        msgs = bus.on(topic)
        assert len(msgs) == 1, f"expected exactly one command on {topic}"
        msg = msgs[0]
        assert isinstance(msg, _JointState)
        assert msg.name == [f"joint_{i}" for i in range(7)]
        np.testing.assert_allclose(msg.position, action[side * 7 : side * 7 + 7])
        assert msg.velocity == [0.0] * 7
        assert msg.effort == [0.0] * 7
        assert msg.header.stamp is not None


def test_ros1_master_arm_bus_contract(monkeypatch):
    """DAgger teach-topic surface: Bool/String/Int32 flags on /teach/*, JointState
    master commands on /master_controled/joint_*, slave readback from the puppet
    stream (reference collector publishers, agilex_openpi_dagger_collect.py:1950-1957)."""
    bus = _install_fake_ros1(monkeypatch)
    rr = _load_ros_robot("ros_contract_r1_bus")
    robot = rr.Ros1Robot()
    arm_bus = rr.Ros1MasterArmBus(robot)

    arm_bus.enable_masters(True)
    for topic in ["/teach/master_enable_left", "/teach/master_enable_right"]:
        (msg,) = bus.on(topic)
        assert msg.data is True

    arm_bus.set_master_config("teach_mode")
    for topic in ["/teach/master_config_left", "/teach/master_config_right"]:
        (msg,) = bus.on(topic)
        assert msg.data == "teach_mode"

    arm_bus.set_teach_mode(2)
    for topic in ["/teach/teach_mode_left", "/teach/teach_mode_right"]:
        (msg,) = bus.on(topic)
        assert msg.data == 2

    left_cmd, right_cmd = np.full(7, 0.25), np.full(7, -0.5)
    arm_bus.command_master_joints(left_cmd, right_cmd)
    for topic, cmd in [("/master_controled/joint_left", left_cmd), ("/master_controled/joint_right", right_cmd)]:
        (msg,) = bus.on(topic)
        assert isinstance(msg, _JointState)
        assert msg.name == [f"joint_{i}" for i in range(7)]
        np.testing.assert_allclose(msg.position, cmd)

    assert arm_bus.slave_positions() is None  # nothing replayed yet
    bus.deliver("/puppet/joint_left", _joint_state(np.ones(7)))
    bus.deliver("/puppet/joint_right", _joint_state(2 * np.ones(7)))
    slave_left, slave_right = arm_bus.slave_positions()
    np.testing.assert_allclose(slave_left, np.ones(7))
    np.testing.assert_allclose(slave_right, 2 * np.ones(7))


# --------------------------------------------------------------------------------------
# ROS2 / ARX X5
# --------------------------------------------------------------------------------------


def test_ros2_arx_robot_status_contract(monkeypatch):
    """With the ARX message package present: joint state is read from
    RobotStatus.joint_pos and commands are published as RobotStatus whose
    joint_pos holds 7 floats per arm — and ONLY fields in the reference's
    RobotStatus.msg are touched (enforced by __slots__)."""
    bus, shutdown = _install_fake_ros2(monkeypatch, with_arx_msgs=True)
    rr = _load_ros_robot("ros_contract_r2_arx")
    robot = rr.Ros2Robot()
    try:
        left_status, right_status = _ArxRobotStatus(), _ArxRobotStatus()
        left_status.joint_pos = [float(x) for x in np.linspace(0, 0.6, 7)]
        right_status.joint_pos = [float(x) for x in np.linspace(-0.6, 0, 7)]
        bus.deliver("/arm_slave_l_status", left_status)
        bus.deliver("/arm_slave_r_status", right_status)

        assert robot.wait_until_ready(timeout=0.5)
        obs = robot.get_observation()
        np.testing.assert_allclose(obs["state"], left_status.joint_pos + right_status.joint_pos, atol=1e-6)

        action = np.arange(14, dtype=np.float64) / 7.0
        robot.publish_action(action)
        for side, topic in enumerate(["/arm_master_l_status", "/arm_master_r_status"]):
            (msg,) = bus.on(topic)
            assert isinstance(msg, _ArxRobotStatus)
            assert len(msg.joint_pos) == 7 and all(isinstance(x, float) for x in msg.joint_pos)
            np.testing.assert_allclose(msg.joint_pos, action[side * 7 : side * 7 + 7])
    finally:
        robot.close()
        assert shutdown.is_set()


def test_ros2_jointstate_fallback_contract(monkeypatch):
    """Without arx5_arm_msg the adapter must degrade to sensor_msgs/JointState
    (.position) on the same topics — matching the reference's fallback import."""
    bus, _ = _install_fake_ros2(monkeypatch, with_arx_msgs=False)
    rr = _load_ros_robot("ros_contract_r2_js")
    robot = rr.Ros2Robot()
    try:
        bus.deliver("/arm_slave_l_status", _joint_state(np.full(7, 0.1)))
        bus.deliver("/arm_slave_r_status", _joint_state(np.full(7, 0.2)))
        assert robot.wait_until_ready(timeout=0.5)
        np.testing.assert_allclose(
            robot.get_observation()["state"], np.concatenate([np.full(7, 0.1), np.full(7, 0.2)]), atol=1e-6
        )
        robot.publish_action(np.zeros(14))
        (msg,) = bus.on("/arm_master_l_status")
        assert isinstance(msg, _JointState)
        assert msg.position == [0.0] * 7
    finally:
        robot.close()


def test_ros2_smooth_return_to_zero_schedule(monkeypatch):
    """The return-to-zero sequence the reference runs before releasing control
    (arx_openpi_inference_rtc.py:575-597): a half-cosine ramp from the current
    pose to zero-with-grippers-at-3.0, then one final all-zero command with the
    grippers opened to 5.0."""
    bus, _ = _install_fake_ros2(monkeypatch, with_arx_msgs=True)
    rr = _load_ros_robot("ros_contract_r2_ramp")
    robot = rr.Ros2Robot()
    try:
        start = np.linspace(-0.5, 0.5, 7)
        left_status, right_status = _ArxRobotStatus(), _ArxRobotStatus()
        left_status.joint_pos = list(start)
        right_status.joint_pos = list(-start)
        bus.deliver("/arm_slave_l_status", left_status)
        bus.deliver("/arm_slave_r_status", right_status)

        assert robot.smooth_return_to_zero(duration=0.06, hz=50.0)
        cmds = np.array([m.joint_pos for m in bus.on("/arm_master_l_status")])
        assert cmds.shape == (int(0.06 * 50) + 2, 7)  # ramp steps + final open command
        np.testing.assert_allclose(cmds[0], start, atol=1e-9)  # starts at current pose
        np.testing.assert_allclose(cmds[-2][:6], 0.0, atol=1e-9)  # ramp ends at zero pose...
        assert cmds[-2][6] == pytest.approx(rr._ARX_ZERO_POSE_GRIP)  # ...gripper held at 3.0
        np.testing.assert_allclose(cmds[-1][:6], 0.0, atol=1e-9)
        assert cmds[-1][6] == pytest.approx(rr._ARX_OPEN_GRIP)  # final open release
    finally:
        robot.close()


def test_arx_robot_status_fields_match_reference_msg():
    """Keep the fake in sync with the reference's RobotStatus.msg definition."""
    msg_path = pathlib.Path("/root/reference/train_deploy_alignment/dagger/arx/X5_ws/src/arxmsgros2/arx5_arm_msg/msg/RobotStatus.msg")
    if not msg_path.exists():
        pytest.skip("reference tree not available")
    fields = [line.split()[1] for line in msg_path.read_text().splitlines() if line.strip()]
    assert set(fields) == set(_ArxRobotStatus.__slots__)
