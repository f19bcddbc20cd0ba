"""Deployment library: smoothing/ensembling buffers, RTC alignment, DAgger collector."""

import numpy as np
import pytest

from kai0_tpu.deploy import buffers as _buffers
from kai0_tpu.deploy import dagger as _dagger
from kai0_tpu.deploy.rtc_client import RTCClient


def chunk(start, n=10, dim=3):
    """Chunk whose rows are start, start+1, ..."""
    return np.arange(start, start + n, dtype=float)[:, None].repeat(dim, 1)


class TestStreamActionBuffer:
    def test_first_chunk_passthrough(self):
        buf = _buffers.StreamActionBuffer()
        buf.integrate_new_chunk(chunk(0), max_k=5)
        assert len(buf) == 10
        assert np.allclose(buf.pop_next_action(), 0.0)
        assert np.allclose(buf.pop_next_action(), 1.0)

    def test_latency_trim(self):
        buf = _buffers.StreamActionBuffer()
        buf.integrate_new_chunk(chunk(0), max_k=5)
        for _ in range(3):
            buf.pop_next_action()
        # 3 steps executed during inference: new chunk trimmed by min(k=3, max_k=5)=3.
        buf.integrate_new_chunk(chunk(100), max_k=5, min_m=2)
        first = buf.pop_next_action()
        # Crossfade starts at 100% old: first action equals the old chunk's value (3).
        assert np.allclose(first, 3.0)
        # Fade ends at 100% new: drain the overlap, then pure new values.
        vals = [buf.pop_next_action()[0] for _ in range(len(buf))]
        assert vals[-1] == 109.0  # tail of chunk(100) passes through unchanged

    def test_raw_mode_skips_smoothing(self):
        buf = _buffers.StreamActionBuffer(smooth_method="raw")
        buf.integrate_new_chunk(chunk(0), max_k=5)
        buf.pop_next_action()
        buf.integrate_new_chunk(chunk(100), max_k=5)
        assert np.allclose(buf.pop_next_action(), 101.0)  # trimmed by k=1, no fade

    def test_stale_chunk_dropped(self):
        buf = _buffers.StreamActionBuffer()
        buf.integrate_new_chunk(chunk(0, n=4), max_k=10)
        for _ in range(4):
            buf.pop_next_action()
        # k=4 >= len(new chunk): chunk is entirely stale, ignored.
        buf.integrate_new_chunk(chunk(100, n=4), max_k=10)
        assert not buf.has_any()

    def test_bridge_from_last_action(self):
        buf = _buffers.StreamActionBuffer()
        buf.integrate_new_chunk(chunk(0, n=2), max_k=0)
        buf.pop_next_action()
        buf.pop_next_action()  # drains; last_action = 1.0
        buf.integrate_new_chunk(chunk(100, n=6), max_k=0, min_m=4)
        # Crossfade anchored at the last executed action (1.0), not a jump to 100.
        assert buf.pop_next_action()[0] == pytest.approx(1.0)


class TestTemporalEnsembling:
    def test_single_chunk_identity(self):
        buf = _buffers.TemporalEnsemblingBuffer(chunk_size=5)
        buf.add_chunk(chunk(0, n=5))
        assert np.allclose(buf.step(), 0.0)
        assert np.allclose(buf.step(), 1.0)

    def test_exponential_aggregation(self):
        buf = _buffers.TemporalEnsemblingBuffer(chunk_size=5, exp_weight_m=0.0)
        buf.add_chunk(np.zeros((5, 3)), start_timestep=0)
        buf.add_chunk(np.ones((5, 3)), start_timestep=0)
        # m=0 → uniform weights → plain mean.
        assert np.allclose(buf.get_action(0), 0.5)

        buf2 = _buffers.TemporalEnsemblingBuffer(chunk_size=5, exp_weight_m=10.0)
        buf2.add_chunk(np.zeros((5, 3)), start_timestep=0)
        buf2.add_chunk(np.ones((5, 3)), start_timestep=0)
        # Large m → oldest chunk dominates.
        assert buf2.get_action(0)[0] < 0.01

    def test_fallback_to_last_action(self):
        buf = _buffers.TemporalEnsemblingBuffer(chunk_size=2)
        buf.add_chunk(chunk(0, n=2))
        buf.step()
        buf.step()
        # Cursor past predictions: falls back to the last aggregated action.
        assert np.allclose(buf.step(), 1.0)

    def test_cleanup(self):
        buf = _buffers.TemporalEnsemblingBuffer(chunk_size=3, cleanup_lag=2)
        buf.add_chunk(chunk(0, n=3), start_timestep=0)
        buf.current_t = 10
        buf.add_chunk(chunk(5, n=3), start_timestep=10)
        assert all(t >= 8 for t in buf._predictions)


def test_delay_estimator_median():
    est = _buffers.DelayEstimator(publish_rate=25.0)
    for rtt in (0.1, 0.3, 0.2):
        est.update(rtt)
    # median 0.2 s × 25 Hz = 5 steps.
    assert est.delay_steps == 5
    est.update(float("nan"))  # ignored
    assert est.delay_steps == 5


def test_rtc_align_chunks():
    prev = chunk(0, n=10, dim=2)
    nxt = chunk(100, n=10, dim=2)
    to_exec, shifted = _buffers.rtc_align_chunks(prev, nxt, delay_steps=3, execute_horizon=6)
    # First 3 from prev (committed during inference), next 3 from the new chunk.
    assert to_exec.shape == (6, 2)
    assert np.allclose(to_exec[:3, 0], [0, 1, 2])
    assert np.allclose(to_exec[3:, 0], [103, 104, 105])
    # New chunk shifted by execute_horizon, zero padded.
    assert shifted.shape == (10, 2)
    assert np.allclose(shifted[:4, 0], [106, 107, 108, 109])
    assert np.allclose(shifted[4:], 0)


class _FakePolicy:
    def __init__(self):
        self.calls = []

    def infer(self, payload):
        self.calls.append(payload)
        return {"actions": chunk(len(self.calls) * 100, n=10, dim=4)}


def test_rtc_client_rounds():
    policy = _FakePolicy()
    client = RTCClient(policy, action_dim=8, chunk_size=10, execute_horizon=4, publish_rate=10)
    obs = {"state": np.zeros(4)}

    out1 = client.infer_round(obs)
    assert out1.shape == (4, 4)
    assert np.allclose(out1[:, 0], [100, 101, 102, 103])
    # First round payload has no prev chunk; flags present.
    assert "prev_action_chunk" not in policy.calls[0]
    assert policy.calls[0]["enable_rtc"] is True

    out2 = client.infer_round(obs)
    # Second round payload carries the shifted prev chunk padded to action_dim.
    prev = np.asarray(policy.calls[1]["prev_action_chunk"])
    assert prev.shape == (10, 8)
    assert np.allclose(prev[0, :4], 104)  # shifted head of round-1 chunk
    assert np.allclose(prev[:, 4:], 0)  # padded dims
    assert out2.shape == (4, 4)


def test_dagger_collector_roundtrip(tmp_path):
    import h5py

    coll = _dagger.DAggerCollector(["top"], tmp_path, task_name="fold", fps=10)
    coll.start_collection()
    rng = np.random.default_rng(0)
    for i in range(5):
        coll.add_frame(
            {
                "qpos": np.full(14, i, dtype=np.float32),
                "images": {"top": rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)},
            },
            action=np.full(14, i + 0.5, dtype=np.float32),
            intervention=(i >= 3),
        )
    path = coll.save_episode()
    assert path.name == "episode_0.hdf5"
    with h5py.File(path) as f:
        assert f["observations/qpos"].shape == (5, 14)
        assert np.allclose(f["action"][2], 2.5)
        assert f["intervention"][:].tolist() == [False, False, False, True, True]
    assert (tmp_path / "fold" / "video" / "top" / "episode_0.mp4").exists()
    # Next episode index advances; a fresh collector resumes numbering.
    assert coll.episode_idx == 1
    assert _dagger.DAggerCollector(["top"], tmp_path, task_name="fold").episode_idx == 1


def test_dagger_state_machine():
    sm = _dagger.DaggerStateMachine()
    assert sm.mode == "idle"
    sm.on_key("enter")
    assert sm.mode == "infer" and not sm.intervening
    sm.on_key("d")
    assert sm.intervening
    sm.on_key(" ")
    assert sm.recording
    sm.on_key("s")
    assert sm.consume_save_request() and not sm.recording
    assert not sm.consume_save_request()  # one-shot
    sm.on_key("r")
    assert sm.mode == "infer"


# --------------------------------------------------------------------------------------
# Native (C++) buffer parity
# --------------------------------------------------------------------------------------


def _native_available():
    from kai0_tpu import native

    return native.load() is not None


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
class TestNativeBufferParity:
    def test_stream_buffer_matches_python(self):
        from kai0_tpu.deploy.native_buffers import NativeStreamActionBuffer

        rng = np.random.default_rng(0)
        py = _buffers.StreamActionBuffer()
        cc = NativeStreamActionBuffer()
        for round_i in range(5):
            chunk = rng.normal(size=(10, 4))
            for buf in (py, cc):
                buf.integrate_new_chunk(chunk, max_k=6, min_m=3)
            for _ in range(rng.integers(1, 8)):
                a_py, a_cc = py.pop_next_action(), cc.pop_next_action()
                if a_py is None:
                    assert a_cc is None
                else:
                    np.testing.assert_allclose(a_py, a_cc, atol=1e-12)
        assert len(py) == len(cc)

    def test_stream_buffer_raw_and_stale(self):
        from kai0_tpu.deploy.native_buffers import NativeStreamActionBuffer

        buf = NativeStreamActionBuffer(smooth_method="raw")
        buf.integrate_new_chunk(chunk(0, n=4), max_k=10)
        for _ in range(4):
            buf.pop_next_action()
        buf.integrate_new_chunk(chunk(100, n=4), max_k=10)  # fully stale → dropped
        assert not buf.has_any()

    def test_ensembling_matches_python(self):
        from kai0_tpu.deploy.native_buffers import NativeTemporalEnsemblingBuffer

        rng = np.random.default_rng(1)
        py = _buffers.TemporalEnsemblingBuffer(exp_weight_m=0.05)
        cc = NativeTemporalEnsemblingBuffer(exp_weight_m=0.05)
        for start in (0, 3, 6):
            c = rng.normal(size=(8, 3))
            py.add_chunk(c, start_timestep=start)
            cc.add_chunk(c, start_timestep=start)
        for _ in range(12):
            a_py, a_cc = py.step(), cc.step()
            if a_py is None:
                assert a_cc is None
            else:
                np.testing.assert_allclose(a_py, a_cc, atol=1e-12)

    def test_concurrent_producer_consumer(self):
        import threading

        from kai0_tpu.deploy.native_buffers import NativeStreamActionBuffer

        buf = NativeStreamActionBuffer()
        stop = threading.Event()
        popped = []

        def producer():
            rng = np.random.default_rng(2)
            for _ in range(50):
                buf.integrate_new_chunk(rng.normal(size=(20, 4)), max_k=10)

        def consumer():
            while not stop.is_set() or buf.has_any():
                a = buf.pop_next_action()
                if a is not None:
                    popped.append(a)

        t_prod = threading.Thread(target=producer)
        t_cons = threading.Thread(target=consumer)
        t_cons.start()
        t_prod.start()
        t_prod.join()
        stop.set()
        t_cons.join(timeout=10)
        assert popped  # no deadlock, actions flowed
        assert all(a.shape == (4,) for a in popped)


# ---------------------------------------------------------------------------
# Latency-compensated inference client driver loops (train_deploy_alignment)
# ---------------------------------------------------------------------------


def _load_inference_client():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "train_deploy_alignment/inference/inference_client.py"
    spec = importlib.util.spec_from_file_location("inference_client", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _ChunkPolicy:
    """Stub server: returns a deterministic [horizon, dim] chunk, counts calls."""

    def __init__(self, horizon=10, dim=14):
        self.calls = 0
        self.horizon, self.dim = horizon, dim

    def infer(self, obs):
        self.calls += 1
        base = np.full((self.horizon, self.dim), float(self.calls), dtype=np.float32)
        return {"actions": base}


@pytest.mark.parametrize("mode", ["sync", "smooth", "ensemble", "rtc"])
def test_inference_client_driver_loops(mode):
    ic = _load_inference_client()
    robot = ic.SimRobot()
    policy = _ChunkPolicy()
    kwargs = dict(policy=policy, robot=robot, prompt="p", publish_rate=500.0, max_steps=12)
    if mode == "sync":
        ic.run_sync(**kwargs)
    elif mode == "smooth":
        ic.run_smooth(**kwargs, infer_rate=100.0)
    elif mode == "ensemble":
        ic.run_ensemble(**kwargs, infer_rate=100.0)
    else:
        ic.run_rtc(**kwargs, execute_horizon=5)
    assert policy.calls >= 1
    # the robot executed exactly max_steps actions
    assert np.all(np.isfinite(robot._state))


def test_kalman_filter_matches_reference_scalar_semantics():
    """Vectorized KalmanFilter == the reference's per-dim scalar SimpleKalmanFilter
    (agilex_openpi_dagger_collect.py:478-498), reimplemented here as the spec."""
    from kai0_tpu.deploy.dagger import KalmanFilter

    class _ScalarRef:
        def __init__(self, pv=1e-6, mv=1e-7):
            self.pv, self.mv = pv, mv
            self.est, self.err = None, 1.0

        def update(self, m):
            if self.est is None:
                self.est = m
                return m
            g = self.err / (self.err + self.mv)
            self.est = self.est + g * (m - self.est)
            self.err = (1 - g) * self.err + abs(self.est - m) * self.pv
            return self.est

    rng = np.random.default_rng(0)
    dim = 14
    kf = KalmanFilter()
    scalars = [_ScalarRef() for _ in range(dim)]
    for _ in range(25):
        raw = rng.normal(size=dim)
        got = kf.update(raw)
        want = np.array([s.update(float(raw[i])) for i, s in enumerate(scalars)])
        np.testing.assert_allclose(got, want, rtol=1e-12)
    # Smoothing actually smooths: variance of filtered steps < raw steps.
    kf.reset()
    raw_seq = rng.normal(size=(200, dim)) * 0.01 + np.linspace(0, 1, 200)[:, None]
    out_seq = np.stack([kf.update(x) for x in raw_seq])
    assert np.var(np.diff(out_seq, axis=0)) < np.var(np.diff(raw_seq, axis=0))


def test_master_arm_switcher_choreography():
    """enter_dagger_mode: enable -> safe pose hold -> slave pose hold -> config ->
    teach mode, with the reference's 3x republish cadence
    (agilex_openpi_dagger_collect.py:1769-1782, 1592-1679)."""
    from kai0_tpu.deploy.dagger import SAFE_MASTER_POSE, MasterArmBus, MasterArmSwitcher

    events = []

    class _Bus(MasterArmBus):
        def enable_masters(self, enabled):
            events.append(("enable", enabled))

        def set_master_config(self, config):
            events.append(("config", config))

        def set_teach_mode(self, mode):
            events.append(("teach", mode))

        def command_master_joints(self, left, right):
            events.append(("joints", tuple(np.round(left, 3)), tuple(np.round(right, 3))))

        def slave_positions(self):
            return [0.1] * 7, [0.2] * 7

    sw = MasterArmSwitcher(_Bus(), move_duration=0.3, hold_hz=10.0, sleep=lambda _: None)
    assert sw.enter_dagger_mode()
    assert sw.in_teach_mode

    kinds = [e[0] for e in events]
    assert kinds[:3] == ["enable"] * 3  # 3x republish
    joint_events = [e for e in events if e[0] == "joints"]
    assert len(joint_events) == 6  # 0.3s * 10Hz per pose, two poses
    safe = tuple(np.round(SAFE_MASTER_POSE, 3))
    assert joint_events[0][1] == safe and joint_events[0][2] == safe
    assert joint_events[-1][1] == tuple([0.1] * 7) and joint_events[-1][2] == tuple([0.2] * 7)
    # config precedes teach mode; both repeated 3x
    assert [e for e in events if e[0] == "config"] == [("config", "master")] * 3
    assert [e for e in events if e[0] == "teach"] == [("teach", 1)] * 3
    assert kinds.index("config") < kinds.index("teach")

    events.clear()
    sw.exit_dagger_mode()
    assert not sw.in_teach_mode
    assert [e for e in events if e[0] == "teach"] == [("teach", 0)] * 3
    assert events[-1] == ("enable", False)


def test_master_arm_switcher_aborts_without_slave_data():
    from kai0_tpu.deploy.dagger import MasterArmBus, MasterArmSwitcher

    class _Bus(MasterArmBus):
        def enable_masters(self, enabled): pass
        def set_master_config(self, config): pass
        def set_teach_mode(self, mode): pass
        def command_master_joints(self, left, right): pass
        def slave_positions(self): return None

    sw = MasterArmSwitcher(_Bus(), move_duration=0.1, sleep=lambda _: None)
    assert not sw.enter_dagger_mode()
    assert not sw.in_teach_mode


def test_replay_hdf5_robot_drives_client_loop(tmp_path):
    """A recorded episode (DAggerCollector output, incl. mp4s) replays as the
    robot: the full client loop runs against real recorded data and the
    published actions can be scored against the recorded /action track —
    the hardware-free stand-in for the reference's ROS nodes."""
    from kai0_tpu.deploy.dagger import DAggerCollector

    cams = ["top_head", "hand_left", "hand_right"]
    col = DAggerCollector(cams, tmp_path, fps=10)
    col.start_collection()
    rng = np.random.default_rng(1)
    T, D = 20, 14
    qpos = rng.uniform(-1, 1, (T, D)).astype(np.float32)
    for t in range(T):
        col.add_frame(
            {
                "qpos": qpos[t],
                "images": {c: rng.integers(0, 255, (48, 64, 3)).astype(np.uint8) for c in cams},
            },
            action=qpos[t] + 0.01,
        )
    path = col.save_episode(export_video=True)
    assert path is not None

    ic = _load_inference_client()
    robot = ic.ReplayHDF5Robot(path, cameras=tuple(cams))
    obs = robot.get_observation()
    assert set(obs["images"]) == set(cams)
    assert obs["images"]["top_head"].shape[0] == 3  # CHW like the ROS clients
    np.testing.assert_allclose(obs["state"], qpos[0])

    policy = _ChunkPolicy(horizon=10, dim=D)
    ic.run_sync(policy=policy, robot=robot, prompt="p", publish_rate=500.0, max_steps=15)
    assert len(robot.published) == 15
    err = robot.tracking_error()
    assert err is not None and err.shape == (15, D)
    # observation advances with published steps (replay cursor moves)
    assert not np.allclose(robot.get_observation()["state"], qpos[0])


def test_ros_robot_module_surface():
    """ROS adapter: image conversion + topic parity with the reference nodes;
    constructing the robot without rospy must fail with a clear message."""
    import importlib.util
    import pathlib
    import types

    path = pathlib.Path(__file__).parent.parent / "train_deploy_alignment/inference/ros_robot.py"
    spec = importlib.util.spec_from_file_location("ros_robot", path)
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)  # module import must not require rospy

    # bgr8 -> CHW RGB
    h, w = 4, 6
    rgb = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    msg = types.SimpleNamespace(data=rgb[..., ::-1].tobytes(), height=h, width=w, encoding="bgr8")
    out = rr._image_to_chw_rgb(msg)
    assert out.shape == (3, h, w)
    np.testing.assert_array_equal(out, rgb.transpose(2, 0, 1))

    # Topic surface matches the reference defaults (rtc node :1298-1380, collector :1950-1957).
    assert rr._CAMERA_TOPICS["top_head"] == "/camera_f/color/image_raw"
    assert rr._PUPPET_TOPICS == ("/puppet/joint_left", "/puppet/joint_right")
    assert rr._CMD_TOPICS == ("/master/joint_left", "/master/joint_right")

    try:
        import rospy  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="ROS1"):
            rr.Ros1Robot()


def test_ros2_robot_module_surface():
    """ARX/ROS2 adapter: topic parity with the reference node, the cosine
    return-to-zero ramp, and a clear failure without rclpy."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "train_deploy_alignment/inference/ros_robot.py"
    spec = importlib.util.spec_from_file_location("ros_robot", path)
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)  # module import must not require rclpy

    # Topic surface matches the reference node defaults (arx rtc node :846-849).
    assert rr._ARX_STATE_TOPICS == ("/arm_slave_l_status", "/arm_slave_r_status")
    assert rr._ARX_CMD_TOPICS == ("/arm_master_l_status", "/arm_master_r_status")

    # Half-cosine ramp: endpoint-exact, monotone blend, reference 50 Hz step count.
    current = np.linspace(-1.0, 1.0, 14)
    target = np.zeros(14)
    target[6] = target[13] = rr._ARX_ZERO_POSE_GRIP
    traj = rr.cosine_ramp(current, target, duration=3.0, hz=50.0)
    assert traj.shape == (151, 14)  # int(3.0 * 50) + 1 like the reference loop
    np.testing.assert_allclose(traj[0], current, atol=1e-12)
    np.testing.assert_allclose(traj[-1], target, atol=1e-12)
    # each coordinate moves monotonically from current to target
    diffs = np.diff(traj, axis=0)
    signs = np.sign(target - current)
    assert np.all(diffs * signs[None, :] >= -1e-12)
    # midpoint is the exact average (cosine symmetry)
    np.testing.assert_allclose(traj[75], (current + target) / 2, atol=1e-9)

    try:
        import rclpy  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="ROS2"):
            rr.Ros2Robot()
