"""Latency-compensated inference client (sync / smoothing / ensembling / RTC).

Robot-agnostic equivalent of the reference's four per-robot ROS clients
(`agilex_inference_openpi_{sync,temporal_smoothing,temporal_ensembling,rtc}.py`,
`arx_openpi_inference_*.py`): one driver loop over a pluggable `RobotInterface`,
with the algorithm cores imported from `kai0_tpu.deploy`. The reference's ROS
subscribers/publishers map onto `RobotInterface.get_observation`/`publish_action`;
see README.md for the ROS1/ROS2 integration notes.

    python inference_client.py --host <gpu-host> --port 8000 --mode rtc \
        --prompt "Flatten and fold the cloth." --publish-rate 25 --sim

Modes:
  sync       blocking infer → execute the whole chunk (reference *_sync.py)
  smooth     async infer + StreamActionBuffer crossfade (reference *_temporal_smoothing.py)
  ensemble   async infer + ACT-style TemporalEnsemblingBuffer (reference *_temporal_ensembling.py)
  rtc        async infer + server-side RTC guidance + chunk alignment (reference *_rtc.py)
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import threading
import time
from typing import Protocol

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent.parent / "packages" / "kai0-client" / "src")
)

from kai0_tpu.deploy import make_ensembling_buffer, make_stream_buffer
from kai0_tpu.deploy.rtc_client import RTCClient


class RobotInterface(Protocol):
    """Hardware adapter: ROS topics, CAN bus, or simulation."""

    def get_observation(self) -> dict:
        """Returns {"images": {cam: uint8 CHW/HWC}, "state": float32[D]}."""
        ...

    def publish_action(self, action: np.ndarray) -> None: ...


class SimRobot:
    """Loopback robot for smoke tests: random cameras, echoes the last action."""

    def __init__(self, state_dim: int = 14, cameras=("top_head", "hand_left", "hand_right")):
        self._state = np.zeros(state_dim, dtype=np.float32)
        self._cameras = cameras
        self._rng = np.random.default_rng(0)

    def get_observation(self) -> dict:
        return {
            "images": {
                cam: self._rng.integers(0, 255, (3, 224, 224), dtype=np.uint8)
                for cam in self._cameras
            },
            "state": self._state.copy(),
        }

    def publish_action(self, action: np.ndarray) -> None:
        self._state = np.asarray(action, dtype=np.float32)[: len(self._state)]


class KalmanSmoothedRobot:
    """Wrap a RobotInterface so published actions are Kalman-smoothed.

    Reference ``--use_kalman_filter`` (agilex_openpi_dagger_collect.py:849-851):
    the raw policy action is filtered per dim before interpolation/publish.
    """

    def __init__(self, robot):
        from kai0_tpu.deploy.dagger import KalmanFilter

        self._robot = robot
        self._kf = KalmanFilter()

    def get_observation(self) -> dict:
        return self._robot.get_observation()

    def publish_action(self, action: np.ndarray) -> None:
        self._robot.publish_action(np.asarray(self._kf.update(action), dtype=np.float32))


def run_sync(policy, robot, prompt: str, publish_rate: float, max_steps: int):
    """Blocking infer → execute loop (reference agilex_inference_openpi_sync.py)."""
    steps = 0
    while steps < max_steps:
        obs = robot.get_observation()
        obs["prompt"] = prompt
        actions = np.asarray(policy.infer(obs)["actions"])
        for action in actions:
            robot.publish_action(action)
            steps += 1
            if steps >= max_steps:
                break
            time.sleep(1.0 / publish_rate)


def run_smooth(policy, robot, prompt: str, publish_rate: float, infer_rate: float,
               max_steps: int, max_k: int = 10, min_m: int = 8):
    """Async inference thread + crossfade buffer (reference *_temporal_smoothing.py)."""
    buf = make_stream_buffer()  # C++ core when available (GIL-free publish loop)
    stop = threading.Event()

    def infer_loop():
        while not stop.is_set():
            obs = robot.get_observation()
            obs["prompt"] = prompt
            actions = np.asarray(policy.infer(obs)["actions"])
            buf.integrate_new_chunk(actions, max_k=max_k, min_m=min_m)
            time.sleep(1.0 / infer_rate)

    t = threading.Thread(target=infer_loop, daemon=True)
    t.start()
    steps = 0
    try:
        while steps < max_steps:
            action = buf.pop_next_action()
            if action is not None:
                robot.publish_action(action)
                steps += 1
            time.sleep(1.0 / publish_rate)
    finally:
        stop.set()
        t.join(timeout=5)


def run_ensemble(policy, robot, prompt: str, publish_rate: float, infer_rate: float,
                 max_steps: int, exp_weight_m: float = 0.01):
    """Async inference + ACT-style ensembling (reference *_temporal_ensembling.py)."""
    buf = make_ensembling_buffer(exp_weight_m=exp_weight_m)
    stop = threading.Event()

    def infer_loop():
        while not stop.is_set():
            obs = robot.get_observation()
            obs["prompt"] = prompt
            actions = np.asarray(policy.infer(obs)["actions"])
            buf.add_chunk(actions)
            time.sleep(1.0 / infer_rate)

    t = threading.Thread(target=infer_loop, daemon=True)
    t.start()
    steps = 0
    try:
        while steps < max_steps:
            action = buf.step()
            if action is not None:
                robot.publish_action(action)
                steps += 1
            time.sleep(1.0 / publish_rate)
    finally:
        stop.set()
        t.join(timeout=5)


def run_rtc(policy, robot, prompt: str, publish_rate: float, max_steps: int,
            execute_horizon: int = 25, max_guidance_weight: float = 5.0):
    """RTC rounds: guided inference + aligned execution (reference *_rtc.py)."""
    client = RTCClient(
        policy,
        execute_horizon=execute_horizon,
        publish_rate=publish_rate,
        max_guidance_weight=max_guidance_weight,
    )
    steps = 0
    while steps < max_steps:
        obs = robot.get_observation()
        obs["prompt"] = prompt
        to_execute = client.infer_round(obs)
        for action in to_execute:
            robot.publish_action(action)
            steps += 1
            if steps >= max_steps:
                break
            time.sleep(1.0 / publish_rate)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--mode", choices=["sync", "smooth", "ensemble", "rtc"], default="smooth")
    parser.add_argument("--prompt", default="fold the cloth")
    parser.add_argument("--publish-rate", type=float, default=25.0)
    parser.add_argument("--infer-rate", type=float, default=4.0)
    parser.add_argument("--max-steps", type=int, default=10_000)
    parser.add_argument("--execute-horizon", type=int, default=25)
    parser.add_argument("--max-guidance-weight", type=float, default=5.0)
    parser.add_argument("--sim", action="store_true", help="Use the loopback SimRobot")
    parser.add_argument("--use-kalman-filter", action="store_true",
                        help="Kalman-smooth published actions (reference --use_kalman_filter)")
    args = parser.parse_args()

    from kai0_client.websocket_client_policy import WebsocketClientPolicy

    policy = WebsocketClientPolicy(host=args.host, port=args.port)
    if not args.sim:
        raise SystemExit(
            "No hardware RobotInterface configured. Implement RobotInterface for your "
            "robot (ROS topics → get_observation/publish_action) or pass --sim."
        )
    robot = SimRobot()
    if args.use_kalman_filter:
        robot = KalmanSmoothedRobot(robot)

    if args.mode == "sync":
        run_sync(policy, robot, args.prompt, args.publish_rate, args.max_steps)
    elif args.mode == "smooth":
        run_smooth(policy, robot, args.prompt, args.publish_rate, args.infer_rate, args.max_steps)
    elif args.mode == "ensemble":
        run_ensemble(policy, robot, args.prompt, args.publish_rate, args.infer_rate, args.max_steps)
    else:
        run_rtc(policy, robot, args.prompt, args.publish_rate, args.max_steps,
                args.execute_horizon, args.max_guidance_weight)


if __name__ == "__main__":
    main()
