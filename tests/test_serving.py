"""Wire protocol: msgpack codec, action chunk broker, live server↔client roundtrip."""

import threading
import time

import numpy as np
import pytest

import kai0_tpu.serving  # noqa: F401  (adds in-repo client package to sys.path)
from kai0_client import msgpack_numpy
from kai0_client.action_chunk_broker import ActionChunkBroker
from kai0_client.base_policy import BasePolicy
from kai0_client.websocket_client_policy import WebsocketClientPolicy
from kai0_tpu.serving.websocket_policy_server import WebsocketPolicyServer


def test_msgpack_roundtrip():
    data = {
        "arr_f32": np.random.rand(3, 4).astype(np.float32),
        "arr_u8": np.random.randint(0, 255, (8, 8, 3), np.uint8),
        "scalar": np.float64(3.5),
        "nested": {"x": np.arange(5)},
        "text": "hello",
        "num": 7,
    }
    packed = msgpack_numpy.packb(data)
    out = msgpack_numpy.unpackb(packed)
    np.testing.assert_array_equal(out["arr_f32"], data["arr_f32"])
    np.testing.assert_array_equal(out["arr_u8"], data["arr_u8"])
    np.testing.assert_array_equal(out["nested"]["x"], data["nested"]["x"])
    assert out["scalar"] == data["scalar"]
    assert out["text"] == "hello"
    assert out["num"] == 7


def test_msgpack_rejects_object_dtype():
    with pytest.raises(ValueError, match="Unsupported dtype"):
        msgpack_numpy.packb({"bad": np.array([object()])})


class _CountingPolicy(BasePolicy):
    def __init__(self, horizon: int = 4):
        self.calls = 0
        self.horizon = horizon

    def infer(self, obs: dict) -> dict:
        self.calls += 1
        return {"actions": np.arange(self.horizon, dtype=np.float32)[:, None] + 100 * self.calls}

    def reset(self) -> None:
        self.calls = 0


def test_action_chunk_broker():
    inner = _CountingPolicy(horizon=4)
    broker = ActionChunkBroker(inner, action_horizon=4)
    steps = [broker.infer({})["actions"] for _ in range(8)]
    assert inner.calls == 2  # one infer per exhausted chunk
    np.testing.assert_allclose([s[0] for s in steps], [100, 101, 102, 103, 200, 201, 202, 203])


class _EchoPolicy(BasePolicy):
    def infer(self, obs: dict) -> dict:
        return {"actions": np.asarray(obs["state"]) * 2.0}

    def reset(self) -> None:
        pass


def test_websocket_server_client_roundtrip():
    server = WebsocketPolicyServer(_EchoPolicy(), host="127.0.0.1", port=18473, metadata={"who": "kai0_tpu"})

    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    time.sleep(0.3)

    client = WebsocketClientPolicy(host="127.0.0.1", port=18473, retry_interval_s=0.2)
    assert client.get_server_metadata() == {"who": "kai0_tpu"}

    state = np.arange(6, dtype=np.float32)
    result = client.infer({"state": state})
    np.testing.assert_allclose(result["actions"], state * 2.0)
    assert "infer_ms" in result["server_timing"]

    # Second call reports the previous round-trip time.
    result2 = client.infer({"state": state})
    assert "prev_total_ms" in result2["server_timing"]
    client.close()


# ---------------------------------------------------------------------------
# Request coalescing (kai0_tpu/serving/batching.py)
# ---------------------------------------------------------------------------


class _BatchRecordingPolicy:
    """Stub policy that records how requests were dispatched."""

    def __init__(self, delay_s: float = 0.0):
        self.delay_s = delay_s
        self.solo_calls = 0
        self.batch_calls = []  # (n, pad_to)
        self.metadata = {"stub": True}
        self.model_config = None

    def infer(self, obs: dict) -> dict:
        time.sleep(self.delay_s)
        self.solo_calls += 1
        return {"actions": np.asarray(obs["state"]) * 2.0}

    def infer_batch(self, obs_list, *, noise=None, pad_to=None) -> list[dict]:
        time.sleep(self.delay_s)
        self.batch_calls.append((len(obs_list), pad_to))
        return [{"actions": np.asarray(obs["state"]) * 2.0} for obs in obs_list]

    def reset(self) -> None:
        pass

    def warmup(self, example=None) -> float:
        return 0.0


def test_batching_policy_coalesces_concurrent_requests():
    from kai0_tpu.serving.batching import BatchingPolicy

    inner = _BatchRecordingPolicy(delay_s=0.05)
    batcher = BatchingPolicy(inner, max_batch=4, wait_ms=50)
    try:
        states = [np.full(3, i, np.float32) for i in range(6)]
        results = [None] * 6

        def call(i):
            results[i] = batcher.infer({"state": states[i]})

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in range(6):
            np.testing.assert_allclose(results[i]["actions"], states[i] * 2.0)
        # 6 concurrent requests with a 50 ms window must coalesce: at least one
        # multi-request dispatch, and nothing exceeding max_batch.
        assert inner.batch_calls, f"no batched dispatch (sizes: {batcher.batch_sizes})"
        assert all(n <= 4 for n in batcher.batch_sizes)
        assert sum(batcher.batch_sizes) == 6
        # pad_to is the power-of-two bucket >= n.
        for n, pad_to in inner.batch_calls:
            assert pad_to >= n and (pad_to & (pad_to - 1)) == 0
    finally:
        batcher.close()


def test_batching_policy_rtc_bypass_and_errors():
    from kai0_tpu.serving.batching import BatchingPolicy

    inner = _BatchRecordingPolicy()
    batcher = BatchingPolicy(inner, max_batch=4)
    try:
        out = batcher.infer({"state": np.ones(3, np.float32), "prev_action_chunk": np.zeros((5, 3))})
        np.testing.assert_allclose(out["actions"], 2.0)
        assert inner.solo_calls == 1 and not batcher.batch_sizes  # bypassed the queue

        # Errors inside a dispatch propagate to the waiting caller.
        def boom(obs):
            raise RuntimeError("boom")

        inner.infer = boom
        with pytest.raises(RuntimeError, match="boom"):
            batcher.infer({"state": np.ones(3, np.float32)})
    finally:
        batcher.close()


def test_websocket_server_with_batching_policy():
    """Concurrent clients through the real server get correct per-client actions."""
    from kai0_tpu.serving.batching import BatchingPolicy

    inner = _BatchRecordingPolicy(delay_s=0.02)
    batcher = BatchingPolicy(inner, max_batch=4, wait_ms=20)
    server = WebsocketPolicyServer(batcher, host="127.0.0.1", port=18474, metadata={"stub": True})
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    time.sleep(0.3)

    results = [None] * 4

    def call(i):
        client = WebsocketClientPolicy(host="127.0.0.1", port=18474, retry_interval_s=0.2)
        for _ in range(3):
            results[i] = client.infer({"state": np.full(3, i, np.float32)})
        client.close()

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        np.testing.assert_allclose(results[i]["actions"], np.full(3, i) * 2.0)
    batcher.close()


# ---------------------------------------------------------------------------
# Client runtime loop (kai0_client/runtime): episode pacing + subscriber protocol
# ---------------------------------------------------------------------------


def test_runtime_episode_loop():
    from kai0_client.runtime.agents.policy_agent import PolicyAgent
    from kai0_client.runtime.environment import Environment
    from kai0_client.runtime.runtime import Runtime
    from kai0_client.runtime.subscriber import Subscriber

    class FakeEnv(Environment):
        def __init__(self):
            self.resets = 0
            self.episode_steps = 0
            self.total_steps = 0

        def reset(self):
            self.resets += 1
            self.episode_steps = 0

        def is_episode_complete(self):
            return self.episode_steps >= 5  # env-driven termination

        def get_observation(self):
            return {"state": np.zeros(3), "step": self.episode_steps}

        def apply_action(self, action):
            self.episode_steps += 1
            self.total_steps += 1

    class Recorder(Subscriber):
        def __init__(self):
            self.events = []

        def on_episode_start(self):
            self.events.append("start")

        def on_step(self, observation, action):
            self.events.append(("step", observation["step"], action["actions"].shape))

        def on_episode_end(self):
            self.events.append("end")

    env = FakeEnv()
    rec = Recorder()
    agent = PolicyAgent(_CountingPolicy(horizon=4))
    Runtime(env, agent, [rec], num_episodes=2).run()

    assert env.resets == 2
    assert env.total_steps == 10
    assert rec.events[0] == "start"
    assert rec.events.count("start") == 2
    assert rec.events.count("end") == 2
    assert rec.events[1] == ("step", 0, (4, 1))


def test_runtime_max_episode_steps_and_pacing():
    from kai0_client.runtime.agents.policy_agent import PolicyAgent
    from kai0_client.runtime.environment import Environment
    from kai0_client.runtime.runtime import Runtime

    class EndlessEnv(Environment):
        def __init__(self):
            self.applied = 0

        def reset(self):
            pass

        def is_episode_complete(self):
            return False  # never ends on its own

        def get_observation(self):
            return {}

        def apply_action(self, action):
            self.applied += 1

    env = EndlessEnv()
    t0 = time.monotonic()
    Runtime(env, PolicyAgent(_CountingPolicy()), max_hz=100.0, max_episode_steps=7).run()
    elapsed = time.monotonic() - t0
    assert env.applied == 7
    # 7 steps at 100 Hz must take at least ~6 inter-step periods.
    assert elapsed >= 0.05
