"""π₀-RTC guided sampling and the advantage estimator head (dummy-size models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kai0_tpu.models import advantage as _advantage
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0_rtc as _pi0_rtc

_DUMMY = dict(
    paligemma_variant="dummy", action_expert_variant="dummy", vision_variant="mu/14", dtype="float32"
)


@pytest.fixture(scope="module")
def rtc_setup():
    config = _pi0_rtc.Pi0RTCConfig(action_horizon=8, action_dim=6, **_DUMMY)
    params = config.init_params(jax.random.key(0))
    return config, params


def test_prefix_weights_schedules():
    w = _pi0_rtc.get_prefix_weights(2, 6, 8, "zeros")
    np.testing.assert_allclose(w, [1, 1, 0, 0, 0, 0, 0, 0])
    w = _pi0_rtc.get_prefix_weights(2, 6, 8, "ones")
    np.testing.assert_allclose(w, [1, 1, 1, 1, 1, 1, 0, 0])
    w = _pi0_rtc.get_prefix_weights(2, 6, 8, "linear")
    assert w[0] == 1 and w[1] == 1 and w[6] == 0 and w[7] == 0
    assert np.all(np.diff(w[1:7]) <= 0)  # monotone decay over the guided window
    w_exp = _pi0_rtc.get_prefix_weights(2, 6, 8, "exp")
    assert np.all(w_exp[2:6] <= w[2:6] + 1e-6)  # exp decays at least as fast


def test_rtc_sampling_without_prev_chunk_matches_base(rtc_setup):
    config, params = rtc_setup
    obs = config.fake_obs(1)
    noise = jax.random.normal(jax.random.key(3), (1, config.action_horizon, config.action_dim))
    from kai0_tpu.models import pi0 as _pi0

    base = _pi0.sample_actions(params, config, jax.random.key(1), obs, num_steps=2, noise=noise)
    rtc = _pi0_rtc.sample_actions(params, config, jax.random.key(1), obs, num_steps=2, noise=noise)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rtc), atol=1e-5)


def test_rtc_guidance_pulls_toward_prev_chunk(rtc_setup):
    config, params = rtc_setup
    obs = config.fake_obs(1)
    noise = jax.random.normal(jax.random.key(3), (1, config.action_horizon, config.action_dim))
    free = _pi0_rtc.sample_actions(params, config, jax.random.key(1), obs, num_steps=4, noise=noise)
    prev = np.asarray(free) + 0.5  # pretend the previous chunk is offset
    guided = _pi0_rtc.sample_actions(
        params,
        config,
        jax.random.key(1),
        obs,
        num_steps=4,
        noise=noise,
        prev_action_chunk=prev,
        inference_delay=jnp.asarray(1),
        execute_horizon=jnp.asarray(6),
        max_guidance_weight=5.0,
    )
    free, guided = np.asarray(free), np.asarray(guided)
    # Guided steps (within [delay, exec_horizon)) move toward the previous chunk.
    err_free = np.abs(free[0, 1:5] - prev[0, 1:5]).mean()
    err_guided = np.abs(guided[0, 1:5] - prev[0, 1:5]).mean()
    assert err_guided < err_free
    # Steps at/after execute_horizon are unguided (weights 0 there).
    assert np.all(np.isfinite(guided))


def test_rtc_delay_traced_not_static(rtc_setup):
    """Changing delay/horizon must not recompile: they are traced array args."""
    config, params = rtc_setup
    obs = config.fake_obs(1)
    prev = np.zeros((1, config.action_horizon, config.action_dim), np.float32)

    import functools

    sample = jax.jit(
        functools.partial(_pi0_rtc.sample_actions, params, config),
        static_argnames=("num_steps",),
    )
    noise = jax.random.normal(jax.random.key(3), (1, config.action_horizon, config.action_dim))
    out1 = sample(jax.random.key(1), obs, num_steps=2, noise=noise, prev_action_chunk=prev,
                  inference_delay=jnp.asarray(1), execute_horizon=jnp.asarray(4))
    out2 = sample(jax.random.key(1), obs, num_steps=2, noise=noise, prev_action_chunk=prev,
                  inference_delay=jnp.asarray(3), execute_horizon=jnp.asarray(7))
    compiled = sample._cache_size() if hasattr(sample, "_cache_size") else None
    if compiled is not None:
        assert compiled == 1
    assert np.all(np.isfinite(out1)) and np.all(np.isfinite(out2))


@pytest.fixture(scope="module")
def adv_setup():
    config = _advantage.AdvantageEstimatorConfig(action_horizon=8, action_dim=6, pi05=True, **_DUMMY)
    params = config.init_params(jax.random.key(0))
    return config, params


def test_advantage_loss_and_values(adv_setup):
    config, params = adv_setup
    obs = config.fake_obs(2)
    obs.progress = jnp.asarray([0.5, -2.0])  # second target clamps to -1
    actions = config.fake_act(2)
    loss, aux = _advantage.compute_loss_and_aux(params, config, jax.random.key(1), obs, actions)
    assert loss.shape[0] == 2
    assert np.isfinite(aux["loss_action"]) and np.isfinite(aux["loss_value"])

    values = _advantage.sample_values(params, config, jax.random.key(2), obs)
    assert values.shape == (2, 1)
    assert np.all(np.abs(values) <= 1.0)  # tanh head


def test_advantage_dataset(tmp_path):
    from kai0_tpu.data.advantage_dataset import AdvantageLerobotDataset
    from kai0_tpu.data.lerobot_dataset import LeRobotDataset
    from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec

    root = tmp_path / "adv_ds"
    feats = feature_spec(state_dim=3, action_dim=3, cameras={}, fps=10)
    feats["stage_progress_gt"] = {"dtype": "float32", "shape": [1], "names": None}
    writer = LeRobotDatasetWriter(root, feats, fps=10)
    length = 20
    writer.add_episode(
        {
            "observation.state": np.zeros((length, 3), np.float32),
            "action": np.zeros((length, 3), np.float32),
            "stage_progress_gt": np.linspace(0, 1, length, dtype=np.float32),
        },
        task="fold",
    )
    writer.finalize()

    ds = AdvantageLerobotDataset(LeRobotDataset(str(root)), seed=1)
    item = ds[5]
    assert "his_-100_stage_progress_gt" in item
    assert item["his_-100_frame_index"] != item["frame_index"]
    expected = item["stage_progress_gt"] - item["his_-100_stage_progress_gt"]
    np.testing.assert_allclose(item["progress"], expected, rtol=1e-6)
    assert item["episode_length"] == length
    assert item["task"] == "fold"
