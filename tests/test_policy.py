"""Policy runtime: transform chains, infer output contract, robot transforms."""

import dataclasses

import jax
import numpy as np
import pytest

from kai0_tpu import transforms as _transforms
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as _pi0
from kai0_tpu.models import tokenizer as _tokenizer
from kai0_tpu.policies import policy as _policy
from kai0_tpu.policies.agilex_policy import AgilexInputs, AgilexOutputs, make_agilex_example
from kai0_tpu.policies.aloha_policy import AlohaInputs, AlohaOutputs, make_aloha_example
from kai0_tpu.policies.droid_policy import DroidInputs, DroidOutputs, make_droid_example
from kai0_tpu.policies.libero_policy import LiberoInputs, LiberoOutputs, make_libero_example


@pytest.fixture(scope="module")
def debug_config():
    return _pi0.Pi0Config(
        paligemma_variant="dummy", action_expert_variant="dummy", vision_variant="mu/14", dtype="float32"
    )


@pytest.fixture(scope="module")
def debug_policy(debug_config):
    params = debug_config.init_params(jax.random.key(0))
    return _policy.Policy(
        debug_config,
        params,
        transforms=[
            AgilexInputs(action_dim=debug_config.action_dim, model_type=debug_config.model_type),
            _transforms.ResizeImages(224, 224),
            _transforms.TokenizePrompt(_tokenizer.PaligemmaTokenizer(debug_config.max_token_len)),
            _transforms.PadStatesAndActions(debug_config.action_dim),
        ],
        output_transforms=[AgilexOutputs()],
        sample_kwargs={"num_steps": 2},
    )


def test_policy_infer_contract(debug_policy, debug_config):
    result = debug_policy.infer(make_agilex_example())
    assert result["actions"].shape == (debug_config.action_horizon, 14)
    assert result["actions"].dtype == np.float32
    assert "infer_ms" in result["policy_timing"]
    assert np.all(np.isfinite(result["actions"]))


def test_policy_infer_deterministic_with_noise(debug_policy, debug_config):
    noise = np.zeros((debug_config.action_horizon, debug_config.action_dim), np.float32)
    example = make_agilex_example()
    a = debug_policy.infer(example, noise=noise)["actions"]
    b = debug_policy.infer(example, noise=noise)["actions"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_infer_batch_matches_single(debug_policy, debug_config):
    """One batched sample_actions equals per-request sampling (fixed noise)."""
    noise = np.zeros((debug_config.action_horizon, debug_config.action_dim), np.float32)
    ex_a = make_agilex_example()
    ex_b = make_agilex_example()
    ex_b["state"] = np.linspace(-1.0, 1.0, 14).astype(np.float32)
    singles = [debug_policy.infer(ex, noise=noise)["actions"] for ex in (ex_a, ex_b)]
    batched = debug_policy.infer_batch([ex_a, ex_b], noise=noise)
    assert batched[0]["policy_timing"]["batch_size"] == 2
    for single, out in zip(singles, batched):
        np.testing.assert_allclose(out["actions"], single, atol=1e-4)
    # Padding to a bucket must not change results and must return only n outputs.
    padded = debug_policy.infer_batch([ex_a, ex_b], noise=noise, pad_to=4)
    assert len(padded) == 2
    for single, out in zip(singles, padded):
        np.testing.assert_allclose(out["actions"], single, atol=1e-4)


def test_infer_batch_rejects_rtc_kwargs(debug_policy):
    ex = make_agilex_example()
    ex["prev_action_chunk"] = np.zeros((50, 32), np.float32)
    with pytest.raises(ValueError, match="RTC"):
        debug_policy.infer_batch([ex])


def test_infer_batch_with_prompt_buckets(debug_config):
    """Batched inference trims the whole group to one common prompt bucket."""
    params = debug_config.init_params(jax.random.key(0))
    mk = lambda buckets: _policy.Policy(  # noqa: E731
        debug_config,
        params,
        transforms=[
            AgilexInputs(action_dim=debug_config.action_dim, model_type=debug_config.model_type),
            _transforms.ResizeImages(224, 224),
            _transforms.TokenizePrompt(_tokenizer.PaligemmaTokenizer(debug_config.max_token_len)),
            _transforms.PadStatesAndActions(debug_config.action_dim),
        ],
        output_transforms=[AgilexOutputs()],
        sample_kwargs={"num_steps": 2},
        prompt_buckets=buckets,
    )
    noise = np.zeros((debug_config.action_horizon, debug_config.action_dim), np.float32)
    ex = make_agilex_example()
    full = mk(None).infer_batch([ex, ex], noise=noise)
    bucketed = mk([16]).infer_batch([ex, ex], noise=noise)
    for f, b in zip(full, bucketed):
        np.testing.assert_allclose(f["actions"], b["actions"], atol=1e-4)


def test_trim_prompt_to_bucket():
    mask = np.zeros(48, bool)
    mask[:10] = True
    inputs = {"tokenized_prompt": np.arange(48, dtype=np.int32), "tokenized_prompt_mask": mask}
    out = _policy._trim_prompt_to_bucket(dict(inputs), (16, 32))
    assert out["tokenized_prompt"].shape == (16,)
    assert out["tokenized_prompt_mask"].sum() == 10
    # No bucket fits -> keep the full length.
    mask40 = np.zeros(48, bool)
    mask40[:40] = True
    out = _policy._trim_prompt_to_bucket(
        {"tokenized_prompt": np.arange(48, dtype=np.int32), "tokenized_prompt_mask": mask40}, (16, 32)
    )
    assert out["tokenized_prompt"].shape == (48,)
    # Empty prompt -> smallest bucket.
    out = _policy._trim_prompt_to_bucket(
        {"tokenized_prompt": np.arange(48, dtype=np.int32), "tokenized_prompt_mask": np.zeros(48, bool)}, (16, 32)
    )
    assert out["tokenized_prompt"].shape == (16,)


def test_prompt_bucketing_matches_unbucketed(debug_config):
    """Trimming trailing prompt padding must not change the sampled actions."""
    params = debug_config.init_params(jax.random.key(0))
    mk = lambda buckets: _policy.Policy(  # noqa: E731
        debug_config,
        params,
        transforms=[
            AgilexInputs(action_dim=debug_config.action_dim, model_type=debug_config.model_type),
            _transforms.ResizeImages(224, 224),
            _transforms.TokenizePrompt(_tokenizer.PaligemmaTokenizer(debug_config.max_token_len)),
            _transforms.PadStatesAndActions(debug_config.action_dim),
        ],
        output_transforms=[AgilexOutputs()],
        sample_kwargs={"num_steps": 2},
        prompt_buckets=buckets,
    )
    noise = np.zeros((debug_config.action_horizon, debug_config.action_dim), np.float32)
    example = make_agilex_example()
    full = mk(None).infer(example, noise=noise)["actions"]
    bucketed = mk([16]).infer(example, noise=noise)["actions"]
    np.testing.assert_allclose(full, bucketed, atol=1e-4)
    # Warmup compiles every bucket without error.
    mk([8, 16]).warmup()


def test_sharded_serving_matches_single_device(debug_config):
    """FSDP-sharded params over the 8-device mesh must serve the same actions."""
    from kai0_tpu.parallel import sharding as _sharding

    params = debug_config.init_params(jax.random.key(0))
    transforms = [
        AgilexInputs(action_dim=debug_config.action_dim, model_type=debug_config.model_type),
        _transforms.ResizeImages(224, 224),
        _transforms.TokenizePrompt(_tokenizer.PaligemmaTokenizer(debug_config.max_token_len)),
        _transforms.PadStatesAndActions(debug_config.action_dim),
    ]
    mk = lambda mesh: _policy.Policy(  # noqa: E731
        debug_config,
        params,
        transforms=transforms,
        output_transforms=[AgilexOutputs()],
        sample_kwargs={"num_steps": 2},
        mesh=mesh,
    )
    noise = np.zeros((debug_config.action_horizon, debug_config.action_dim), np.float32)
    example = make_agilex_example()
    single = mk(None).infer(example, noise=noise)["actions"]
    mesh = _sharding.make_mesh(len(jax.devices()))
    sharded = mk(mesh).infer(example, noise=noise)["actions"]
    np.testing.assert_allclose(single, sharded, atol=1e-4)


def test_policy_recorder(tmp_path, debug_policy):
    recorder = _policy.PolicyRecorder(debug_policy, str(tmp_path / "records"))
    recorder.infer(make_agilex_example())
    assert len(list((tmp_path / "records").glob("step_*.npy"))) == 1


# ----------------------------------------------------------------------------------
# Robot transform units
# ----------------------------------------------------------------------------------


def test_agilex_inputs_clip_and_rename():
    tf = AgilexInputs(action_dim=32)
    data = make_agilex_example()
    data["state"] = np.full(14, 5.0)  # out of [-π, π] → zeroed
    out = tf(data)
    assert set(out["image"]) == {"base_0_rgb", "left_wrist_0_rgb", "right_wrist_0_rgb"}
    assert out["image"]["base_0_rgb"].shape == (480, 640, 3)  # CHW → HWC
    assert out["state"].shape == (32,)
    np.testing.assert_array_equal(out["state"], 0)


def test_agilex_outputs_truncate():
    out = AgilexOutputs()({"actions": np.zeros((50, 32))})
    assert out["actions"].shape == (50, 14)


def test_aloha_gripper_roundtrip():
    from kai0_tpu.policies import aloha_policy as ap

    actions = np.random.uniform(-0.5, 0.5, size=(5, 14))
    encoded = ap._encode_actions_inv(actions.copy(), adapt_to_pi=True)
    # Joint flips are involutive; grippers go through angular maps.
    redecoded = ap._joint_flip_mask() * encoded
    np.testing.assert_allclose(redecoded[:, :6], actions[:, :6], atol=1e-9)


def test_aloha_inputs(debug_config):
    out = AlohaInputs()(make_aloha_example())
    assert set(out["image"]) == {"base_0_rgb", "left_wrist_0_rgb", "right_wrist_0_rgb"}
    assert out["image"]["base_0_rgb"].dtype == np.uint8
    out2 = AlohaOutputs()({"actions": np.zeros((50, 32))})
    assert out2["actions"].shape == (50, 14)


def test_droid_inputs_per_model_type():
    out = DroidInputs(model_type=_model.ModelType.PI05)(make_droid_example())
    assert out["state"].shape == (8,)
    assert not out["image_mask"]["right_wrist_0_rgb"]
    out_fast = DroidInputs(model_type=_model.ModelType.PI0_FAST)(make_droid_example())
    assert set(out_fast["image"]) == {"base_0_rgb", "base_1_rgb", "wrist_0_rgb"}
    assert DroidOutputs()({"actions": np.zeros((10, 32))})["actions"].shape == (10, 8)


def test_libero_inputs():
    out = LiberoInputs(model_type=_model.ModelType.PI0)(make_libero_example())
    assert not out["image_mask"]["right_wrist_0_rgb"]
    assert LiberoOutputs()({"actions": np.zeros((10, 32))})["actions"].shape == (10, 7)


def test_create_trained_policy_fsdp_devices(tmp_path):
    """serve_policy --fsdp_devices path: the factory's _serve_mesh + sharded
    serving must produce the same actions as single-device serving (this is the
    only branch a real multi-chip pod serve exercises — keep it compiling)."""
    import jax.numpy as jnp

    from kai0_tpu.policies import policy_config as _policy_config
    from kai0_tpu.training import checkpoints as _checkpoints
    from kai0_tpu.training import config as _train_config

    config = _train_config.get_config("debug_serve")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), config.model.init_params(jax.random.key(5))
    )
    ckpt = tmp_path / "ckpt"
    _checkpoints.save_params(params, ckpt / "params")

    kwargs = dict(sample_kwargs={"num_steps": 2}, default_prompt="smoke")
    single = _policy_config.create_trained_policy(config, ckpt, **kwargs)
    sharded = _policy_config.create_trained_policy(
        config, ckpt, fsdp_devices=len(jax.devices()), **kwargs
    )
    noise = np.zeros((config.model.action_horizon, config.model.action_dim), np.float32)
    example = make_agilex_example()
    a = single.infer(dict(example), noise=noise)["actions"]
    b = sharded.infer(dict(example), noise=noise)["actions"]
    np.testing.assert_allclose(a, b, atol=1e-4)
