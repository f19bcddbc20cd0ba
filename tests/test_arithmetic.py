"""Model Arithmetic: mixing math, checkpoint IO, device-resident weight optimization."""

import jax
import numpy as np
import pytest

from kai0_tpu.arithmetic import core
from kai0_tpu.models import pi0 as _pi0
from kai0_tpu.training import checkpoints as _checkpoints


def test_mix_params_weighted_average():
    a = {"w": np.full((2, 2), 1.0, np.float32), "b": {"x": np.full(3, 0.0, np.float32)}}
    b = {"w": np.full((2, 2), 3.0, np.float32), "b": {"x": np.full(3, 4.0, np.float32)}}
    mixed = core.mix_params([a, b], [1.0, 3.0])  # weights normalize to 0.25/0.75
    np.testing.assert_allclose(mixed["w"], 2.5)
    np.testing.assert_allclose(mixed["b"]["x"], 3.0)
    assert mixed["w"].dtype == np.float32


def test_mix_norm_stats():
    ns_a = {"state": {"mean": [0.0, 0.0], "std": [1.0, 1.0]}}
    ns_b = {"state": {"mean": [2.0, 2.0], "std": [3.0, 3.0]}}
    mixed = core.mix_norm_stats([ns_a, ns_b])
    np.testing.assert_allclose(mixed["state"]["mean"], [1.0, 1.0])
    np.testing.assert_allclose(mixed["state"]["std"], [2.0, 2.0])


def test_inverse_loss_weights():
    w = core.compute_optimal_weights([1.0, 2.0])
    assert w[0] > w[1]
    np.testing.assert_allclose(sum(w), 1.0, rtol=1e-6)


@pytest.fixture(scope="module")
def two_checkpoints(tmp_path_factory):
    config = _pi0.Pi0Config(
        paligemma_variant="dummy", action_expert_variant="dummy", vision_variant="mu/14",
        dtype="float32", action_horizon=4, action_dim=4, max_token_len=16,
    )
    base = tmp_path_factory.mktemp("ckpts")
    paths = []
    for i in range(2):
        params = config.init_params(jax.random.key(i))
        path = base / f"ckpt_{i}"
        _checkpoints.save_params(jax.tree.map(np.asarray, params), path / "params")
        paths.append(str(path))
    return config, paths


def test_resolve_and_load(two_checkpoints):
    config, paths = two_checkpoints
    params = core.load_params(paths[0])
    assert "PaliGemma" in params


def test_device_ensemble_and_gradient_descent(two_checkpoints):
    config, paths = two_checkpoints
    ensemble = core.DeviceEnsemble(paths, config, mesh=None)
    obs = config.fake_obs(2)
    actions = config.fake_act(2)
    batches = [(obs, actions)]

    losses = ensemble.checkpoint_losses(batches)
    assert len(losses) == 2 and all(np.isfinite(losses))

    weights = core.optimize_weights_gradient_descent(ensemble, batches, num_iterations=3)
    assert len(weights) == 2
    np.testing.assert_allclose(sum(weights), 1.0, rtol=1e-5)

    greedy = core.optimize_weights_greedy(ensemble, batches, grid=2)
    assert len(greedy) == 2


def test_mix_and_save_roundtrip(two_checkpoints, tmp_path):
    config, paths = two_checkpoints
    params_list = [core.load_params(p) for p in paths]
    mixed = core.mix_params(params_list, [0.5, 0.5])
    out = core.save_mixed_checkpoint(mixed, tmp_path / "mixed")
    reloaded = core.load_params(out)
    lhs = jax.tree.leaves(mixed)[0]
    rhs = jax.tree.leaves(reloaded)[0]
    np.testing.assert_allclose(lhs, rhs)


def test_torch_safetensors_mixing(tmp_path):
    """arithmetic_torch: safetensors roundtrip + weighted mixing CLI."""
    import pathlib
    import sys

    import safetensors.numpy

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "model_arithmetic"))
    import arithmetic_torch as at

    rng = np.random.default_rng(0)
    for i, scale in enumerate((0.0, 1.0)):
        ckpt = tmp_path / f"ckpt_{i}"
        ckpt.mkdir()
        safetensors.numpy.save_file(
            {"w": np.full((4, 4), scale, dtype=np.float32), "b": np.full((4,), scale, dtype=np.float32)},
            str(ckpt / "model.safetensors"),
        )
    at.main([
        "--checkpoints", str(tmp_path / "ckpt_0"), str(tmp_path / "ckpt_1"),
        "--output", str(tmp_path / "mixed"),
        "--weights", "0.25", "0.75",
    ])
    mixed = safetensors.numpy.load_file(str(tmp_path / "mixed" / "model.safetensors"))
    assert np.allclose(mixed["w"], 0.75)
    assert np.allclose(mixed["b"], 0.75)
    assert mixed["w"].dtype == np.float32

    # Key mismatch raises.
    bad = tmp_path / "bad"
    bad.mkdir()
    safetensors.numpy.save_file({"other": np.zeros(2, dtype=np.float32)}, str(bad / "model.safetensors"))
    with pytest.raises(ValueError, match="key mismatch"):
        at.mix_torch_params(
            [at.load_torch_params(tmp_path / "ckpt_0"), at.load_torch_params(bad)], [0.5, 0.5]
        )


def test_torch_checkpoint_loss_driven_mixing(tmp_path):
    """gradient_descent over torch checkpoints: converted via interop, optimized
    on-device, mixed back to safetensors (reference arithmetic_torch.py:118-425)."""
    import pathlib
    import pickle
    import sys

    import jax.numpy as jnp
    import safetensors.numpy

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "model_arithmetic"))
    import arithmetic_torch as at

    from kai0_tpu.interop import save_torch_checkpoint
    from kai0_tpu.training import config as _train_config

    config = _train_config.get_config("debug_pi05")
    for i in range(2):
        params = config.model.init_params(jax.random.key(10 + i))
        save_torch_checkpoint(params, config.model, tmp_path / f"ckpt_{i}")

    batches = [(config.model.fake_obs(1), config.model.fake_act(1))]
    data_path = tmp_path / "val.pkl"
    with open(data_path, "wb") as f:
        pickle.dump(batches, f)

    at.main([
        "--checkpoints", str(tmp_path / "ckpt_0"), str(tmp_path / "ckpt_1"),
        "--output", str(tmp_path / "mixed"),
        "--optimize_method", "gradient_descent",
        "--config", "debug_pi05",
        "--data-path", str(data_path),
        "--num_iterations", "2",
    ])
    mixed = safetensors.numpy.load_file(str(tmp_path / "mixed" / "model.safetensors"))
    a = safetensors.numpy.load_file(str(tmp_path / "ckpt_0" / "model.safetensors"))
    b = safetensors.numpy.load_file(str(tmp_path / "ckpt_1" / "model.safetensors"))
    key = "action_in_proj.weight"
    lo = np.minimum(a[key], b[key]) - 1e-6
    hi = np.maximum(a[key], b[key]) + 1e-6
    assert ((mixed[key] >= lo) & (mixed[key] <= hi)).all()  # convex combination
    assert set(mixed) == set(a)
