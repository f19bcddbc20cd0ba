"""The knob registry: single env site, precedence, CLI path, recording."""

import dataclasses
import json
import pathlib
import subprocess
import sys

import pytest

from kai0_tpu import knobs


@pytest.fixture(autouse=True)
def _clean_configured():
    yield
    knobs.configure(None)


def test_precedence_env_config_default(monkeypatch):
    assert knobs.get().int8_ffn == "fused"  # default
    knobs.configure(knobs.Knobs(int8_ffn="split", flash_block_t=128))
    assert knobs.get().int8_ffn == "split"  # config beats default
    assert knobs.get().flash_block_t == 128
    monkeypatch.setenv("KAI0_INT8_FFN", "fused")
    assert knobs.get().int8_ffn == "fused"  # env beats config
    monkeypatch.setenv("KAI0_FLASH_BLOCK_T", "256")
    assert knobs.get().flash_block_t == 256


def test_bool_and_int_coercion(monkeypatch):
    monkeypatch.setenv("KAI0_INT8_BWD", "off")
    assert knobs.get().int8_bwd is False
    monkeypatch.setenv("KAI0_INT8_BWD", "1")
    assert knobs.get().int8_bwd is True
    monkeypatch.setenv("KAI0_INT8_CHUNK_MB", "64")
    assert knobs.get().int8_chunk_mb == 64


def test_empty_env_value_means_unset(monkeypatch):
    """'' falls through to config/default for EVERY knob type (docs/knobs.md) —
    disabling a default-true knob requires an explicit '0'."""
    monkeypatch.setenv("KAI0_INT8_BWD", "")
    assert knobs.get().int8_bwd is True  # default, not parsed-false
    monkeypatch.setenv("KAI0_INT8_FFN", "")
    knobs.configure(knobs.Knobs(int8_ffn="split"))
    assert knobs.get().int8_ffn == "split"  # config layer still visible
    monkeypatch.setenv("KAI0_INT8_BWD", "0")
    assert knobs.get().int8_bwd is False


def test_create_trained_policy_installs_config_knobs(monkeypatch, tmp_path):
    """Serving must install TrainConfig.knobs like train/bench do — a config
    pinning a knob would otherwise train with it and silently serve without."""
    import jax

    from kai0_tpu.policies import policy_config as _policy_config
    from kai0_tpu.training import config as _config

    cfg = _config.get_config("debug_serve")
    cfg = dataclasses.replace(cfg, knobs=knobs.Knobs(int8_ffn="split"))
    params = jax.tree.map(lambda x: x, cfg.model.init_params(jax.random.key(0)))
    _policy_config.create_trained_policy(cfg, tmp_path, params=params)
    assert knobs.get().int8_ffn == "split"


def test_as_dict_reports_non_defaults_only(monkeypatch):
    # Ambient KAI0_* A/B settings (a documented developer workflow) must not
    # fail the default-state assertion — clear every registered knob var.
    for env_name in knobs._ENV.values():
        monkeypatch.delenv(env_name, raising=False)
    monkeypatch.setattr(knobs, "_configured", None)  # restored on teardown
    assert knobs.as_dict() == {}
    monkeypatch.setenv("KAI0_REMAT", "attn")
    assert knobs.as_dict() == {"remat": "attn"}
    assert knobs.as_dict(full=True)["int8_ffn"] == "fused"


def test_every_knob_has_env_and_default():
    fields = {f.name for f in dataclasses.fields(knobs.Knobs)}
    assert fields == set(knobs._ENV) == set(knobs._DEFAULTS)


def test_models_and_ops_have_no_env_reads():
    """VERDICT round-2 item 8: the single config-resolution site is knobs.py."""
    root = pathlib.Path(__file__).parent.parent / "kai0_tpu"
    offenders = []
    for sub in ("models", "ops"):
        for path in (root / sub).rglob("*.py"):
            if "os.environ" in path.read_text():
                offenders.append(str(path))
    assert not offenders, offenders


def test_train_config_knobs_cli_path():
    from kai0_tpu.training import cli as _cli
    from kai0_tpu.training import config as _config

    cfg = _config.get_config("debug")
    cfg = _cli.parse_overrides(cfg, {"knobs.int8_ffn": "split", "knobs.flash_block_t": "128"})
    assert cfg.knobs.int8_ffn == "split"
    assert cfg.knobs.flash_block_t == 128
    eff = cfg.apply_model_knobs()
    assert eff["int8_ffn"] == "split" and eff["flash_block_t"] == 128
    assert knobs.get().int8_ffn == "split"


def test_checkpoint_records_knobs(tmp_path, monkeypatch):
    """assets/knobs.json lands next to the norm stats on save."""
    monkeypatch.setenv("KAI0_REMAT", "attn")
    import jax
    import orbax.checkpoint  # noqa: F401

    from kai0_tpu.training import checkpoints as _checkpoints
    from kai0_tpu.training import utils as _utils

    state = _utils.TrainState(
        step=jax.numpy.asarray(0),
        params={"w": jax.numpy.zeros((2,))},
        opt_state={},
        ema_params=None,
    )
    mgr, _ = _checkpoints.initialize_checkpoint_dir(
        tmp_path / "ck", keep_period=None, overwrite=True, resume=False
    )
    _checkpoints.save_state(mgr, state, 0)
    mgr.wait_until_finished()
    recorded = json.loads((tmp_path / "ck" / "0" / "assets" / "knobs.json").read_text())
    assert recorded["remat"] == "attn"
    assert recorded["int8_ffn"] == "fused"
