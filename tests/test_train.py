"""End-to-end training integration test.

Mirrors reference ``scripts/train_test.py:14-31``: run the ``debug`` config for a few
steps with fake data and real Orbax checkpointing, then resume for more steps —
exercising config → loader → jitted sharded train step → save/restore on an 8-device
virtual CPU mesh.
"""

import dataclasses
import pathlib

import jax
import pytest

from kai0_tpu.training import config as _config
from kai0_tpu.training import train_lib


@pytest.mark.parametrize("config_name", ["debug", "debug_pi05"])
def test_train_and_resume(tmp_path: pathlib.Path, config_name: str):
    config = dataclasses.replace(
        _config.get_config(config_name),
        exp_name="test",
        checkpoint_base_dir=str(tmp_path / "checkpoints"),
        assets_base_dir=str(tmp_path / "assets"),
        # fsdp over the virtual mesh to exercise sharded params.
        fsdp_devices=2,
        batch_size=8,
        overwrite=True,
    )
    state = train_lib.main(config)
    assert int(state.step) == config.num_train_steps

    # Checkpoint was written (async) — resume from it.
    resume_config = dataclasses.replace(
        config, overwrite=False, resume=True, num_train_steps=config.num_train_steps + 2
    )
    state2 = train_lib.main(resume_config)
    assert int(state2.step) == config.num_train_steps + 2


def test_train_and_resume_with_bf16_opt_state(tmp_path: pathlib.Path):
    """AdamW(state_dtype="bfloat16") survives the Orbax round trip: the compact
    moments checkpoint and restore with their storage dtype intact, and training
    continues from them."""
    import jax.numpy as jnp
    import optax

    config = dataclasses.replace(
        _config.get_config("debug"),
        exp_name="bf16opt",
        checkpoint_base_dir=str(tmp_path / "checkpoints"),
        assets_base_dir=str(tmp_path / "assets"),
        fsdp_devices=2,
        batch_size=8,
        overwrite=True,
    )
    config = dataclasses.replace(
        config, optimizer=dataclasses.replace(config.optimizer, state_dtype="bfloat16")
    )
    state = train_lib.main(config)
    adam = next(
        s
        for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
    )
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(adam.mu))

    resumed = train_lib.main(
        dataclasses.replace(
            config, overwrite=False, resume=True, num_train_steps=config.num_train_steps + 2
        )
    )
    assert int(resumed.step) == config.num_train_steps + 2
    adam2 = next(
        s
        for s in jax.tree.leaves(
            resumed.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
    )
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(adam2.mu))


def test_train_step_decreases_loss_on_repeated_batch(tmp_path):
    """Optimizer sanity: loss decreases when overfitting a single batch."""
    import functools

    import jax.numpy as jnp

    from kai0_tpu.parallel import sharding as _sharding
    from kai0_tpu.training import data_loader as _data_loader

    config = dataclasses.replace(
        _config.get_config("debug"),
        exp_name="test",
        lr_schedule=__import__("kai0_tpu.training.optimizer", fromlist=["x"]).CosineDecaySchedule(
            warmup_steps=1, peak_lr=1e-3, decay_steps=100, decay_lr=1e-3
        ),
        batch_size=8,
    )
    mesh = _sharding.make_mesh(1)
    data_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(_sharding.DATA_AXIS))
    loader = _data_loader.create_data_loader(config, sharding=data_sharding, num_batches=1)
    batch = next(iter(loader))

    train_state, state_sharding, tx, mask = train_lib.init_train_state(
        config, jax.random.key(0), mesh, resume=False
    )
    step_fn = jax.jit(functools.partial(train_lib.train_step, config, tx, mask))
    rng = jax.random.key(1)
    losses = []
    state = train_state
    for _ in range(8):
        with _sharding.set_mesh(mesh):
            state, info = step_fn(rng, state, batch)
        losses.append(float(info["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(jnp.isfinite(jnp.asarray(losses)))


def test_registry_covers_every_reference_config_name():
    """Config names are public CLI surface: every named config in the reference
    registry (config.py `_CONFIGS` + misc packs) must exist here under the same
    name (SURVEY.md §7 design stance)."""
    import pathlib
    import re

    ref_root = pathlib.Path("/root/reference/src/openpi/training")
    if not ref_root.exists():
        pytest.skip("reference tree not mounted")
    text = "".join(
        p.read_text()
        for p in [
            ref_root / "config.py",
            ref_root / "misc/polaris_config.py",
            ref_root / "misc/roboarena_config.py",
        ]
    )
    # name="..." matches TrainConfigs plus two RLDS dataset-mixture names.
    ref_names = set(re.findall(r'name="([^"]+)"', text)) - {"droid", "polaris_droid_cotrain_dataset"}
    ours = set(_config.registry().keys())
    assert ref_names <= ours, f"missing configs: {sorted(ref_names - ours)}"


def test_registry_configs_instantiate():
    for name, cfg in _config.registry().items():
        assert cfg.name == name
        assert cfg.batch_size > 0


def test_apply_model_knobs(monkeypatch):
    """Config-level remat knobs install the knobs config layer; explicit env wins."""
    import dataclasses

    from kai0_tpu import knobs as _knobs
    from kai0_tpu.training import config as _config

    monkeypatch.delenv("KAI0_REMAT", raising=False)
    monkeypatch.delenv("KAI0_REMAT_VIT", raising=False)
    cfg = dataclasses.replace(_config.get_config("debug"), remat="attn", remat_vit="vitmlp")
    try:
        eff = cfg.apply_model_knobs()
        assert _knobs.get().remat == "attn" and _knobs.get().remat_vit == "vitmlp"
        assert eff["remat"] == "attn" and eff["remat_vit"] == "vitmlp"

        monkeypatch.setenv("KAI0_REMAT", "none")  # CLI override beats config
        eff = cfg.apply_model_knobs()
        assert eff["remat"] == "none"
        assert _knobs.get().remat == "none"
    finally:
        _knobs.configure(None)


def test_cli_override_reaches_optional_base_config():
    """Dotted overrides must reach DataConfig fields through a None
    ``base_config`` (the CLI instantiates the Optional dataclass default), and
    every factory's create() must carry those fields into the DataConfig —
    what makes ``--data.base_config.augment_mirror=True`` work on any config."""
    from kai0_tpu.training import cli

    for name in ("debug", "pi05_flatten_fold_normal"):
        cfg = cli.parse_overrides(
            _config.get_config(name),
            {"data.base_config.augment_mirror": "true",
             "data.base_config.augment_time_scale": "2"},
        )
        dc = cfg.data.create(cfg.assets_dirs, cfg.model)
        assert dc.augment_mirror is True and dc.augment_time_scale == 2, name
