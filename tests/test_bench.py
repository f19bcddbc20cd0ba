"""Bench harness: the fused multi-step program under a sharded (batch, fsdp) mesh.

The driver runs ``bench.py`` on real hardware; this exercises the same ``build()``
+ ``multi_step`` path (fori_loop over donated sharded state) on the virtual CPU
mesh so the ≥4-chip "full" mode is compile-checked in CI.
"""

import dataclasses
import pathlib
import sys

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def test_multi_step_program_with_fsdp():
    import bench
    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config

    model = _pi0.Pi0Config(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
    )
    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])
    # Tiny params must still shard (same knob the dryrun uses).
    orig = _config.get_config("debug")
    try:
        _config.registry()["debug"] = dataclasses.replace(orig, fsdp_min_size_mbytes=0)
        # Data shards over both mesh axes (batch·fsdp = 8 devices) → batch % 8 == 0.
        step, multi_step, state, batch, rng = bench.build(model, mesh, batch_size=8)
        with sharding.set_mesh(mesh):
            state, info = step(rng, state, batch)
            first_loss = float(info["loss"])
            state, info = multi_step(3, rng, state, batch)
            loop_loss = float(info["loss"])
        assert np.isfinite(first_loss) and np.isfinite(loop_loss)
        assert int(state.step) == 4  # 1 eager + 3 fused steps
    finally:
        _config.registry()["debug"] = orig
