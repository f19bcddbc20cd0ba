"""Tensor-parallel third mesh axis: placement rules + numerics on a (2,2,2) mesh.

TPU-native addition beyond the reference's 2-axis ``(batch, fsdp)`` mesh
(``src/openpi/training/sharding.py:48-102``): ``tp`` shards Gemma q/out attention
heads and FFN hidden dims, plus the SigLIP tower, via name-aware rules. These tests
run on the 8-virtual-device CPU backend (conftest) and check

- mesh construction (tp=1 must reproduce the 2-axis mesh exactly),
- the placement table picks the intended weight axes (and replicates MQA's KV head),
- a full train step on a (2,2,2) mesh matches the 2-axis mesh bit-for-bit-ish
  (same params, same batch → same loss/grad-norm within f32 reduction noise).

CPU meshes never dispatch Mosaic kernels, so the flash-attention ``shard_map``
tp specs are additionally validated by the v5e topology-AOT compile
(``scripts/aot_full_finetune.py --tp``) — the combination that caught the round-3
GSPMD partitioning bug.
"""

import dataclasses
import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from kai0_tpu.parallel import sharding


def test_make_mesh_tp_axis():
    devices = jax.devices()[:8]
    # tp=1 → the unchanged 2-axis mesh.
    mesh2 = sharding.make_mesh(4, devices=devices)
    assert mesh2.axis_names == ("batch", "fsdp") and tuple(mesh2.devices.shape) == (2, 4)
    assert sharding.tp_size(mesh2) == 1
    mesh2b = sharding.make_mesh(4, num_tp_devices=1, devices=devices)
    assert mesh2b.axis_names == mesh2.axis_names and np.array_equal(mesh2b.devices, mesh2.devices)
    # tp>1 → third axis, innermost.
    mesh3 = sharding.make_mesh(2, num_tp_devices=2, devices=devices)
    assert mesh3.axis_names == ("batch", "fsdp", "tp") and tuple(mesh3.devices.shape) == (2, 2, 2)
    assert sharding.tp_size(mesh3) == 2
    with pytest.raises(ValueError, match="divisible"):
        sharding.make_mesh(3, num_tp_devices=2, devices=devices)


def _dummy_pi05():
    from kai0_tpu.models import pi0 as _pi0

    return _pi0.Pi0Config(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
    )


def test_tp_placement_rules():
    """The name-aware table puts tp on head/hidden axes and replicates the KV head."""
    config = _dummy_pi05()
    params_shape = jax.eval_shape(config.init_params, jax.random.key(0))
    mesh = sharding.make_mesh(2, num_tp_devices=2, devices=jax.devices()[:8])
    placed = sharding.fsdp_sharding(params_shape, mesh, min_size_mbytes=0)

    from kai0_tpu.transforms import flatten_dict

    flat_shapes = flatten_dict(params_shape)
    flat_specs = {k: tuple(v.spec) + (None,) * (flat_shapes[k].ndim - len(v.spec)) for k, v in flatten_dict(placed).items()}

    def spec_of(path):
        assert path in flat_specs, f"{path} not in param tree: {sorted(flat_specs)[:10]}"
        return flat_specs[path]

    # Gemma MQA (stacked [depth, ...]): q heads and the out projection shard at -3 …
    assert spec_of("PaliGemma/llm/layers/attn/q_einsum_1/w")[-3] == "tp"
    assert spec_of("PaliGemma/llm/layers/attn/attn_vec_einsum/w")[-3] == "tp"
    assert spec_of("PaliGemma/llm/layers/attn/attn_vec_einsum_1/w")[-3] == "tp"
    # … the single KV head replicates (K=1 never divides tp=2).
    assert "tp" not in spec_of("PaliGemma/llm/layers/attn/kv_einsum_1/w")
    # Gated FFN: hidden dim on both sides of the gelu.
    assert spec_of("PaliGemma/llm/layers/mlp/gating_einsum")[-1] == "tp"
    assert spec_of("PaliGemma/llm/layers/mlp/linear")[-2] == "tp"
    assert spec_of("PaliGemma/llm/layers/mlp_1/gating_einsum")[-1] == "tp"
    # SigLIP tower (stacked [depth, ...]).
    img = "PaliGemma/img/Transformer/encoderblock/"
    q_spec = spec_of(img + "MultiHeadDotProductAttention_0/query/kernel")
    mlp0 = spec_of(img + "MlpBlock_0/Dense_0/kernel")
    mlp1 = spec_of(img + "MlpBlock_0/Dense_1/kernel")
    assert mlp0[-1] == "tp" and mlp1[-2] == "tp"
    # mu/14 has few heads; the rule applies iff divisible — never on a wrong axis.
    assert all(s in (None, "fsdp") for i, s in enumerate(q_spec) if i != len(q_spec) - 2)
    # tp and fsdp never land on the same axis.
    for path, spec in flat_specs.items():
        assert len([s for s in spec if s == "tp"]) <= 1, path


def _one_step(mesh, fsdp, tp, batch_size=8):
    import bench
    from kai0_tpu.training import config as _config

    orig = _config.get_config("debug")
    try:
        _config.registry()["debug"] = dataclasses.replace(orig, fsdp_min_size_mbytes=0, tp_devices=tp)
        step, _, state, batch, rng = bench.build(_dummy_pi05(), mesh, batch_size=batch_size)
        with sharding.set_mesh(mesh):
            state, info = step(rng, state, batch)
            info = jax.device_get(info)
        return float(info["loss"]), float(info["grad_norm"])
    finally:
        _config.registry()["debug"] = orig


def test_tp_train_step_matches_2axis_mesh():
    """One full train step (FSDP state + tp placement + activation constraints) on
    the (2,2,2) mesh must reproduce the 2-axis mesh's loss and grad norm — the
    partitioning changes, the math must not."""
    devices = jax.devices()[:8]
    loss_2ax, gnorm_2ax = _one_step(sharding.make_mesh(2, devices=devices), fsdp=2, tp=1)
    loss_tp, gnorm_tp = _one_step(sharding.make_mesh(2, num_tp_devices=2, devices=devices), fsdp=2, tp=2)
    assert np.isfinite(loss_tp) and np.isfinite(gnorm_tp)
    np.testing.assert_allclose(loss_tp, loss_2ax, rtol=1e-5)
    np.testing.assert_allclose(gnorm_tp, gnorm_2ax, rtol=1e-4)


def test_tp_train_step_lora_variant():
    """LoRA factor placement (lora_a/lora_b share the head/hidden axis rules):
    a frozen-base LoRA step on the tp mesh runs and stays finite."""
    from kai0_tpu.models import pi0 as _pi0

    config = _pi0.Pi0Config(
        paligemma_variant="dummy_lora",
        action_expert_variant="dummy_lora",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
    )
    import bench
    from kai0_tpu.training import config as _config

    mesh = sharding.make_mesh(2, num_tp_devices=2, devices=jax.devices()[:8])
    orig = _config.get_config("debug")
    try:
        _config.registry()["debug"] = dataclasses.replace(orig, fsdp_min_size_mbytes=0, tp_devices=2)
        step, _, state, batch, rng = bench.build(config, mesh, batch_size=8)
        with sharding.set_mesh(mesh):
            state, info = step(rng, state, batch)
            info = jax.device_get(info)
        assert np.isfinite(float(info["loss"])) and np.isfinite(float(info["grad_norm"]))
    finally:
        _config.registry()["debug"] = orig


def test_tp_train_step_switchback_gemma(monkeypatch):
    """KAI0_INT8_SB_GEMMA routes the trainable gemma matmuls through the
    SwitchBack custom-vjp dots; the (2,2,2) mesh must partition that program and
    reproduce the 2-axis SB loss (GSPMD handles the custom-vjp int8 dots — the
    multi-chip configuration where the SwitchBack economics matter most)."""
    monkeypatch.setenv("KAI0_INT8_SB_GEMMA", "all")
    devices = jax.devices()[:8]
    loss_2ax, gnorm_2ax = _one_step(sharding.make_mesh(2, devices=devices), fsdp=2, tp=1)
    loss_tp, gnorm_tp = _one_step(sharding.make_mesh(2, num_tp_devices=2, devices=devices), fsdp=2, tp=2)
    assert np.isfinite(loss_tp) and np.isfinite(gnorm_tp)
    np.testing.assert_allclose(loss_tp, loss_2ax, rtol=1e-5)
    np.testing.assert_allclose(gnorm_tp, gnorm_2ax, rtol=1e-4)
