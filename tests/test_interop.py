"""Safetensors/torch checkpoint interop.

Round-trips pin fwd/inv consistency; the HF cross-checks pin the mapping against
the real transformers modules (a consistent-but-wrong transpose would round-trip
fine, so the numeric checks are the load-bearing part). CPU-only, dummy variants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kai0_tpu.interop import torch_safetensors as tsf
from kai0_tpu.models import gemma as _gemma
from kai0_tpu.models import pi0 as _pi0
from kai0_tpu.models import siglip as _siglip
from kai0_tpu.transforms import flatten_dict

torch = pytest.importorskip("torch")


def _dummy_config(pi05=True):
    return _pi0.Pi0Config(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=pi05,
    )


@pytest.mark.parametrize("pi05", [True, False])
def test_roundtrip_exact(pi05):
    config = _dummy_config(pi05)
    params = config.init_params(jax.random.key(0))
    # randomize zero-init leaves so the round-trip is not trivially zero
    flat = flatten_dict(params)
    keys = iter(jax.random.split(jax.random.key(1), len(flat)))
    params_rand = {
        k: 0.02 * jax.random.normal(next(keys), v.shape, v.dtype) for k, v in flat.items()
    }
    from kai0_tpu.transforms import unflatten_dict

    params = unflatten_dict(params_rand)

    state = tsf.jax_to_torch_state(params, config)
    # spot-check the key surface
    assert "paligemma_with_expert.paligemma.model.language_model.layers.0.self_attn.q_proj.weight" in state
    assert "paligemma_with_expert.gemma_expert.model.layers.0.mlp.gate_proj.weight" in state
    assert (
        "paligemma_with_expert.paligemma.model.vision_tower.vision_model.embeddings.patch_embedding.weight"
        in state
    )
    assert "action_in_proj.weight" in state
    if pi05:
        assert "time_mlp_in.weight" in state
        assert "paligemma_with_expert.gemma_expert.model.norm.dense.weight" in state
    else:
        assert "state_proj.weight" in state
        assert "paligemma_with_expert.gemma_expert.model.norm.weight" in state

    back = tsf.torch_state_to_jax(state, config)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_advantage_value_head_roundtrip():
    from kai0_tpu.models import advantage as _adv

    config = _adv.AdvantageEstimatorConfig(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
    )
    params = config.init_params(jax.random.key(0))
    state = tsf.jax_to_torch_state(params, config)
    assert "value_head.0.weight" in state and "value_head.4.bias" in state
    back = tsf.torch_state_to_jax(state, config)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, back
    )


def test_safetensors_file_roundtrip_bf16(tmp_path):
    config = _dummy_config(True)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), config.init_params(jax.random.key(2))
    )
    tsf.save_torch_checkpoint(params, config, tmp_path)
    assert tsf.is_torch_checkpoint(tmp_path)
    back = tsf.load_torch_checkpoint(tmp_path, config, dtype=jnp.bfloat16)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        ),
        params,
        back,
    )


def _hf_gemma_model(cfg, state, prefix):
    """Vanilla HF GemmaModel loaded from our exported state dict.

    The exported VLM keys sit under `paligemma.model.language_model.` which in HF
    is a bare GemmaModel (not ForCausalLM), so keys are `layers.*`/`norm.*`.
    """
    from transformers.models.auto import CONFIG_MAPPING
    from transformers.models.gemma.modeling_gemma import GemmaModel

    hf_cfg = CONFIG_MAPPING["gemma"](
        head_dim=cfg.head_dim,
        hidden_size=cfg.width,
        intermediate_size=cfg.mlp_dim,
        num_attention_heads=cfg.num_heads,
        num_hidden_layers=cfg.depth,
        num_key_value_heads=cfg.num_kv_heads,
        vocab_size=_gemma.PALIGEMMA_VOCAB_SIZE,
        hidden_activation="gelu_pytorch_tanh",
    )
    hf_cfg._attn_implementation = "eager"
    model = GemmaModel(hf_cfg)
    sub = {
        k[len(prefix) :]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state.items()
        if k.startswith(prefix)
    }
    missing, unexpected = model.load_state_dict(sub, strict=False)
    # embed_tokens only ships for the VLM expert (the action expert has none)
    assert all("embed_tokens" in m for m in missing), missing
    assert not unexpected, unexpected
    return model.eval()


def test_gemma_vlm_matches_hf_numerically():
    """Exported VLM weights drive vanilla HF Gemma to the same hidden states."""
    config = _dummy_config(pi05=False)  # no adaRMS -> vanilla HF modules apply
    params = config.init_params(jax.random.key(3))
    state = tsf.jax_to_torch_state(params, config)

    cfg = config.paligemma_config
    hf = _hf_gemma_model(cfg, state, "paligemma_with_expert.paligemma.model.language_model.")

    tokens = np.array([[5, 17, 999, 4, 255]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(tokens)).last_hidden_state.numpy()

    # JAX side: embed (scaled by sqrt(width) inside embed), causal mask, same positions.
    llm = params["PaliGemma"]["llm"]
    x = _gemma.embed(llm, jnp.asarray(tokens, jnp.int32), embed_dtype="float32")
    T = tokens.shape[1]
    mask = jnp.tril(jnp.ones((1, T, T), bool))
    positions = jnp.arange(T)[None]
    (out, _), _ = _gemma.apply(
        llm, [cfg, config.action_expert_config], [x, None], positions, mask,
        embed_dtype="float32",
    )
    np.testing.assert_allclose(np.asarray(out), hf_out, rtol=2e-4, atol=2e-4)


def test_siglip_matches_hf_numerically():
    """Exported ViT weights drive vanilla HF SigLIP to the same patch features."""
    from transformers.models.auto import CONFIG_MAPPING
    from transformers import PaliGemmaForConditionalGeneration

    config = _dummy_config(pi05=False)
    params = config.init_params(jax.random.key(4))
    state = tsf.jax_to_torch_state(params, config)

    vit = config.vision_config
    vlm_cfg = CONFIG_MAPPING["paligemma"]()
    vlm_cfg._vocab_size = _gemma.PALIGEMMA_VOCAB_SIZE
    vlm_cfg.image_token_index = _gemma.PALIGEMMA_VOCAB_SIZE
    tc = vlm_cfg.text_config
    pg = config.paligemma_config
    tc.hidden_size = pg.width
    tc.intermediate_size = pg.mlp_dim
    tc.num_attention_heads = pg.num_heads
    tc.head_dim = pg.head_dim
    tc.num_hidden_layers = pg.depth
    tc.num_key_value_heads = pg.num_kv_heads
    tc.vocab_size = _gemma.PALIGEMMA_VOCAB_SIZE
    tc.hidden_activation = "gelu_pytorch_tanh"
    vc = vlm_cfg.vision_config
    vc.hidden_size = vit.width
    vc.intermediate_size = vit.mlp_dim
    vc.num_hidden_layers = vit.depth
    vc.num_attention_heads = vit.num_heads
    vc.patch_size = 14
    vc.image_size = 224  # init_params lays out 16x16=256 position embeddings
    vlm_cfg.projection_dim = pg.width
    vc.projection_dim = pg.width
    vlm_cfg._attn_implementation = "eager"

    model = PaliGemmaForConditionalGeneration(vlm_cfg).eval()
    sub = {
        k[len("paligemma_with_expert.paligemma.") :]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state.items()
        if k.startswith("paligemma_with_expert.paligemma.")
    }
    missing, unexpected = model.load_state_dict(sub, strict=False)
    assert all("lm_head" in m or "language_model" in m for m in missing), missing
    assert not unexpected, unexpected

    image = np.random.default_rng(0).uniform(-1, 1, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        feats = model.model.get_image_features(torch.from_numpy(image)).numpy()

    jax_tokens = _siglip.apply(
        params["PaliGemma"]["img"], vit, jnp.asarray(image.transpose(0, 2, 3, 1))
    )
    # HF divides projected features by hidden_size**0.5 inside get_image_features;
    # openpi's JAX stack does not (the head output feeds the LLM directly).
    scale = vlm_cfg.text_config.hidden_size**0.5
    np.testing.assert_allclose(np.asarray(jax_tokens) / scale, feats, rtol=2e-4, atol=2e-4)


def test_create_trained_policy_serves_torch_checkpoint(tmp_path):
    """The factory detects model.safetensors and serves identically to the JAX ckpt.

    Matches reference policy_config.py:48-57 (torch-vs-JAX auto-detection).
    """
    from kai0_tpu.policies import policy_config as _policy_config
    from kai0_tpu.policies.agilex_policy import make_agilex_example
    from kai0_tpu.training import checkpoints as _checkpoints
    from kai0_tpu.training import config as _train_config

    config = _train_config.get_config("debug_serve")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), config.model.init_params(jax.random.key(7))
    )

    jax_dir = tmp_path / "jax_ckpt"
    _checkpoints.save_params(params, jax_dir / "params")
    torch_dir = tmp_path / "torch_ckpt"
    tsf.save_torch_checkpoint(params, config.model, torch_dir)

    kwargs = dict(sample_kwargs={"num_steps": 2}, default_prompt="do the thing")
    policy_jax = _policy_config.create_trained_policy(config, jax_dir, **kwargs)
    policy_torch = _policy_config.create_trained_policy(config, torch_dir, **kwargs)

    example = make_agilex_example()
    out_jax = policy_jax.infer(dict(example))
    out_torch = policy_torch.infer(dict(example))
    np.testing.assert_allclose(
        np.asarray(out_jax["actions"]), np.asarray(out_torch["actions"]), rtol=1e-5, atol=1e-5
    )


def test_advantage_estimator_numerical_golden(tmp_path):
    """AdvantageEstimator numerical golden vs the torch reference semantics
    (reference pi0_pytorch.py:464-481 value head, :561-587 loss composition,
    :596-644 sample_values) — VERDICT round-4 item 4.

    Known value-head weights travel through the safetensors interop (a
    consistent-but-wrong transpose would pass a roundtrip test, so the torch
    side here is the ACTUAL ``nn.Sequential(Linear,SiLU,Linear,SiLU,Linear,
    Tanh)`` of the reference, evaluated on the SAME deep representation): the
    head output, the clamp of the progress target, and the
    ``w_a·loss_action + w_v·loss_value`` composition must all match within
    1e-3 (trunk fidelity itself is pinned by the pi0 goldens)."""
    import dataclasses

    from kai0_tpu.models import advantage as _adv
    from kai0_tpu.models import model as _model

    config = _adv.AdvantageEstimatorConfig(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
        action_horizon=8,
        action_dim=6,
        loss_action_weight=0.3,
        loss_value_weight=2.5,
    )
    params = config.init_params(jax.random.key(0))
    width = config.action_expert_config.width

    # Fixture: KNOWN value-head weights, written as a torch-convention
    # safetensors file and loaded back through the interop key map.
    rng = np.random.default_rng(42)
    torch_head = torch.nn.Sequential(
        torch.nn.Linear(width, width), torch.nn.SiLU(),
        torch.nn.Linear(width, width), torch.nn.SiLU(),
        torch.nn.Linear(width, 1), torch.nn.Tanh(),
    )
    state = tsf.jax_to_torch_state(params, config)
    with torch.no_grad():
        for idx in (0, 2, 4):
            w = rng.normal(0, 0.2, torch_head[idx].weight.shape).astype(np.float32)
            b = rng.normal(0, 0.1, torch_head[idx].bias.shape).astype(np.float32)
            torch_head[idx].weight.copy_(torch.from_numpy(w))
            torch_head[idx].bias.copy_(torch.from_numpy(b))
            state[f"value_head.{idx}.weight"] = w
            state[f"value_head.{idx}.bias"] = b
    import safetensors.numpy

    safetensors.numpy.save_file(state, str(tmp_path / "model.safetensors"))
    loaded = tsf.load_torch_checkpoint(tmp_path, config)
    params = jax.tree.map(jnp.asarray, loaded)

    # --- sample_values: replicate its internal rng draws to get the SAME
    # trunk input, extract deep_rep from the trunk, and compare the JAX head
    # against the torch reference head on it.
    obs = config.fake_obs(3)
    obs.progress = jnp.asarray([0.5, -2.0, 0.9])  # middle target clamps to -1
    key = jax.random.key(7)
    values = np.asarray(_adv.sample_values(params, config, key, obs))

    obs_pp = _model.preprocess_observation(None, obs, train=False)
    noise_rng, time_rng = jax.random.split(key)
    noise = jax.random.normal(noise_rng, (3, config.action_horizon, config.action_dim))
    time = jax.random.beta(time_rng, 1.5, 1, (3,)) * 0.999 + 0.001
    suffix_out = _adv._suffix_forward(params, config, obs_pp, noise, time)
    deep_rep = np.asarray(suffix_out[:, 0, :], np.float32)  # reference :641: suffix_out[:, 0]
    with torch.no_grad():
        want_values = torch_head(torch.from_numpy(deep_rep)).numpy()
    np.testing.assert_allclose(values, want_values, atol=1e-3)
    assert np.all(np.abs(values) <= 1.0)

    # --- loss composition: loss(w_a, w_v) must equal w_a·loss_action +
    # w_v·(value_pred − clamp(progress))² with value_pred from the TORCH head
    # (linearity over the same rng draws isolates the composition).
    actions = config.fake_act(3)
    lkey = jax.random.key(11)
    loss, aux = _adv.compute_loss_and_aux(params, config, lkey, obs, actions)

    cfg_a = dataclasses.replace(config, loss_action_weight=1.0, loss_value_weight=0.0)
    loss_a, _ = _adv.compute_loss_and_aux(params, cfg_a, lkey, obs, actions)

    # value term, computed independently: same internal draws as compute_loss
    _, noise_rng, time_rng = jax.random.split(lkey, 3)
    noise = jax.random.normal(noise_rng, actions.shape)
    time = jax.random.beta(time_rng, 1.5, 1, actions.shape[:-2]) * 0.999 + 0.001
    te = time[..., None, None]
    x_t = te * noise + (1 - te) * jnp.asarray(actions)
    suffix_out = _adv._suffix_forward(params, config, obs_pp, x_t, time)
    deep_rep = np.asarray(suffix_out[:, 0, :], np.float32)
    with torch.no_grad():
        value_pred = torch_head(torch.from_numpy(deep_rep)).numpy()
    progress_tgt = np.clip(np.asarray(obs.progress, np.float32), -1.0, 1.0)[:, None]
    want_value_loss = (value_pred - progress_tgt) ** 2  # F.mse_loss reduction="none"

    want = 0.3 * np.asarray(loss_a) + 2.5 * want_value_loss
    np.testing.assert_allclose(np.asarray(loss), want, atol=1e-3)
    np.testing.assert_allclose(
        float(aux["loss_value"]), float(want_value_loss.mean()), atol=1e-3
    )
