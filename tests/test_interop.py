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
