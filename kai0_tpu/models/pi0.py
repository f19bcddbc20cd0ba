"""π₀ / π₀.₅ flow-matching VLA — functional JAX, TPU-first.

Behavioral parity with reference ``src/openpi/models/pi0.py`` + ``pi0_config.py``:

- Prefix = SigLIP patch tokens for each camera + language tokens (bidirectional
  attention); suffix = (state token for π₀) + ``action_horizon`` action tokens through
  the second "action expert" Gemma; block-causal mask per ``make_attn_mask``.
- Loss: MSE on the flow-matching velocity ``u_t = noise − actions`` with
  ``t ~ Beta(1.5, 1)·0.999 + 0.001`` (pi0.py:196-199).
- Inference: 10-step Euler integration t=1 → 0 with the prefix KV cache computed once
  (pi0.py:216-279).
- π₀.₅ differences (pi0_config.py:29-32): discrete state in the prompt (no state
  token) and adaRMSNorm time conditioning of the action expert via a swish MLP.

TPU-first deviations (design, not behavior): all three cameras are encoded by SigLIP
in a single batched call (3× larger MXU matmuls, one pipeline); parameters are plain
pytrees so the model is jit/shard_map-transparent; a ``vision_variant`` knob allows a
tiny ViT in debug configs (the reference always builds So400m/14).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from kai0_tpu.models import gemma as _gemma
from kai0_tpu.models import model as _model
from kai0_tpu.models import siglip as _siglip
from kai0_tpu.ops.masks import make_attn_mask, posemb_sincos


@dataclasses.dataclass(frozen=True)
class Pi0Config:
    dtype: str = "bfloat16"
    paligemma_variant: _gemma.Variant = "gemma_2b"
    action_expert_variant: _gemma.Variant = "gemma_300m"
    # kai0-tpu extension: configurable vision tower (reference hardcodes So400m/14);
    # debug configs use a tiny variant so CPU tests run in seconds.
    vision_variant: str = "So400m/14"

    action_dim: int = 32
    action_horizon: int = 50
    max_token_len: int = None  # type: ignore[assignment]
    # π₀.₅: discrete state in prompt + adaRMSNorm time injection (pi0_config.py:29-32).
    pi05: bool = False
    # Read by the transform factory, not the model itself.
    discrete_state_input: bool = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.max_token_len is None:
            object.__setattr__(self, "max_token_len", 200 if self.pi05 else 48)
        if self.discrete_state_input is None:
            object.__setattr__(self, "discrete_state_input", self.pi05)

    # -- structural accessors ----------------------------------------------------------

    @property
    def model_type(self) -> _model.ModelType:
        return _model.ModelType.PI05 if self.pi05 else _model.ModelType.PI0

    @property
    def paligemma_config(self) -> _gemma.Config:
        return _gemma.get_config(self.paligemma_variant)

    @property
    def action_expert_config(self) -> _gemma.Config:
        return _gemma.get_config(self.action_expert_variant)

    @property
    def gemma_configs(self) -> tuple[_gemma.Config, _gemma.Config]:
        return (self.paligemma_config, self.action_expert_config)

    @property
    def use_adarms(self) -> tuple[bool, bool]:
        return (False, True) if self.pi05 else (False, False)

    @property
    def vision_config(self) -> _siglip.Config:
        return _siglip.get_config(self.paligemma_config.width, self.vision_variant, dtype_mm=self.dtype)

    def inputs_spec(self, *, batch_size: int = 1) -> tuple[_model.Observation, jax.ShapeDtypeStruct]:
        image_spec = jax.ShapeDtypeStruct([batch_size, *_model.IMAGE_RESOLUTION, 3], jnp.float32)
        image_mask_spec = jax.ShapeDtypeStruct([batch_size], jnp.bool_)
        observation_spec = _model.Observation(
            images={k: image_spec for k in _model.IMAGE_KEYS},
            image_masks={k: image_mask_spec for k in _model.IMAGE_KEYS},
            state=jax.ShapeDtypeStruct([batch_size, self.action_dim], jnp.float32),
            tokenized_prompt=jax.ShapeDtypeStruct([batch_size, self.max_token_len], jnp.int32),
            tokenized_prompt_mask=jax.ShapeDtypeStruct([batch_size, self.max_token_len], bool),
        )
        action_spec = jax.ShapeDtypeStruct([batch_size, self.action_horizon, self.action_dim], jnp.float32)
        return observation_spec, action_spec

    def fake_obs(self, batch_size: int = 1) -> _model.Observation:
        observation_spec, _ = self.inputs_spec(batch_size=batch_size)
        return jax.tree.map(lambda x: jnp.ones(x.shape, x.dtype), observation_spec)

    def fake_act(self, batch_size: int = 1):
        _, action_spec = self.inputs_spec(batch_size=batch_size)
        return jnp.ones(action_spec.shape, action_spec.dtype)

    # -- model functions ---------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> dict:
        return init_params(self, rng)

    def compute_loss(self, params, rng, observation, actions, *, train: bool = False):
        return compute_loss(params, self, rng, observation, actions, train=train)

    def sample_actions(self, params, rng, observation, **kwargs):
        return sample_actions(params, self, rng, observation, **kwargs)

    def freeze_filter(self):
        """Path-predicate marking frozen params (True = frozen). Reference pi0_config.py:80-109."""
        return make_freeze_filter(self.paligemma_variant, self.action_expert_variant)


def make_freeze_filter(paligemma_variant: str, action_expert_variant: str):
    """LoRA freeze logic: freeze base weights of LoRA'd experts, never freeze lora params."""
    import re

    gemma_re = re.compile(r".*llm.*")
    expert_re = re.compile(r".*llm.*_1.*")
    lora_re = re.compile(r".*lora.*")

    pg_lora = "lora" in paligemma_variant
    ae_lora = "lora" in action_expert_variant

    def frozen(path: str) -> bool:
        if not (pg_lora or ae_lora):
            return False
        if lora_re.match(path):
            return False
        if pg_lora and gemma_re.match(path):
            if not ae_lora and expert_re.match(path):
                return False  # action expert trains fully
            return True
        if ae_lora and not pg_lora:
            return bool(expert_re.match(path))
        return False

    return frozen


# --------------------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------------------


def _linear_init(rng: jax.Array, din: int, dout: int) -> dict:
    import flax.linen as nn

    return {"kernel": nn.initializers.lecun_normal()(rng, (din, dout)), "bias": jnp.zeros((dout,))}


def _linear(params: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, params["kernel"].astype(x.dtype)) + params["bias"].astype(x.dtype)


def init_params(config: Pi0Config, rng: jax.Array) -> dict:
    """Initialize the full parameter tree (names match the openpi checkpoint layout)."""
    k_llm, k_img, k1, k2, k3, k4, k5 = jax.random.split(rng, 7)
    expert_width = config.action_expert_config.width
    params = {
        "PaliGemma": {
            "llm": _gemma.init(k_llm, config.gemma_configs, config.use_adarms),
            "img": _siglip.init(k_img, config.vision_config, _model.IMAGE_RESOLUTION),
        },
        "action_in_proj": _linear_init(k1, config.action_dim, expert_width),
        "action_out_proj": _linear_init(k2, expert_width, config.action_dim),
    }
    if config.pi05:
        params["time_mlp_in"] = _linear_init(k3, expert_width, expert_width)
        params["time_mlp_out"] = _linear_init(k4, expert_width, expert_width)
    else:
        params["state_proj"] = _linear_init(k3, config.action_dim, expert_width)
        params["action_time_mlp_in"] = _linear_init(k4, 2 * expert_width, expert_width)
        params["action_time_mlp_out"] = _linear_init(k5, expert_width, expert_width)
    return params


# --------------------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------------------


def embed_prefix(params: dict, config: Pi0Config, obs: _model.Observation):
    """Embed images + language into the prefix token sequence.

    Returns (tokens [B, P, D0], input_mask bool[B, P], ar_mask bool[P]).
    All cameras are encoded in ONE batched SigLIP call (TPU: bigger matmuls, one
    pipeline) — equivalent to the reference's per-camera loop (pi0.py:105-137).
    """
    image_names = list(obs.images)
    images = jnp.stack([obs.images[name] for name in image_names], axis=0)  # [C, B, H, W, 3]
    c, b = images.shape[:2]
    image_tokens = _siglip.apply(
        params["PaliGemma"]["img"], config.vision_config, images.reshape((c * b, *images.shape[2:]))
    )
    image_tokens = image_tokens.reshape((c, b, *image_tokens.shape[1:]))  # [C, B, N, D0]
    tokens_per_image = image_tokens.shape[2]

    tokens = [image_tokens[i] for i in range(c)]
    input_mask = [
        jnp.broadcast_to(obs.image_masks[name][:, None], (b, tokens_per_image)) for name in image_names
    ]
    ar_mask = [False] * (c * tokens_per_image)  # image tokens attend to each other

    if obs.tokenized_prompt is not None:
        tokenized_inputs = _gemma.embed(params["PaliGemma"]["llm"], obs.tokenized_prompt, config.dtype)
        tokens.append(tokenized_inputs)
        input_mask.append(obs.tokenized_prompt_mask)
        ar_mask += [False] * tokenized_inputs.shape[1]  # full image<->language attention

    return jnp.concatenate(tokens, axis=1), jnp.concatenate(input_mask, axis=1), jnp.array(ar_mask)


def embed_suffix(params: dict, config: Pi0Config, obs: _model.Observation, noisy_actions, timestep):
    """Embed (state for π₀) + noisy actions + time into the action-expert suffix.

    Returns (tokens [B, S, D1], input_mask, ar_mask, adarms_cond | None).
    Parity: reference pi0.py:139-186.
    """
    batch = obs.state.shape[0]
    tokens, input_mask, ar_mask = [], [], []

    if not config.pi05:
        state_token = _linear(params["state_proj"], obs.state)[:, None, :]
        tokens.append(state_token)
        input_mask.append(jnp.ones((batch, 1), dtype=jnp.bool_))
        ar_mask += [True]  # prefix does not attend to state/actions

    action_tokens = _linear(params["action_in_proj"], noisy_actions)
    expert_width = config.action_expert_config.width
    time_emb = posemb_sincos(timestep, expert_width, min_period=4e-3, max_period=4.0)
    if config.pi05:
        time_emb = jax.nn.swish(_linear(params["time_mlp_in"], time_emb))
        time_emb = jax.nn.swish(_linear(params["time_mlp_out"], time_emb))
        action_expert_tokens = action_tokens
        adarms_cond = time_emb
    else:
        time_tokens = jnp.broadcast_to(time_emb[:, None, :], (batch, config.action_horizon, expert_width))
        action_time_tokens = jnp.concatenate([action_tokens, time_tokens], axis=-1)
        action_time_tokens = jax.nn.swish(_linear(params["action_time_mlp_in"], action_time_tokens))
        action_expert_tokens = _linear(params["action_time_mlp_out"], action_time_tokens)
        adarms_cond = None

    tokens.append(action_expert_tokens)
    input_mask.append(jnp.ones(action_expert_tokens.shape[:2], dtype=jnp.bool_))
    # prefix/state do not attend to actions; first action token starts a new block.
    ar_mask += [True] + [False] * (config.action_horizon - 1)

    return (
        jnp.concatenate(tokens, axis=1),
        jnp.concatenate(input_mask, axis=1),
        jnp.array(ar_mask),
        adarms_cond,
    )


# --------------------------------------------------------------------------------------
# Loss / sampling
# --------------------------------------------------------------------------------------


def compute_loss(params, config: Pi0Config, rng, observation, actions, *, train: bool = False):
    """Flow-matching velocity MSE per (batch, action step). Parity: pi0.py:188-214."""
    preprocess_rng, noise_rng, time_rng = jax.random.split(rng, 3)
    observation = _model.preprocess_observation(preprocess_rng, observation, train=train)

    batch_shape = actions.shape[:-2]
    noise = jax.random.normal(noise_rng, actions.shape)
    time = jax.random.beta(time_rng, 1.5, 1, batch_shape) * 0.999 + 0.001
    time_expanded = time[..., None, None]
    x_t = time_expanded * noise + (1 - time_expanded) * actions
    u_t = noise - actions

    prefix_tokens, prefix_mask, prefix_ar_mask = embed_prefix(params, config, observation)
    suffix_tokens, suffix_mask, suffix_ar_mask, adarms_cond = embed_suffix(params, config, observation, x_t, time)
    input_mask = jnp.concatenate([prefix_mask, suffix_mask], axis=1)
    ar_mask = jnp.concatenate([prefix_ar_mask, suffix_ar_mask], axis=0)
    attn_mask = make_attn_mask(input_mask, ar_mask)
    positions = jnp.cumsum(input_mask, axis=1) - 1
    (_, suffix_out), _ = _gemma.apply(
        params["PaliGemma"]["llm"],
        config.gemma_configs,
        [prefix_tokens, suffix_tokens],
        positions,
        attn_mask,
        adarms_cond=[None, adarms_cond],
        embed_dtype=config.dtype,
    )
    v_t = _linear(params["action_out_proj"], suffix_out[:, -config.action_horizon :].astype(jnp.float32))

    return jnp.mean(jnp.square(v_t - u_t), axis=-1)


def compute_prefix_kv_cache(params, config: Pi0Config, observation):
    """Run the prefix-only forward pass, returning (kv_cache, prefix_mask)."""
    prefix_tokens, prefix_mask, prefix_ar_mask = embed_prefix(params, config, observation)
    prefix_attn_mask = make_attn_mask(prefix_mask, prefix_ar_mask)
    positions = jnp.cumsum(prefix_mask, axis=1) - 1
    _, kv_cache = _gemma.apply(
        params["PaliGemma"]["llm"],
        config.gemma_configs,
        [prefix_tokens, None],
        positions,
        prefix_attn_mask,
        embed_dtype=config.dtype,
    )
    return kv_cache, prefix_mask


def compute_velocity(params, config: Pi0Config, observation, kv_cache, prefix_mask, x_t, time):
    """One denoiser evaluation v_θ(x_t, t) against the cached prefix."""
    batch_size = observation.state.shape[0]
    suffix_tokens, suffix_mask, suffix_ar_mask, adarms_cond = embed_suffix(
        params, config, observation, x_t, jnp.broadcast_to(time, batch_size)
    )
    suffix_attn_mask = make_attn_mask(suffix_mask, suffix_ar_mask)
    prefix_attn_mask = jnp.broadcast_to(
        prefix_mask[:, None, :], (batch_size, suffix_tokens.shape[1], prefix_mask.shape[1])
    )
    full_attn_mask = jnp.concatenate([prefix_attn_mask, suffix_attn_mask], axis=-1)
    positions = jnp.sum(prefix_mask, axis=-1)[:, None] + jnp.cumsum(suffix_mask, axis=-1) - 1

    (_, suffix_out), _ = _gemma.apply(
        params["PaliGemma"]["llm"],
        config.gemma_configs,
        [None, suffix_tokens],
        positions,
        full_attn_mask,
        adarms_cond=[None, adarms_cond],
        kv_cache=kv_cache,
        embed_dtype=config.dtype,
    )
    return _linear(params["action_out_proj"], suffix_out[:, -config.action_horizon :].astype(jnp.float32))


def sample_actions(
    params,
    config: Pi0Config,
    rng,
    observation,
    *,
    num_steps: int = 10,
    noise=None,
):
    """Euler-integrate the learned flow from t=1 (noise) to t=0 (actions).

    Parity: reference pi0.py:216-279 (prefix KV cache once, ``jax.lax.while_loop``
    over suffix-only denoise steps, cond robust to fp error).
    """
    observation = _model.preprocess_observation(None, observation, train=False)
    dt = -1.0 / num_steps
    batch_size = observation.state.shape[0]
    if noise is None:
        noise = jax.random.normal(rng, (batch_size, config.action_horizon, config.action_dim))

    kv_cache, prefix_mask = compute_prefix_kv_cache(params, config, observation)

    def step(carry):
        x_t, time = carry
        v_t = compute_velocity(params, config, observation, kv_cache, prefix_mask, x_t, time)
        return x_t + dt * v_t, time + dt

    def cond(carry):
        _, time = carry
        return time >= -dt / 2  # robust to floating-point error

    x_0, _ = jax.lax.while_loop(cond, step, (noise, 1.0))
    return x_0
