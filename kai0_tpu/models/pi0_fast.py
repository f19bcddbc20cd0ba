"""π₀-FAST: autoregressive action-token VLA — functional JAX, TPU-first.

Behavioral parity with reference ``src/openpi/models/pi0_fast.py``:

- single Gemma (no action expert); inputs = image tokens (bidirectional) + tokenized
  prompt with per-token AR mask from the FAST tokenizer;
- loss: next-token CE over the ``token_loss_mask`` positions, normalized per sample
  (:198-233); logits decoded only for target positions to bound the seq×vocab matmul;
- sampling: left-to-right-aligned prefill fills a fixed KV cache sized
  ``prefill + max_decoding_steps``; greedy/temperature decode one token per step in a
  ``jax.lax.while_loop`` with all-EOS early exit (:236-313).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from kai0_tpu.models import gemma_fast as _gemma_fast
from kai0_tpu.models import model as _model
from kai0_tpu.models import siglip as _siglip
from kai0_tpu.ops.masks import make_attn_mask

PALIGEMMA_EOS_TOKEN = 1

FAST_IMAGE_KEYS = ("base_0_rgb", "base_1_rgb", "wrist_0_rgb")


@jax.vmap
def left_to_right_align(x, input_mask, attn_mask):
    """Roll left-aligned sequences so valid tokens end at the right edge (:52-64)."""
    seqlen = jnp.max(input_mask * jnp.arange(input_mask.shape[0])) + 1
    return (
        jnp.roll(x, -seqlen, axis=0),
        jnp.roll(input_mask, -seqlen, axis=0),
        jnp.roll(attn_mask, -seqlen, axis=(0, 1)),
    )


def put_along_last_axis(arr, indices, values):
    """np.put_along_axis(..., axis=-1) for jax (:68-74)."""
    onehot = jax.nn.one_hot(indices, arr.shape[-1], dtype=values.dtype)
    put_mask = jnp.einsum("...i,...in->...n", jnp.ones(values.shape, jnp.int32), onehot)
    put_values = jnp.einsum("...i,...in->...n", values, onehot)
    return jnp.where(put_mask, put_values, arr)


@dataclasses.dataclass(frozen=True)
class Pi0FASTConfig:
    dtype: str = "bfloat16"
    paligemma_variant: str = "gemma_2b"
    vision_variant: str = "So400m/14"

    action_dim: int = 32
    action_horizon: int = 32
    max_token_len: int = 250

    fast_model_tokenizer: Any | None = None
    fast_model_tokenizer_kwargs: dict[str, Any] | None = None

    # Read by the transform factory.
    discrete_state_input: bool = True

    @property
    def model_type(self) -> _model.ModelType:
        return _model.ModelType.PI0_FAST

    @property
    def paligemma_config(self) -> _gemma_fast.Config:
        return _gemma_fast.get_config(self.paligemma_variant)

    @property
    def vision_config(self) -> _siglip.Config:
        return _siglip.get_config(self.paligemma_config.width, self.vision_variant, dtype_mm=self.dtype)

    def inputs_spec(self, *, batch_size: int = 1):
        image_spec = jax.ShapeDtypeStruct([batch_size, *_model.IMAGE_RESOLUTION, 3], jnp.float32)
        image_mask_spec = jax.ShapeDtypeStruct([batch_size], jnp.bool_)
        observation_spec = _model.Observation(
            images={k: image_spec for k in FAST_IMAGE_KEYS},
            image_masks={k: image_mask_spec for k in FAST_IMAGE_KEYS},
            state=jax.ShapeDtypeStruct([batch_size, self.action_dim], jnp.float32),
            tokenized_prompt=jax.ShapeDtypeStruct([batch_size, self.max_token_len], jnp.int32),
            tokenized_prompt_mask=jax.ShapeDtypeStruct([batch_size, self.max_token_len], bool),
            token_ar_mask=jax.ShapeDtypeStruct([batch_size, self.max_token_len], jnp.int32),
            token_loss_mask=jax.ShapeDtypeStruct([batch_size, self.max_token_len], jnp.bool_),
        )
        action_spec = jax.ShapeDtypeStruct([batch_size, self.action_horizon, self.action_dim], jnp.float32)
        return observation_spec, action_spec

    def fake_obs(self, batch_size: int = 1) -> _model.Observation:
        observation_spec, _ = self.inputs_spec(batch_size=batch_size)
        return jax.tree.map(lambda x: jnp.ones(x.shape, x.dtype), observation_spec)

    def fake_act(self, batch_size: int = 1):
        _, action_spec = self.inputs_spec(batch_size=batch_size)
        return jnp.ones(action_spec.shape, action_spec.dtype)

    def init_params(self, rng: jax.Array) -> dict:
        k_llm, k_img = jax.random.split(rng)
        return {
            "PaliGemma": {
                "llm": _gemma_fast.init(k_llm, self.paligemma_config),
                "img": _siglip.init(k_img, self.vision_config, _model.IMAGE_RESOLUTION),
            }
        }

    def compute_loss(self, params, rng, observation, actions, *, train: bool = False):
        return compute_loss(params, self, rng, observation, actions, train=train)

    def sample_actions(self, params, rng, observation, **kwargs):
        return sample_actions(params, self, rng, observation, **kwargs)

    def freeze_filter(self):
        import re

        lora = "lora" in self.paligemma_variant
        llm_re, lora_re = re.compile(r".*llm.*"), re.compile(r".*lora.*")

        def frozen(path: str) -> bool:
            return bool(lora and llm_re.match(path) and not lora_re.match(path))

        return frozen


def embed_inputs(params: dict, config: Pi0FASTConfig, obs: _model.Observation):
    """Images + tokenized prompt → (embeddings, input_mask, ar_mask int). (:159-196)"""
    image_names = list(obs.images)
    images = jnp.stack([obs.images[name] for name in image_names], axis=0)
    c, b = images.shape[:2]
    image_tokens = _siglip.apply(
        params["PaliGemma"]["img"], config.vision_config, images.reshape((c * b, *images.shape[2:]))
    )
    image_tokens = image_tokens.reshape((c, b, *image_tokens.shape[1:]))
    tokens_per_image = image_tokens.shape[2]

    token_embeddings = [image_tokens[i] for i in range(c)]
    input_mask = [
        jnp.broadcast_to(obs.image_masks[name][:, None], (b, tokens_per_image)) for name in image_names
    ]
    ar_mask = [jnp.zeros((b, tokens_per_image), jnp.int32) for _ in image_names]

    token_embeddings.append(_gemma_fast.embed(params["PaliGemma"]["llm"], obs.tokenized_prompt, config.dtype))
    input_mask.append(obs.tokenized_prompt_mask)
    ar_mask.append(obs.token_ar_mask.astype(jnp.int32))

    return (
        jnp.concatenate(token_embeddings, axis=1),
        jnp.concatenate(input_mask, axis=1),
        jnp.concatenate(ar_mask, axis=1),
    )


def compute_loss(params, config: Pi0FASTConfig, rng, observation, actions, *, train: bool = False):
    """Per-sample masked next-token CE (:198-233). ``actions`` is unused — action
    targets live in the tokenized prompt (FAST tokens)."""
    del actions
    observation = _model.preprocess_observation(
        rng, observation, train=train, image_keys=list(observation.images.keys())
    )

    embeddings, input_mask, ar_mask = embed_inputs(params, config, observation)
    attn_mask = make_attn_mask(input_mask, ar_mask)

    targets = jax.nn.one_hot(observation.tokenized_prompt[:, 1:], _gemma_fast._gemma.PALIGEMMA_VOCAB_SIZE)

    positions = jnp.cumsum(input_mask, axis=1) - 1
    # Each position predicts the next token: drop the last input.
    pre_logits, _ = _gemma_fast.apply(
        params["PaliGemma"]["llm"],
        config.paligemma_config,
        embeddings[:, :-1],
        positions[:, :-1],
        attn_mask[:, :-1, :-1],
        embed_dtype=config.dtype,
    )
    # Decode logits only for target positions (seq×vocab matmul is the memory hog).
    logits = _gemma_fast.decode_logits(params["PaliGemma"]["llm"], pre_logits[:, -targets.shape[1] :])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    loss_mask = observation.token_loss_mask[:, 1:]
    token_pplx = jnp.sum(targets * logp, axis=-1)
    return -jnp.sum(token_pplx * loss_mask, axis=-1) / jnp.clip(jnp.sum(loss_mask, -1), 1)


def sample_actions(
    params,
    config: Pi0FASTConfig,
    rng,
    observation,
    *,
    max_decoding_steps: int = 256,
    temperature: float = 0.0,
):
    """Greedy/temperature decode of FAST action tokens; returns the token buffer
    [B, max_decoding_steps] for the output transform to parse (:236-313)."""
    observation = _model.preprocess_observation(
        None, observation, train=False, image_keys=list(observation.images.keys())
    )

    prefix_embeddings, prefix_mask, prefix_ar_mask = embed_inputs(params, config, observation)
    prefix_attn_mask = make_attn_mask(prefix_mask, prefix_ar_mask)
    prefix_embeddings, prefix_mask, prefix_attn_mask = left_to_right_align(
        prefix_embeddings, prefix_mask, prefix_attn_mask
    )
    prefill_size = prefix_embeddings.shape[1]
    prefill_len = jnp.sum(prefix_mask, axis=-1)
    prefix_start = prefill_size - prefill_len

    # Cache capacity = prefill + decode budget (mask's key axis sets it).
    prefix_attn_mask = jnp.pad(prefix_attn_mask, ((0, 0), (0, 0), (0, max_decoding_steps)))
    prefix_positions = jnp.cumsum(prefix_mask, axis=-1) - 1
    prelogits, kv_cache = _gemma_fast.apply(
        params["PaliGemma"]["llm"],
        config.paligemma_config,
        prefix_embeddings,
        prefix_positions,
        prefix_attn_mask,
        embed_dtype=config.dtype,
    )
    last_logit = _gemma_fast.decode_logits(params["PaliGemma"]["llm"], prelogits[:, -1:]).astype(jnp.float32)
    output_tokens = jnp.zeros((last_logit.shape[0], max_decoding_steps))

    def step(carry):
        rng, last_logit, output_tokens, cache, _, step_idx = carry
        rng, rng_step = jax.random.split(rng)
        token = jax.lax.cond(
            temperature > 0.0,
            lambda _: jax.random.categorical(rng_step, last_logit / jnp.maximum(temperature, 1e-6), axis=-1),
            lambda _: jnp.argmax(last_logit, axis=-1),
            operand=None,
        )
        output_tokens = put_along_last_axis(
            output_tokens, jnp.broadcast_to(step_idx, (token.shape[0], 1)), token.astype(output_tokens.dtype)
        )
        all_eos = jnp.all(jnp.any(token == PALIGEMMA_EOS_TOKEN, axis=-1))

        token_embedding = _gemma_fast.embed(params["PaliGemma"]["llm"], token, config.dtype)
        positions = prefill_len[:, None] + step_idx + 1
        # Attend to [prefix_start, prefill_size + step + 1): valid prefix + decoded tokens.
        key_pos = jnp.arange(prefill_size + max_decoding_steps)[None, None, :]
        mask = jnp.logical_and(key_pos >= prefix_start[:, None, None], key_pos < prefill_size + step_idx + 1)
        prelogits, cache = _gemma_fast.apply(
            params["PaliGemma"]["llm"],
            config.paligemma_config,
            token_embedding,
            positions,
            mask,
            kv_cache=cache,
            embed_dtype=config.dtype,
        )
        last_logit = _gemma_fast.decode_logits(params["PaliGemma"]["llm"], prelogits).astype(jnp.float32)
        return rng, last_logit, output_tokens, cache, all_eos, step_idx + 1

    def cond(carry):
        _, _, _, _, all_eos, step_idx = carry
        return (~all_eos) & (step_idx < max_decoding_steps)

    _, _, output_tokens, _, _, _ = jax.lax.while_loop(
        cond, step, (rng, last_logit, output_tokens, kv_cache, False, 0)
    )
    return output_tokens
