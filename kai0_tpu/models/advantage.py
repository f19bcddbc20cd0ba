"""Advantage (stage-progress) estimator — a value head on the π₀ action expert.

The reference implements this as a PyTorch subclass of its torch π₀ mirror
(``src/openpi/models_pytorch/pi0_pytorch.py:464-644``); this framework is
single-idiom JAX, so it is a head over the same functional π₀ trunk:

- value head = Linear(w,w) → SiLU → Linear(w,w) → SiLU → Linear(w,1) → Tanh over the
  *first suffix token's* final representation (:470-481, 569-572);
- loss = ``loss_action_weight``·flow-MSE + ``loss_value_weight``·MSE(value_pred,
  clamp(progress, −1, 1)) where ``progress`` is the Δ stage-progress target produced
  by the advantage dataset (:561-587);
- image augmentation is disabled for estimator training (:487);
- ``sample_values``: one full forward with random noisy actions/time, returning the
  value prediction (:596-644).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from kai0_tpu.models import gemma as _gemma
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as _pi0
from kai0_tpu.ops.masks import make_attn_mask


@dataclasses.dataclass(frozen=True)
class AdvantageEstimatorConfig(_pi0.Pi0Config):
    loss_action_weight: float = 1.0
    loss_value_weight: float = 1.0

    def init_params(self, rng: jax.Array) -> dict:
        rng, head_rng = jax.random.split(rng)
        params = _pi0.init_params(self, rng)
        width = self.action_expert_config.width
        k1, k2, k3 = jax.random.split(head_rng, 3)
        params["value_head"] = {
            "Dense_0": _pi0._linear_init(k1, width, width),
            "Dense_1": _pi0._linear_init(k2, width, width),
            "Dense_2": _pi0._linear_init(k3, width, 1),
        }
        return params

    def compute_loss(self, params, rng, observation, actions, *, train: bool = False):
        return compute_loss(params, self, rng, observation, actions, train=train)

    def sample_values(self, params, rng, observation):
        return sample_values(params, self, rng, observation)


def _value_head(params: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.silu(_pi0._linear(params["Dense_0"], x))
    h = jax.nn.silu(_pi0._linear(params["Dense_1"], h))
    return jnp.tanh(_pi0._linear(params["Dense_2"], h))


def _suffix_forward(params, config, observation, x_t, time):
    """Full prefix+suffix forward; returns the suffix expert's output tokens."""
    prefix_tokens, prefix_mask, prefix_ar_mask = _pi0.embed_prefix(params, config, observation)
    suffix_tokens, suffix_mask, suffix_ar_mask, adarms_cond = _pi0.embed_suffix(
        params, config, observation, x_t, time
    )
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
    return suffix_out


def compute_loss(params, config: AdvantageEstimatorConfig, rng, observation, actions, *, train: bool = False):
    """Weighted flow-matching + value loss, per (batch, action step).

    Returns the combined loss; auxiliary components are available via
    ``compute_loss_and_aux``.
    """
    loss, _ = compute_loss_and_aux(params, config, rng, observation, actions, train=train)
    return loss


def compute_loss_and_aux(params, config, rng, observation, actions, *, train: bool = False):
    _, noise_rng, time_rng = jax.random.split(rng, 3)
    # No image augmentation for estimator training (reference :487).
    observation = _model.preprocess_observation(None, observation, train=False)

    batch_shape = actions.shape[:-2]
    noise = jax.random.normal(noise_rng, actions.shape)
    time = jax.random.beta(time_rng, 1.5, 1, batch_shape) * 0.999 + 0.001
    time_expanded = time[..., None, None]
    x_t = time_expanded * noise + (1 - time_expanded) * actions
    u_t = noise - actions

    suffix_out = _suffix_forward(params, config, observation, x_t, time)
    v_t = _pi0._linear(
        params["action_out_proj"], suffix_out[:, -config.action_horizon :].astype(jnp.float32)
    )
    loss_action = jnp.mean(jnp.square(v_t - u_t), axis=-1)  # [B, AH]

    # Value head over the first suffix token's representation.
    deep_rep = suffix_out[:, 0, :].astype(jnp.float32)
    value_pred = _value_head(params["value_head"], deep_rep)  # [B, 1]
    progress_tgt = jnp.clip(observation.progress.astype(jnp.float32), -1.0, 1.0)[:, None]
    loss_value = jnp.square(value_pred - progress_tgt)  # [B, 1]

    loss = loss_action * config.loss_action_weight + loss_value * config.loss_value_weight
    aux = {"loss_action": jnp.mean(loss_action), "loss_value": jnp.mean(loss_value)}
    return loss, aux


def sample_values(params, config: AdvantageEstimatorConfig, rng, observation) -> jax.Array:
    """Predict progress value for a batch of observations. Returns [B, 1]."""
    observation = _model.preprocess_observation(None, observation, train=False)
    noise_rng, time_rng = jax.random.split(rng)
    batch_size = observation.state.shape[0]
    noise = jax.random.normal(noise_rng, (batch_size, config.action_horizon, config.action_dim))
    time = jax.random.beta(time_rng, 1.5, 1, (batch_size,)) * 0.999 + 0.001
    suffix_out = _suffix_forward(params, config, observation, noise, time)
    deep_rep = suffix_out[:, 0, :].astype(jnp.float32)
    return _value_head(params["value_head"], deep_rep)
