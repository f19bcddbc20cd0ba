"""π₀-RTC: real-time-chunking guided sampling — functional JAX, TPU-first.

Same architecture and loss as π₀/π₀.₅; only ``sample_actions`` differs. Behavioral
parity with reference ``src/openpi/models/pi0_rtc.py:233-360``:

- prefix-weight schedules ones/zeros/linear/exp over ``[inference_delay,
  execute_horizon)`` (``get_prefix_weights``, :47-61);
- per-step ``jax.vjp`` through the denoiser: the action endpoint estimate is
  ``x̂₁ = x_t − t·v_t``; the pseudo-inverse correction pulls it toward
  ``prev_action_chunk`` on the weighted steps;
- guidance weight ``min(c·inv_r2, max_guidance_weight)`` with τ = 1−t (:329-349);
- only the first ``min(14, provided)`` action dims are guided (:319-321);
- ``jax.lax.scan`` over exactly ``num_steps`` Euler steps t=1→0 (:355-358);
- NaN scrubbing of velocities, the incoming chunk, and the final actions.

``inference_delay``/``execute_horizon`` are traced as arrays (clipped with
``jnp.clip``), so per-request changes never trigger recompilation (reference
:299-307; SURVEY.md hard-part #5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as _pi0


def get_prefix_weights(start, end, total: int, schedule: str) -> jax.Array:
    """Per-step guidance weights: 1 before ``start``, 0 from ``end``, scheduled between."""
    start = jnp.minimum(start, end)
    end = jnp.asarray(end)
    if schedule == "ones":
        w = jnp.ones(total)
    elif schedule == "zeros":
        w = (jnp.arange(total) < start).astype(jnp.float32)
    elif schedule in ("linear", "exp"):
        w = jnp.clip((start - 1 - jnp.arange(total)) / (end - start + 1) + 1, 0, 1)
        if schedule == "exp":
            w = w * jnp.expm1(w) / (jnp.e - 1)
    else:
        raise ValueError(f"Invalid schedule: {schedule}")
    return jnp.where(jnp.arange(total) >= end, 0, w)


@dataclasses.dataclass(frozen=True)
class Pi0RTCConfig(_pi0.Pi0Config):
    """π₀/π₀.₅ with RTC-capable sampling. Set ``pi05=True`` for PI05_RTC."""

    @property
    def model_type(self) -> _model.ModelType:
        return _model.ModelType.PI05_RTC if self.pi05 else _model.ModelType.PI0_RTC

    def sample_actions(self, params, rng, observation, **kwargs):
        return sample_actions(params, self, rng, observation, **kwargs)


def _scrub(x):
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def sample_actions(
    params,
    config: Pi0RTCConfig,
    rng,
    observation,
    *,
    num_steps: int = 10,
    noise=None,
    prev_action_chunk=None,
    inference_delay=None,
    execute_horizon=None,
    mask_prefix_delay: bool = False,
    prefix_attention_schedule: str = "exp",
    max_guidance_weight: float = 0.5,
    enable_rtc: bool = True,
):
    observation = _model.preprocess_observation(None, observation, train=False)
    dt = -1.0 / num_steps
    batch_size = observation.state.shape[0]
    action_horizon, action_dim = config.action_horizon, config.action_dim
    if noise is None:
        noise = jax.random.normal(rng, (batch_size, action_horizon, action_dim))

    kv_cache, prefix_mask = _pi0.compute_prefix_kv_cache(params, config, observation)

    def velocity(x_t, time):
        return _pi0.compute_velocity(params, config, observation, kv_cache, prefix_mask, x_t, time)

    use_rtc = enable_rtc and prev_action_chunk is not None

    if use_rtc:
        prev_chunk = jnp.asarray(prev_action_chunk, dtype=noise.dtype)
        if prev_chunk.ndim == 2:
            prev_chunk = prev_chunk[None, ...]
        provided_dim_before_pad = prev_chunk.shape[-1]
        prev_chunk = _scrub(prev_chunk)
        # Align the provided chunk to the model action dim (clients send robot dims).
        if prev_chunk.shape[-1] > action_dim:
            prev_chunk = prev_chunk[..., :action_dim]
        elif prev_chunk.shape[-1] < action_dim:
            pad = jnp.zeros((*prev_chunk.shape[:-1], action_dim - prev_chunk.shape[-1]), prev_chunk.dtype)
            prev_chunk = jnp.concatenate([prev_chunk, pad], axis=-1)

        exec_h = jnp.clip(
            jnp.asarray(execute_horizon if execute_horizon is not None else action_horizon),
            1,
            action_horizon,
        )
        exec_h = jnp.minimum(exec_h, prev_chunk.shape[1])
        d = jnp.clip(jnp.asarray(0 if inference_delay is None else inference_delay), 0, action_horizon)

        # Guide only the dims the client actually controls (≤14 joints+gripper).
        provided_dim = min(14, provided_dim_before_pad, action_dim)
        dim_mask = (jnp.arange(action_dim) < provided_dim).astype(prev_chunk.dtype)[None, None, :]
        weights = get_prefix_weights(d, exec_h, action_horizon, prefix_attention_schedule)

    def base_step(carry, _):
        x_t, time = carry
        v_t = _scrub(velocity(x_t, time))
        return (x_t + dt * v_t, time + dt), None

    def rtc_step(carry, _):
        x_t, time = carry

        x_t_for_denoise = x_t
        if mask_prefix_delay and provided_dim > 0:
            # Freeze the still-executing delay prefix to the previous chunk.
            mask_time = (jnp.arange(action_horizon) < d)[None, :, None]
            overwrite = jnp.where(mask_time, prev_chunk[..., :provided_dim], x_t[..., :provided_dim])
            x_t_for_denoise = x_t.at[..., :provided_dim].set(overwrite)

        def denoiser(x_local):
            v_local = velocity(x_local, time)
            # Flow training direction is action → noise: the action endpoint
            # estimate from (x_t, v_t) is x̂₁ = x_t − t·v_t.
            return x_local - time * v_local, v_local

        x_1, vjp_fun, v_local = jax.vjp(denoiser, x_t_for_denoise, has_aux=True)
        error = (prev_chunk - x_1) * weights[None, :, None] * dim_mask
        pinv_correction = vjp_fun(error)[0]

        # LeRobot-RTC guidance weight: τ = 1−t, capped at max_guidance_weight.
        tau = 1.0 - time
        tau_safe = jnp.clip(tau, 1e-3, 1.0)
        squared_one_minus_tau = (1 - tau_safe) ** 2
        inv_r2 = (squared_one_minus_tau + tau_safe**2) / squared_one_minus_tau
        c = jnp.nan_to_num((1 - tau_safe) / tau_safe, posinf=max_guidance_weight)
        guidance_weight = jnp.minimum(c * inv_r2, max_guidance_weight)

        v_t = _scrub(v_local - guidance_weight * pinv_correction)
        return (x_t + dt * v_t, time + dt), None

    step = rtc_step if use_rtc else base_step
    (x_0, _), _ = jax.lax.scan(step, (noise, 1.0), xs=None, length=num_steps)
    return _scrub(x_0)
