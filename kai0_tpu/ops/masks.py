"""Attention-mask and positional-embedding primitives.

Parity: reference ``src/openpi/models/pi0.py:19-63`` (big_vision-style block-causal
mask from a cumulative AR mask; scalar sine-cosine positional embedding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_attn_mask(input_mask: jax.Array, mask_ar: jax.Array) -> jax.Array:
    """Build a ``bool[B, T, T]`` attention mask from validity + autoregressive masks.

    Tokens can attend to valid input tokens whose cumulative ``mask_ar`` is <= theirs:

    - ``[[1 1 1 1]]``: causal attention.
    - ``[[0 0 1 1]]``: prefix-lm (first block bidirectional, rest causal).
    - ``[[1 0 1 0]]``: block-causal between 2-token blocks.

    Args:
      input_mask: bool[B, N], True for real input tokens, False for padding.
      mask_ar: bool-ish[?B, N], True where previous tokens cannot depend on this token
        (i.e. this token starts a new attention block).
    """
    mask_ar = jnp.broadcast_to(mask_ar, input_mask.shape)
    cumsum = jnp.cumsum(mask_ar, axis=1)
    attn_mask = cumsum[:, None, :] <= cumsum[:, :, None]
    valid_mask = input_mask[:, None, :] * input_mask[:, :, None]
    return jnp.logical_and(attn_mask, valid_mask)


def posemb_sincos(pos: jax.Array, embedding_dim: int, min_period: float, max_period: float) -> jax.Array:
    """Sine-cosine positional embedding for scalar positions ``pos: f32[b]`` -> ``f32[b, d]``."""
    if embedding_dim % 2 != 0:
        raise ValueError(f"embedding_dim ({embedding_dim}) must be divisible by 2")
    fraction = jnp.linspace(0.0, 1.0, embedding_dim // 2)
    period = min_period * (max_period / min_period) ** fraction
    sinusoid_input = jnp.einsum(
        "i,j->ij", pos, 1.0 / period * 2 * jnp.pi, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.concatenate([jnp.sin(sinusoid_input), jnp.cos(sinusoid_input)], axis=-1)


def apply_rope(x: jax.Array, *, positions: jax.Array, max_wavelength: float = 10_000) -> jax.Array:
    """RoPE for ``x: [B, L, H, D]`` with ``positions: [B, L]``; computed in f32, cast back.

    Parity: reference gemma.py:424-440 (f32 sin/cos then downcast to the input dtype).
    """
    freq_exponents = (2.0 / x.shape[-1]) * jnp.arange(x.shape[-1] // 2, dtype=jnp.float32)
    timescale = max_wavelength**freq_exponents
    radians = positions[..., None].astype(jnp.float32) / timescale[None, None, :]
    radians = radians[..., None, :]
    sin, cos = jnp.sin(radians), jnp.cos(radians)
    x1, x2 = jnp.split(x, 2, axis=-1)
    res = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return res.astype(x.dtype)
