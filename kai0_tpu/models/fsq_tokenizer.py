"""FSQ action tokenizer: finite-scalar-quantization autoencoder over action chunks.

Functional-JAX equivalent of the reference's flax ``FsqAttentionTokenizer``
(``src/openpi/models/utils/fsq_tokenizer.py``, 472 LoC): an encoder maps an
``[ah, ad]`` action chunk to ``num_tokens`` latent vectors, each quantized by FSQ
(per-dimension bins from the FSQ paper — round to a small integer grid with a
straight-through gradient), and a decoder reconstructs the chunk. Token ids are the
mixed-radix index of the per-dim digits (``FsqCodebook.digitize``, reference
:117-124).

The design is TPU-friendly: everything is dense matmuls with static shapes, jitted
once for tokenize and once for detokenize.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# Bins per latent dim by target codebook size (FSQ paper, reference :44-59).
_FSQ_BINS = {
    2**8: (8, 6, 5),
    2**10: (8, 5, 5, 5),
    2**12: (7, 5, 5, 5, 5),
    2**14: (8, 8, 8, 6, 5),
    2**16: (8, 8, 8, 5, 5, 5),
}


def _mlp_init(rng, sizes):
    import flax.linen as nn

    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, din, dout in zip(keys, sizes[:-1], sizes[1:]):
        params.append(
            {"kernel": nn.initializers.lecun_normal()(k, (din, dout)), "bias": jnp.zeros((dout,))}
        )
    return params


def _mlp(params, x):
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["kernel"].astype(x.dtype)) + layer["bias"].astype(x.dtype)
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


@dataclasses.dataclass(frozen=True)
class FsqConfig:
    action_horizon: int = 50
    action_dim: int = 32
    num_tokens: int = 16
    target_codebook_size: int = 2**10
    hidden: int = 512

    @property
    def bins_per_dim(self) -> tuple[int, ...]:
        if self.target_codebook_size not in _FSQ_BINS:
            raise ValueError(f"Codebook size {self.target_codebook_size} not supported.")
        return _FSQ_BINS[self.target_codebook_size]

    @property
    def latent_dim(self) -> int:
        return len(self.bins_per_dim)

    @property
    def vocab_size(self) -> int:
        v = 1
        for b in self.bins_per_dim:
            v *= b
        return v


def init_params(config: FsqConfig, rng: jax.Array) -> dict:
    k_enc, k_dec = jax.random.split(rng)
    flat = config.action_horizon * config.action_dim
    latent_flat = config.num_tokens * config.latent_dim
    return {
        "encoder": _mlp_init(k_enc, [flat, config.hidden, config.hidden, latent_flat]),
        "decoder": _mlp_init(k_dec, [latent_flat, config.hidden, config.hidden, flat]),
    }


def _quantize(config: FsqConfig, z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """FSQ: bound each dim to [-(b-1)/2, (b-1)/2] via tanh, round with STE.

    Returns (quantized_values [..., L], digits int32 [..., L]).
    """
    bins = jnp.asarray(config.bins_per_dim, dtype=z.dtype)
    half = (bins - 1) / 2
    bounded = jnp.tanh(z) * half
    rounded = jnp.round(bounded)
    quantized = bounded + jax.lax.stop_gradient(rounded - bounded)  # straight-through
    digits = (rounded + half).astype(jnp.int32)
    return quantized, digits


def _digitize(config: FsqConfig, digits: jax.Array) -> jax.Array:
    """Mixed-radix digits [..., L] → token ids [...]."""
    ids = jnp.zeros(digits.shape[:-1], dtype=jnp.int32)
    for i, b in enumerate(config.bins_per_dim):
        ids = ids * b + digits[..., i]
    return ids


def _undigitize(config: FsqConfig, ids: jax.Array) -> jax.Array:
    """Token ids [...] → per-dim quantized values [..., L]."""
    digits = []
    rest = ids
    for b in reversed(config.bins_per_dim):
        digits.append(rest % b)
        rest = rest // b
    digits = jnp.stack(list(reversed(digits)), axis=-1).astype(jnp.float32)
    half = (jnp.asarray(config.bins_per_dim, dtype=jnp.float32) - 1) / 2
    return digits - half


def encode(params: dict, config: FsqConfig, actions: jax.Array) -> jax.Array:
    """[B, ah, ad] → token ids [B, num_tokens]."""
    z = _mlp(params["encoder"], actions.reshape(actions.shape[0], -1))
    z = z.reshape(actions.shape[0], config.num_tokens, config.latent_dim)
    _, digits = _quantize(config, z)
    return _digitize(config, digits)


def decode(params: dict, config: FsqConfig, token_ids: jax.Array) -> jax.Array:
    """Token ids [B, num_tokens] → reconstructed actions [B, ah, ad]."""
    values = _undigitize(config, token_ids)
    flat = _mlp(params["decoder"], values.reshape(token_ids.shape[0], -1))
    return flat.reshape(token_ids.shape[0], config.action_horizon, config.action_dim)


def reconstruction_loss(params: dict, config: FsqConfig, actions: jax.Array) -> jax.Array:
    """Autoencoding MSE through the straight-through quantizer (training objective)."""
    z = _mlp(params["encoder"], actions.reshape(actions.shape[0], -1))
    z = z.reshape(actions.shape[0], config.num_tokens, config.latent_dim)
    quantized, _ = _quantize(config, z)
    flat = _mlp(params["decoder"], quantized.reshape(actions.shape[0], -1))
    recon = flat.reshape(actions.shape)
    return jnp.mean(jnp.square(recon - actions))
