"""Single-expert Gemma with a fixed-size in-place decode KV cache (π₀-FAST).

Functional counterpart of reference ``src/openpi/models/gemma_fast.py``: the same
parameter tree as the multi-expert Gemma with one expert (bare big_vision names —
``layers/attn/q_einsum`` …, ``final_norm``, ``embedder``), so PaliGemma checkpoints
load 1:1 via :mod:`kai0_tpu.models.gemma`'s ``init``.

Decode design (parity with reference :165-185): the KV cache is allocated once at
prefill with capacity ``prefill_size + max_decoding_steps`` and each decode step
writes one token in place via ``jax.lax.dynamic_update_slice`` — no concatenation,
so the decode loop runs with static shapes inside ``jax.lax.while_loop``.

Numerics: f32 RoPE and attention logits, Gemma big_neg masking, f32 softmax cast
back to the activation dtype (reference :186-226).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from kai0_tpu.models import gemma as _gemma
from kai0_tpu.models import lora as _lora
from kai0_tpu.ops import masks as _masks
from kai0_tpu.ops.attention import BIG_NEG

Config = _gemma.Config
get_config = _gemma.get_config


def init(rng: jax.Array, config: Config) -> dict:
    """Single-expert init — same names as expert 0 of the multi-expert tree."""
    return _gemma.init(rng, [config], [False])


@dataclasses.dataclass
class KVCache:
    """Stacked per-layer cache: k/v [L, B, S_cache, K, H]; idx = next write offset."""

    idx: jax.Array  # int32 [B]
    k: jax.Array
    v: jax.Array


jax.tree_util.register_dataclass(KVCache, data_fields=["idx", "k", "v"], meta_fields=[])


def _qkv(attn_params: dict, config: Config, x: jax.Array):
    if config.num_kv_heads == config.num_heads:
        q, k, v = _lora.apply_einsum(attn_params["qkv_einsum"], "BSD,3KDH->3BSKH", x, config.lora_attn)
    else:
        q = _lora.apply_einsum(attn_params["q_einsum"], "BTD,NDH->BTNH", x, config.lora_attn)
        k, v = _lora.apply_einsum(attn_params["kv_einsum"], "BSD,2KDH->2BSKH", x, config.lora_attn)
    return q, k, v


def _attend(q, k, v, attn_mask, config: Config, dtype):
    b, t, n, h = q.shape
    kv_heads = config.num_kv_heads
    q = q.reshape(b, t, kv_heads, n // kv_heads, h)
    logits = jnp.einsum("BTKGH,BSKH->BKGTS", q, k, preferred_element_type=jnp.float32)
    masked = jnp.where(attn_mask[:, :, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(masked, axis=-1).astype(dtype)
    encoded = jnp.einsum("BKGTS,BSKH->BTKGH", probs, v)
    return encoded.reshape(b, t, n, h)


def _block(layer_params, config: Config, x, layer_kv, positions, attn_mask, *, write_idx, cache_size):
    """One block. layer_kv = (k_cache, v_cache) or None (prefill: allocate)."""
    dtype = x.dtype
    normed, _ = _gemma._rms_norm(layer_params["pre_attention_norm"], x, None)

    q, k, v = _qkv(layer_params["attn"], config, normed)
    q = _masks.apply_rope(q, positions=positions)
    q *= config.head_dim**-0.5
    k = _masks.apply_rope(k, positions=positions)

    if layer_kv is None:
        # Prefill: cache capacity = attn mask's key length.
        pad = cache_size - k.shape[1]
        k_cache = jnp.pad(k.astype(dtype), ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v.astype(dtype), ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        k_cache, v_cache = layer_kv
        k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, write_idx, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, write_idx, 0, 0))

    encoded = _attend(q, k_cache, v_cache, attn_mask, config, dtype)
    attn_out = _lora.apply_einsum(
        layer_params["attn"]["attn_vec_einsum"], "BTNH,NHD->BTD", encoded, config.lora_attn
    )
    x = x + attn_out

    normed, _ = _gemma._rms_norm(layer_params["pre_ffw_norm"], x, None)
    x = x + _lora.apply_ffn(layer_params["mlp"], normed)
    return x, (k_cache, v_cache)


def apply(
    params: dict,
    config: Config,
    embedded: jax.Array,  # [B, T, D]
    positions: jax.Array,  # [B, T]
    mask: jax.Array,  # bool [B, T, S_cache] (or [B, 1, T, S])
    *,
    kv_cache: KVCache | None = None,
    embed_dtype: str = "bfloat16",
):
    """Run the stack. Returns (prelogits f32-normed [B, T, D], KVCache).

    Prefill: ``kv_cache=None``; cache capacity = ``mask.shape[-1]`` (pad the mask's
    key axis to prefill+max_decode). Decode: pass the cache back with T == 1.
    """
    x = embedded.astype(embed_dtype)
    if mask.ndim == 3:
        mask = mask[:, None, :, :]
    cache_size = mask.shape[-1]

    if kv_cache is None:
        write_idx = jnp.asarray(0, jnp.int32)  # unused in prefill
        # After prefill the next write lands at prefill_size (reference :165-173).
        next_idx = jnp.full((embedded.shape[0],), embedded.shape[1], jnp.int32)

        def body(x, layer_params):
            x, layer_kv = _block(
                layer_params, config, x, None, positions, mask, write_idx=write_idx, cache_size=cache_size
            )
            return x, layer_kv

        x, (k_all, v_all) = jax.lax.scan(body, x, params["layers"])
        new_cache = KVCache(idx=next_idx, k=k_all, v=v_all)
    else:
        write_idx = kv_cache.idx[0]

        def body(x, scanned):
            layer_params, layer_k, layer_v = scanned
            x, layer_kv = _block(
                layer_params,
                config,
                x,
                (layer_k, layer_v),
                positions,
                mask,
                write_idx=write_idx,
                cache_size=cache_size,
            )
            return x, layer_kv

        x, (k_all, v_all) = jax.lax.scan(body, x, (params["layers"], kv_cache.k, kv_cache.v))
        new_cache = KVCache(idx=kv_cache.idx + embedded.shape[1], k=k_all, v=v_all)

    prelogits, _ = _gemma._rms_norm(params["final_norm"], x, None)
    return prelogits, new_cache


def embed(params: dict, tokens: jax.Array, embed_dtype: str = "bfloat16") -> jax.Array:
    return _gemma.embed(params, tokens, embed_dtype)


def decode_logits(params: dict, x: jax.Array) -> jax.Array:
    return _gemma.decode_logits(params, x)
