"""Fused multi-query attention kernel for the π₀ prefix-LM hot shapes (Pallas/TPU).

The π₀ family uses Gemma attention with ``num_kv_heads == 1`` (MQA) and sequences of
~1k tokens (3×256 image + ≤200 text + ≤51 action tokens; reference
``src/openpi/models/gemma.py:216-231``). The XLA fallback (``mha_reference``)
materializes the f32 logits tensor ``[B, N, T, S]`` in HBM between the two matmuls;
this kernel keeps logits resident in VMEM, fusing QKᵀ → mask → softmax → PV into a
single pass per (batch, q-block) grid cell.

MQA lets all query heads share one K/V load: queries are folded into the row
dimension (``[T_b·N, H]``) so QKᵀ is one large MXU matmul per block instead of N
small ones.

Numerics match ``mha_reference``: f32 logit accumulation, the Gemma ``big_neg`` mask
constant, f32 softmax, probabilities cast back to the activation dtype before the PV
matmul (f32 accumulation).

The backward pass delegates to the XLA reference path via ``jax.custom_vjp`` — under
the training loop's ``nothing_saveable`` remat, attention inputs are recomputed
anyway, and the XLA-generated gradient keeps training numerics identical to the
fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -2.3819763e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mqa_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int):
    """One (batch, q-block) cell: q [T_b, N, H], k/v [S, H], mask [T_b, S]."""
    t_b, _, head_dim = q_ref.shape

    # Fold heads into rows (t-major: row = t*N + n) → one big MXU matmul.
    q = q_ref[...].reshape(t_b * num_heads, head_dim)
    logits = jax.lax.dot_general(
        q,
        k_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T_b*N, S]

    # Row t*N+n uses mask[t]; repeat along axis 0 matches the t-major row layout.
    mask = jnp.repeat(mask_ref[...], num_heads, axis=0)
    logits = jnp.where(mask, logits, BIG_NEG)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype),
        v_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T_b*N, H]
    o_ref[...] = out.reshape(t_b, num_heads, head_dim).astype(o_ref.dtype)


def _mqa_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array, *, block_t: int) -> jax.Array:
    """q [B,T,N,H], k/v [B,S,H], mask bool[B,T,S] → [B,T,N,H]."""
    b, t, n, h = q.shape
    s = k.shape[1]

    t_pad = _round_up(t, block_t)
    s_pad = _round_up(s, 128)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0)))
        # Padded keys masked out; padded query rows see an all-False mask, which
        # softmaxes to a uniform garbage row that the final slice drops.
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - s)))

    grid = (b, t_pad // block_t)
    kernel = functools.partial(_mqa_kernel, num_heads=n)
    itemsize = np.dtype(q.dtype).itemsize

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t, s_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, n, h), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * s_pad * n * h,
            bytes_accessed=(q.size + k.size + v.size + b * t_pad * n * h) * itemsize + mask.size,
            transcendentals=b * t_pad * s_pad * n,
        ),
    )(q, k, v, mask)
    return out[:, :t]


def _normalize_mask(attn_mask: jax.Array, b: int, t: int, s: int) -> jax.Array:
    if attn_mask.ndim == 4:  # [B, 1, T, S]
        attn_mask = attn_mask[:, 0]
    return jnp.broadcast_to(attn_mask, (b, t, s))


def _pick_block_t(t: int) -> int:
    # Logits VMEM footprint per block: block_t · N · S_pad · 4 bytes. For the π₀
    # shapes (N=8, S≈1.1k) block_t=128 keeps it ≈4.5 MiB. Short suffixes (the
    # denoise loop, T≈51) fit a single 64-row block.
    return 64 if t <= 64 else 128


def _flash_mha_fwd_only(q, k, v, attn_mask):
    b, t, n, h = q.shape
    s = k.shape[1]
    mask = _normalize_mask(attn_mask, b, t, s)
    return _mqa_fwd_impl(q, k.reshape(b, s, h), v.reshape(b, s, h), mask, block_t=_pick_block_t(t))


@jax.custom_vjp
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Fused MQA attention. q [B,T,N,H] (already RoPE'd+scaled), k/v [B,S,1,H].

    Dispatch/fallback policy lives in ``kai0_tpu.ops.attention.mha``; this function
    assumes MQA (one KV head) on a TPU backend.
    """
    return _flash_mha_fwd_only(q, k, v, attn_mask)


def _flash_mha_vjp_fwd(q, k, v, attn_mask):
    return _flash_mha_fwd_only(q, k, v, attn_mask), (q, k, v, attn_mask)


def _flash_mha_vjp_bwd(residuals, g):
    from kai0_tpu.ops import attention as _attention

    q, k, v, attn_mask = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention.mha_reference(q_, k_, v_, attn_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_mha.defvjp(_flash_mha_vjp_fwd, _flash_mha_vjp_bwd)
