"""Fused multi-query attention (forward + backward) for the π₀ prefix-LM shapes.

The π₀ family uses Gemma attention with ``num_kv_heads == 1`` (MQA) and sequences of
~1k tokens (3×256 image + ≤200 text + ≤51 action tokens; reference
``src/openpi/models/gemma.py:216-231``). The XLA fallback (``mha_reference``)
materializes the f32 logits tensor ``[B, N, T, S]`` in HBM between the two matmuls —
~400 MB per layer at batch 12 — which makes both forward and backward HBM-bound.
These kernels keep logits resident in VMEM:

- Forward: QKᵀ → mask → softmax → PV in one pass per (batch, q-block) grid cell,
  additionally emitting the per-row logsumexp needed by the backward.
- Backward (flash-attention style): per (batch, q-block) cell recomputes the
  probabilities from (q, k, lse), then forms dV += PᵀdO, dP = dO Vᵀ,
  dS = P·(dP − rowsum(dO·O)), dQ = dS·K and dK += dSᵀ·Q. dK/dV accumulate in a
  VMEM-resident f32 block that stays pinned across the q-block (innermost) grid
  dimension and flushes once per batch row.

MQA lets all query heads share one K/V load: queries are folded into the row
dimension (``[T_b·N, H]``) so QKᵀ is one large MXU matmul per block instead of N
small ones.

Numerics match ``mha_reference`` in forward: f32 logit accumulation, the Gemma
``big_neg`` mask constant, f32 softmax, probabilities cast back to the activation
dtype before the PV matmul (f32 accumulation). The backward accumulates in f32 with
bf16 MXU inputs (standard flash-attention precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kai0_tpu import knobs as _knobs

BIG_NEG = -2.3819763e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _mqa_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, num_heads: int):
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

    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / denom
    lse = row_max + jnp.log(denom)  # [T_b*N, 1]

    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype),
        v_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T_b*N, H]
    o_ref[...] = out.reshape(t_b, num_heads, head_dim).astype(o_ref.dtype)
    # lse stays in the folded [rows, 1] layout — Mosaic does not support merging the
    # lane dim (N) into sublanes, so it is never reshaped to [T_b, N].
    lse_ref[...] = lse


def _mqa_fwd_impl(q, k, v, mask, *, block_t: int):
    """q [B,T,N,H], k/v [B,S,H], mask bool[B,T,S] → (out [B,T,N,H], lse f32[B,T_pad,N])."""
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
    kernel = functools.partial(_mqa_fwd_kernel, num_heads=n)
    itemsize = np.dtype(q.dtype).itemsize

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t, s_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t * n, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, n, h), q.dtype),
            jax.ShapeDtypeStruct((b, t_pad * n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * s_pad * n * h,
            bytes_accessed=(q.size + k.size + v.size + b * t_pad * n * h) * itemsize + mask.size,
            transcendentals=b * t_pad * s_pad * n,
        ),
        compiler_params=_mqa_compiler_params(block_t),
    )(q, k, v, mask)
    return out[:, :t], lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _mqa_bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref, *, num_heads: int
):
    """One (batch, q-block) cell of the flash backward.

    dk_ref/dv_ref map the same [S, H] f32 block for every q-block cell of a batch
    row, so they stay VMEM-resident and accumulate across the innermost grid dim.
    """
    t_b, _, head_dim = q_ref.shape
    rows = t_b * num_heads
    j = pl.program_id(1)

    q = q_ref[...].reshape(rows, head_dim)
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...].reshape(rows, head_dim)
    o = o_ref[...].reshape(rows, head_dim)
    lse = lse_ref[...]  # already [rows, 1]

    # Recompute probabilities from q, k, lse (no [T,S] tensor ever hits HBM).
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    mask = jnp.repeat(mask_ref[...], num_heads, axis=0)
    logits = jnp.where(mask, logits, BIG_NEG)
    p = jnp.exp(logits - lse)  # [rows, S] f32; masked positions exp(BIG_NEG - lse) = 0

    p_lp = p.astype(v.dtype)
    # dV += Pᵀ dO
    dv_contrib = jax.lax.dot_general(
        p_lp, do, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, H]
    # dP = dO Vᵀ
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [rows, S]
    # delta_i = Σ_h dO_ih · O_ih
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)  # [rows, S]

    # dQ = dS K
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[...] = dq.reshape(t_b, num_heads, head_dim).astype(dq_ref.dtype)

    # dK += dSᵀ Q
    dk_contrib = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, H]

    @pl.when(j == 0)
    def _():
        dk_ref[...] = dk_contrib
        dv_ref[...] = dv_contrib

    @pl.when(j > 0)
    def _():
        dk_ref[...] += dk_contrib
        dv_ref[...] += dv_contrib


def _mqa_bwd_impl(q, k, v, mask, out, lse, g, *, block_t: int):
    """Gradients for (q [B,T,N,H], k [B,S,H], v [B,S,H]). g is the cotangent of out."""
    b, t, n, h = q.shape
    s = k.shape[1]
    t_pad = _round_up(t, block_t)
    s_pad = _round_up(s, 128)
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        # Zero cotangent on padded rows → their dq/dk/dv contributions vanish.
        g = jnp.pad(g, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - s)))

    grid = (b, t_pad // block_t)
    kernel = functools.partial(_mqa_bwd_kernel, num_heads=n)
    itemsize = np.dtype(q.dtype).itemsize

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t, s_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t * n, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_t, n, h), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, h), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, n, h), q.dtype),
            jax.ShapeDtypeStruct((b, s_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((b, s_pad, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * t_pad * s_pad * n * h,
            bytes_accessed=3 * (q.size + k.size + v.size) * itemsize + mask.size,
            transcendentals=b * t_pad * s_pad * n,
        ),
        compiler_params=_mqa_compiler_params(block_t),
    )(q, k, v, mask, out, lse, g)
    return dq[:, :t], dk[:, :s].astype(k.dtype), dv[:, :s].astype(v.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


def _normalize_mask(attn_mask: jax.Array, b: int, t: int, s: int) -> jax.Array:
    if attn_mask.ndim == 4:  # [B, 1, T, S]
        attn_mask = attn_mask[:, 0]
    return jnp.broadcast_to(attn_mask, (b, t, s))


def _pick_block_t(t: int) -> int:
    # Backward VMEM per block: ~4 live [block_t·N, S_pad] f32 tensors. For the π₀
    # shapes (N=8, S≈1.1k) block_t=64 keeps that ≈8 MiB; short suffixes (denoise
    # loop, T≈51) fit one block. KAI0_FLASH_BLOCK_T is an A/B knob (128 doubles the
    # per-cell matmul height at ~17 MiB scoped VMEM — the calls raise the Mosaic
    # limit to 48 MiB when block_t > 64; v5e has 128 MiB).
    return _knobs.get().flash_block_t


def _pick_block_t_bwd(t: int) -> int:
    # The backward kernel has ~2.5× the fwd's matmuls per K/V load: a taller
    # q-block amortizes the K/V streaming + dk/dv accumulate read-modify-write
    # across more MXU work. Defaults to the fwd block; independent A/B knob
    # (measured neutral at 128 on the batch-14 step, PERF.md round 3).
    return _knobs.get().flash_block_t_bwd or _pick_block_t(t)


def _mqa_compiler_params(block_t: int):
    if block_t > 64:
        return pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20)
    return None


@jax.custom_vjp
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Fused MQA attention. q [B,T,N,H] (already RoPE'd+scaled), k/v [B,S,1,H].

    Dispatch/fallback policy lives in ``kai0_tpu.ops.attention.mha``; this function
    assumes MQA (one KV head) on a TPU backend.
    """
    b, t, n, h = q.shape
    s = k.shape[1]
    mask = _normalize_mask(attn_mask, b, t, s)
    out, _ = _mqa_fwd_impl(q, k.reshape(b, s, h), v.reshape(b, s, h), mask, block_t=_pick_block_t(t))
    return out


def _flash_mha_vjp_fwd(q, k, v, attn_mask):
    b, t, n, h = q.shape
    s = k.shape[1]
    mask = _normalize_mask(attn_mask, b, t, s)
    out, lse = _mqa_fwd_impl(q, k.reshape(b, s, h), v.reshape(b, s, h), mask, block_t=_pick_block_t(t))
    # KAI0_REMAT=attnres saves these kernel residuals, so the backward pass runs
    # the bwd kernel directly instead of re-executing the fwd kernel to
    # regenerate (out, lse) — see gemma._remat_policy.
    out = _checkpoint_name(out, "kai0_attn_res")
    lse = _checkpoint_name(lse, "kai0_attn_res")
    return out, (q, k, v, mask, out, lse)


def _flash_mha_vjp_bwd(residuals, g):
    q, k, v, mask, out, lse = residuals
    b, t, n, h = q.shape
    s = k.shape[1]
    dq, dk, dv = _mqa_bwd_impl(
        q, k.reshape(b, s, h), v.reshape(b, s, h), mask, out, lse, g,
        block_t=_pick_block_t_bwd(t),
    )
    return dq, dk.reshape(k.shape), dv.reshape(v.shape), None


flash_mha.defvjp(_flash_mha_vjp_fwd, _flash_mha_vjp_bwd)


# ---------------------------------------------------------------------------
# Dense multi-head attention (SigLIP): no mask, per-head K/V, batched 3D dots
# ---------------------------------------------------------------------------


def _mhsa_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
    """One (batch, q-block) cell: q [N, T_b, H], k/v [N, S, H] (dense, unmasked)."""
    q = q_ref[...]
    logits = jax.lax.dot_general(
        q, k_ref[...], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [N, T_b, S]
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / denom
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [N, T_b, H]
    o_ref[...] = out.astype(o_ref.dtype)
    lse_ref[...] = row_max + jnp.log(denom)


def _mhsa_bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref):
    """Flash backward for the dense MHA layout; dk/dv accumulate across q blocks."""
    j = pl.program_id(1)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    o = o_ref[...]
    lse = lse_ref[...]  # [N, T_b, 1]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    p = jnp.exp(logits - lse)  # [N, T_b, S]

    p_lp = p.astype(v.dtype)
    dv_contrib = jax.lax.dot_general(
        p_lp, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [N, S, H]
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [N, T_b, S]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)

    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_contrib = jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [N, S, H]

    @pl.when(j == 0)
    def _():
        dk_ref[...] = dk_contrib
        dv_ref[...] = dv_contrib

    @pl.when(j > 0)
    def _():
        dk_ref[...] += dk_contrib
        dv_ref[...] += dv_contrib


def _mhsa_block_t(t: int) -> int:
    return t if t <= 128 else 128


def _mhsa_specs(b, n, t, s, h, block_t):
    in_specs = [
        pl.BlockSpec((None, n, block_t, h), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, s, h), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, s, h), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    return in_specs


def _mhsa_fwd_impl(q, k, v):
    """q/k/v [B, N, T, H] head-major; dense softmax. Returns (out, lse)."""
    b, n, t, h = q.shape
    s = k.shape[2]
    block_t = _mhsa_block_t(t)
    grid = (b, t // block_t)
    out, lse = pl.pallas_call(
        _mhsa_fwd_kernel,
        grid=grid,
        in_specs=_mhsa_specs(b, n, t, s, h, block_t),
        out_specs=[
            pl.BlockSpec((None, n, block_t, h), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, block_t, 1), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
            jax.ShapeDtypeStruct((b, n, t, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * t * s * h,
            bytes_accessed=3 * q.size * np.dtype(q.dtype).itemsize,
            transcendentals=b * n * t * s,
        ),
    )(q, k, v)
    return out, lse


def _mhsa_bwd_impl(q, k, v, out, lse, g):
    b, n, t, h = q.shape
    s = k.shape[2]
    # The backward keeps ~4 [N, T_b, S] f32 tensors live; T_b=64 stays under the
    # 16 MiB VMEM scoped limit for the SigLIP shapes (N=16, S=256) — the call
    # below raises the limit to 32 MiB, so taller blocks are A/B-able
    # (128 measured +0.3% on the batch-14 step; bench default, PERF.md round 3).
    block_t = _knobs.get().siglip_block_t_bwd or min(_mhsa_block_t(t), 64)
    grid = (b, t // block_t)
    dq, dk, dv = pl.pallas_call(
        _mhsa_bwd_kernel,
        grid=grid,
        in_specs=_mhsa_specs(b, n, t, s, h, block_t)
        + [
            pl.BlockSpec((None, n, block_t, h), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, block_t, 1), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, block_t, h), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, n, block_t, h), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, s, h), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, s, h), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
            jax.ShapeDtypeStruct((b, n, s, h), jnp.float32),
            jax.ShapeDtypeStruct((b, n, s, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * t * s * h,
            bytes_accessed=6 * q.size * np.dtype(q.dtype).itemsize,
            transcendentals=b * n * t * s,
        ),
        # At the SigLIP shapes (N=16, S=256, H=72→128 lanes) this kernel sits
        # ~16 MB of scoped VMEM — right at Mosaic's conservative default, and
        # whether it fits depends on the *surrounding* program's operand layouts
        # (KAI0_INT8_SB's rank-2 projections tipped it 824 KB over). v5e has
        # 128 MB VMEM; give the backward real headroom instead of shrinking
        # block_t (which would re-stream K/V per extra q-block).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )(q, k, v, out, lse, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@jax.custom_vjp
def flash_mhsa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dense (unmasked) multi-head attention, head-major layout [B, N, T, H].

    For the SigLIP encoder (every token valid, full bidirectional attention).
    Caller is responsible for pre-scaling q and for shape eligibility (see
    ``kai0_tpu.ops.attention.mhsa_dense``).
    """
    out, _ = _mhsa_fwd_impl(q, k, v)
    return out


def _flash_mhsa_vjp_fwd(q, k, v):
    out, lse = _mhsa_fwd_impl(q, k, v)
    out = _checkpoint_name(out, "kai0_attn_res")
    lse = _checkpoint_name(lse, "kai0_attn_res")
    return out, (q, k, v, out, lse)


def _flash_mhsa_vjp_bwd(residuals, g):
    q, k, v, out, lse = residuals
    return _mhsa_bwd_impl(q, k, v, out, lse, g)


flash_mhsa.defvjp(_flash_mhsa_vjp_fwd, _flash_mhsa_vjp_bwd)
