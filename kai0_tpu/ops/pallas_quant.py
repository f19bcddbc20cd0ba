"""Fused int8 matmul with in-VMEM scaling epilogue for the quantized base path.

``kai0_tpu/ops/quant.py`` runs frozen-base matmuls as ``q_row(x) @ (q·s)`` on the
v5e's 2×-rate int8 MXU. This kernel keeps the int32 accumulator in a VMEM
scratch block and applies the row (dynamic activation) and column
(per-output-channel weight) scales in the epilogue before writing bf16, so HBM
sees only the int8 operands and the bf16 result.

NEGATIVE RESULT (v5e, π₀.₅ train shapes — see PERF.md): the XLA row-chunked path
already tiles the quantize→dot→scale chain without materializing the int32
accumulator for the full output, reaching ~228 of 394 TOP/s at the FFN gate/up
site; this kernel measures 5% *slower* there (7.2 vs 6.8 ms fwd). Kept as an
opt-in A/B knob (``KAI0_INT8_PALLAS=1``) for other shapes/TPU generations, not
used by default.

Layout/grid: output-stationary (m, n, k) grid with k innermost; the [bm, bn]
int32 accumulator persists across the k dimension and flushes once. Blocks are
sized so traffic = M·K·(N/bn) + K·N·(M/bm) stays under the MXU time — bm/bn ≈ 1k
makes the gate/up site compute-bound with ~30% headroom.

The same kernel serves the backward's ``dx = q_row(dy·s) @ qᵀ`` contraction
(``nt=True``: both operands contract on their trailing axis, like flash
attention's QKᵀ), with the row scale in the epilogue and no column scale.

Dispatch policy lives in ``quant.py`` (TPU backend + ``KAI0_INT8_PALLAS``,
default on); CPU tests run this in ``force_tpu_interpret_mode``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(size: int, candidates: tuple[int, ...], align: int) -> tuple[int, int]:
    """(block, padded_size): first candidate dividing the aligned size, else pad up."""
    padded = _round_up(size, align)
    for c in candidates:
        if padded % c == 0 and c <= padded:
            return c, padded
    return padded, padded


# bm candidates: 1056 = 32·33 divides the batch-12 train M (12·968 = 11616) exactly;
# the rest are powers-of-two fallbacks for serve/suffix shapes.
_BM_CANDIDATES = (1056, 1024, 768, 512, 384, 256, 128, 96, 64, 32)
_BN_CANDIDATES = (1024, 768, 512, 384, 256, 128)
_BK_CANDIDATES = (1024, 512, 384, 256, 128)


def _int8_mm_kernel(xq_ref, w_ref, sx_ref, sn_ref, o_ref, acc_ref, *, nk: int, nt: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dims = (((1,), (1,) if nt else (0,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], w_ref[...], dimension_numbers=dims, preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[...].astype(jnp.float32) * sx_ref[...] * sn_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)


def _int8_mm_lora_kernel(xq_ref, w_ref, sx_ref, sn_ref, u_ref, b_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        # Rank-r LoRA term on the MXU per output tile: [bm, r] @ [r, bn]. The
        # f32 accumulate is rounded through bf16 before the add so the result
        # matches the XLA spelling `base + dot(u, b).astype(f32)` (a bf16 dot
        # on TPU is f32-accumulate + one bf16 round). Exact on-chip (both paths
        # feed the same 128-wide MXU accumulation, zero padding contributes
        # exactly 0 — scripts/dev/check_pallas_ffn_parity.py); CPU interpret
        # mode can flip isolated outputs by 1 bf16 ulp (f32 reduction-order).
        lt = jax.lax.dot_general(
            u_ref[...], b_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        lt = lt.astype(jnp.bfloat16).astype(jnp.float32)
        y = acc_ref[...].astype(jnp.float32) * sx_ref[...] * sn_ref[...] + lt
        o_ref[...] = y.astype(o_ref.dtype)


_LORA_R_PAD = 128  # pad the LoRA rank to one lane tile; zero columns contribute exactly 0


def int8_matmul_lora(
    xq: jax.Array,  # int8 [M, K]
    w: jax.Array,  # int8 [K, N]
    sx: jax.Array,  # f32 [M, 1] row scales
    sn: jax.Array,  # f32 [N] column scales
    u: jax.Array,  # bf16 [M, r] pre-contracted LoRA left term (x @ a)
    b: jax.Array,  # bf16 [r, N] LoRA right factor
    *,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """y[M, N] = (xq · w) * sx * sn + bf16_round(u · b), LoRA term fused in the epilogue.

    The XLA path must materialize ``dot(u, b)`` as a [M, N] bf16 array (a dot
    cannot be a fusion producer) — ~0.9 ms of pure HBM traffic per FFN LoRA term
    at π₀.₅ train shapes (PERF.md round-3 trace: ~49 ms/step total). Here the
    rank-r correction is one extra [bm, r]×[r, bn] MXU op per output tile
    (r/K ≈ 0.8% extra FLOPs) and never touches HBM.
    """
    m, kdim = xq.shape
    kw, n = w.shape
    if kw != kdim or u.shape[0] != m or b.shape[1] != n or u.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: xq {xq.shape} w {w.shape} u {u.shape} b {b.shape}")

    # Pick bm by minimum padding waste instead of requiring divisibility: the
    # batch-14 train M (14·968 = 13552) has no large 32-aligned divisor — a
    # divisor-only pick lands on bm=256, whose 53 weight restreams (~1.7 GB per
    # call) measured −6.5% end-to-end, while a divisor-forcing 1696 = 32·53
    # block is hostile to Mosaic's 256-wide MXU tiling (12× slower). bm=1056
    # pads 13552 → 13728, a 1.3% row waste on zero rows.
    def _pick_block_padded(size: int, candidates: tuple[int, ...], align: int) -> tuple[int, int]:
        ok = [c for c in candidates if _round_up(size, c) <= 1.04 * size]
        if ok:
            best = max(ok)
            return best, _round_up(size, best)
        return _pick_block(size, candidates, align)

    bm, mp = _pick_block_padded(m, _BM_CANDIDATES, 32)
    bn, np_ = _pick_block(n, _BN_CANDIDATES, 128)
    bk, kp = _pick_block(kdim, _BK_CANDIDATES, 128)
    r = u.shape[1]
    rp = _round_up(r, _LORA_R_PAD)
    while (
        bm * bn * 4
        + bm * bn * np.dtype(out_dtype).itemsize
        + 2 * bk * (bm + bn)
        + 2 * rp * (bm + bn) * 2
    ) > 12 * 2**20:
        if bn >= bm and bn > 128:
            bn //= 2
        elif bm > 32:
            bm //= 2
        else:
            break

    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, ((0, mp - m), (0, 0)))
        u = jnp.pad(u, ((0, mp - m), (0, 0)))
    if kp != kdim:
        xq = jnp.pad(xq, ((0, 0), (0, kp - kdim)))
        w = jnp.pad(w, ((0, kp - kdim), (0, 0)))
    if np_ != n:
        w = jnp.pad(w, ((0, 0), (0, np_ - n)))
        sn = jnp.pad(sn, (0, np_ - n))
        b = jnp.pad(b, ((0, 0), (0, np_ - n)))
    if rp != r:
        u = jnp.pad(u, ((0, 0), (0, rp - r)))
        b = jnp.pad(b, ((0, rp - r), (0, 0)))
    sn2 = sn.reshape(1, np_)

    nm, nn, nk = mp // bm, np_ // bn, kp // bk
    out = pl.pallas_call(
        functools.partial(_int8_mm_lora_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, rp), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=40 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * (kp + rp),
            bytes_accessed=mp * kp * nn + kp * np_ * nm + mp * np_ * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(xq, w, sx, sn2, u, b)
    return out[:m, :n]


def int8_matmul(
    xq: jax.Array,  # int8 [M, K] (nt=False) or [M, C] (nt=True)
    w: jax.Array,  # int8 [K, N] (nt=False) or [N, C] (nt=True, contract trailing)
    sx: jax.Array,  # f32 [M, 1] row scales (dynamic activation quantization)
    sn: jax.Array | None = None,  # f32 [N] column scales (weight channels); None = ones
    *,
    nt: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """y[M, N] = (xq · w) * sx * sn with the int32 accumulator kept in VMEM."""
    m, kdim = xq.shape
    if nt:
        n, kw = w.shape
    else:
        kw, n = w.shape
    if kw != kdim:
        raise ValueError(f"Contraction mismatch: xq {xq.shape} vs w {w.shape} (nt={nt})")
    if sn is None:
        sn = jnp.ones((n,), jnp.float32)

    bm, mp = _pick_block(m, _BM_CANDIDATES, 32)
    bn, np_ = _pick_block(n, _BN_CANDIDATES, 128)
    bk, kp = _pick_block(kdim, _BK_CANDIDATES, 128)
    # Keep the working set under the ~16 MB VMEM scope: acc + out + 2× double-buffered
    # operand blocks.
    while bm * bn * 4 + bm * bn * np.dtype(out_dtype).itemsize + 2 * bk * (bm + bn) > 12 * 2**20:
        if bn >= bm and bn > 128:
            bn //= 2
        elif bm > 32:
            bm //= 2
        else:
            break

    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, ((0, mp - m), (0, 0)))
    if kp != kdim:
        xq = jnp.pad(xq, ((0, 0), (0, kp - kdim)))
        w = jnp.pad(w, ((0, 0), (0, kp - kdim)) if nt else ((0, kp - kdim), (0, 0)))
    if np_ != n:
        w = jnp.pad(w, ((0, np_ - n), (0, 0)) if nt else ((0, 0), (0, np_ - n)))
        sn = jnp.pad(sn, (0, np_ - n))
    sn2 = sn.reshape(1, np_)

    nm, nn, nk = mp // bm, np_ // bn, kp // bk
    w_spec = (
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM)
        if nt
        else pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(_int8_mm_kernel, nk=nk, nt=nt),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * nn + kp * np_ * nm + mp * np_ * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(xq, w, sx, sn2)
    return out[:m, :n]
