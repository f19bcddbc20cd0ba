"""Int8 quantization for frozen base weights (LoRA fine-tune fast path).

TPU v5e executes int8xint8->int32 matmuls at 394 TOPS vs 197 bf16 TFLOPs. During a
LoRA fine-tune the base weights are frozen, so they can be quantized ONCE at train
state init (symmetric, per-output-channel scales) and every base matmul in the hot
loop — forward, the remat recompute, and the activation-gradient matmul — runs on
the int8 MXU path. Activations (and, optionally, incoming gradients) are quantized
dynamically per row, SwitchBack-style (arXiv:2304.13013): y ≈ (q_row(x) @ Wq) * s_x
* s_w, with a straight-through estimator through the rounding.

Measured on v5e-1 (see PERF.md): 1.68x over bf16 on the Gemma FFN gate/up shape,
1.26x on FFN down / attention projections, grad cosine vs bf16 > 0.9999 per layer.

The reference has no quantization support anywhere; this is a TPU-native addition
(its LoRA path, src/openpi/models/lora.py, keeps the frozen base in bf16). Enabled
by ``TrainConfig.quantize_frozen`` / ``KAI0_INT8=1``; off by default so checkpoint
numerics match the reference exactly.

Design notes:
- ``QuantArray`` is a registered pytree replacing the frozen weight leaf, so the
  existing tree machinery (fsdp_sharding, lax.scan over stacked layers, Orbax,
  donation) handles it without special cases; tree transforms that pair params with
  a boolean mask stop descent via ``is_quant(x)`` is_leaf checks.
- Weights are stored pre-transposed in a 2-D (contracted, out) layout derived from
  the einsum equation of their call site, so every apply is one rank-2 int8 matmul
  (one MXU dot; no gather/transpose in the hot loop).
- Checkpoints keep the openpi params contract: ``dequantize_tree`` restores the
  original shape/dtype on save. Requantization on resume is near-idempotent: the
  max-magnitude element rounds back to +-127, so the rescale is stable, but the
  bf16 cast of q*s can flip individual requantized values by at most one int8
  step (~0.8% of the per-channel max) — negligible against the quantization
  error itself, and exact on the tensors covered by tests/test_quant.py.
"""

from __future__ import annotations

import dataclasses
import functools
import re

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu import knobs as _knobs


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("q", "s"),
    meta_fields=("eqn", "orig_shape", "orig_dtype"),
)
@dataclasses.dataclass
class QuantArray:
    """Symmetric int8 weight + per-output-channel f32 scales in 2-D matmul layout.

    ``q``: int8 [K, N] (or [L, K, N] when stacked over a scan depth axis);
    ``s``: f32 [N] (or [L, N]); ``W[perm].reshape(K, N) ~= q * s``.
    ``eqn`` is the einsum equation of the call site (defines the layout);
    ``orig_shape``/``orig_dtype`` describe the pre-quantization weight.
    """

    q: jax.Array
    s: jax.Array
    eqn: str
    orig_shape: tuple[int, ...]
    orig_dtype: str


def is_quant(x) -> bool:
    return isinstance(x, QuantArray)


# CLI-layer boolean env parsing (KAI0_INT8, KAI0_BENCH_*); model knob resolution
# lives in kai0_tpu.knobs — this re-export keeps the public name stable.
env_flag = _knobs.env_flag


def sq_norm(qa: QuantArray) -> jax.Array:
    """Squared Frobenius norm of the represented weight, without dequantizing:
    ||W||^2 = sum_j s_j^2 * sum_i q_ij^2 (per layer when stacked)."""

    def one(q, s):
        qsq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32), axis=0)  # [N], K*127^2 < 2^31
        return jnp.sum(qsq.astype(jnp.float32) * s * s)

    if qa.q.ndim == 3:
        return jnp.sum(jax.lax.map(lambda qs: one(*qs), (qa.q, qa.s)))
    return one(qa.q, qa.s)


def _parse(eqn: str) -> tuple[str, str, str, str, str]:
    """Returns (lhs, rhs, out, contracted, w_other) label strings."""
    m = re.match(r"^([a-zA-Z0-9]+),([a-zA-Z0-9]+)->([a-zA-Z0-9]+)$", eqn)
    if not m:
        raise ValueError(f"Unsupported einsum eqn: {eqn}")
    lhs, rhs, out = m.groups()
    contracted = "".join(l for l in lhs if l in rhs)
    if not lhs.endswith(contracted):
        raise ValueError(f"Contracted labels must be trailing in lhs: {eqn}")
    w_other = "".join(l for l in rhs if l not in contracted)
    return lhs, rhs, out, contracted, w_other


def quantize_einsum_weight(w: jax.Array, eqn: str, *, stacked: bool = False) -> QuantArray:
    """Quantize an einsum weight into the 2-D (contracted, out) int8 layout.

    ``stacked=True`` for weights with a leading scan depth axis (gemma layers).
    """
    if stacked:
        # lax.map (not vmap): quantization transposes the weight through an f32
        # copy — serialized per layer that is ~270 MB transient, vmapped over an
        # 18-layer gating stack it is ~4.8 GB, which blows the init-program peak
        # on 16 GB chips and fragments the heap for the train step that follows.
        qa = jax.lax.map(lambda wl: quantize_einsum_weight(wl, eqn), w)
        return dataclasses.replace(qa, orig_shape=tuple(w.shape[1:]))
    _, rhs, _, contracted, w_other = _parse(eqn)
    if w.ndim != len(rhs):
        raise ValueError(f"Weight rank {w.ndim} does not match rhs of {eqn}")
    perm = [rhs.index(l) for l in contracted] + [rhs.index(l) for l in w_other]
    k = int(np.prod([w.shape[rhs.index(l)] for l in contracted]))
    w2 = jnp.transpose(w, perm).reshape(k, -1).astype(jnp.float32)
    s = jnp.max(jnp.abs(w2), axis=0) / 127.0
    s = jnp.maximum(s, 1e-30)
    q = jnp.round(w2 / s).astype(jnp.int8)
    return QuantArray(q=q, s=s, eqn=eqn, orig_shape=tuple(w.shape), orig_dtype=str(w.dtype))


def dequantize(qa: QuantArray) -> jax.Array:
    """Reconstruct the weight in its original shape/dtype (openpi checkpoint layout)."""
    if qa.q.ndim == 3:  # stacked over depth: lax.map bounds the f32 transient per layer
        return jax.lax.map(lambda qs: _dequantize_2d(*qs, qa.eqn, qa.orig_shape, qa.orig_dtype), (qa.q, qa.s))
    return _dequantize_2d(qa.q, qa.s, qa.eqn, qa.orig_shape, qa.orig_dtype)


def _dequantize_2d(q, s, eqn, orig_shape, orig_dtype):
    _, rhs, _, contracted, w_other = _parse(eqn)
    perm = [rhs.index(l) for l in contracted] + [rhs.index(l) for l in w_other]
    permuted_shape = [orig_shape[i] for i in perm]
    w2 = q.astype(jnp.float32) * s
    inv = np.argsort(perm)
    return jnp.transpose(w2.reshape(permuted_shape), inv).astype(orig_dtype)


def _bwd_int8_enabled() -> bool:
    return _knobs.get().int8_bwd


def _pallas_enabled() -> bool:
    """Fused Pallas int8 matmul (in-VMEM int32 accumulator + scaling epilogue).

    Opt-in experiment (``KAI0_INT8_PALLAS=1``): measured *slightly slower* than the
    row-chunked XLA path on every v5e train site (gate/up fwd 7.2 vs 6.8 ms — XLA
    already tiles the quant-dot-scale chain at ~228 of 394 TOP/s, so there is no
    fusion win to reclaim; see PERF.md). Kept for A/B on other shapes/generations.
    """
    return _knobs.get().int8_pallas and jax.default_backend() == "tpu"


def _pallas_ffn_enabled() -> bool:
    """LoRA-epilogue Pallas matmul inside the fused FFN (``KAI0_INT8_PALLAS_FFN=1``).

    The fused FFN's rank-16 LoRA corrections are XLA dots whose [rows, mlp_dim]
    bf16 outputs must materialize before the add (a dot cannot be a fusion
    producer): ~49 ms/step of pure HBM traffic at batch 14 across fwd + the
    backward's gate/up recompute (PERF.md round-3 trace). With this knob the
    gate/up/down base dots run as ``pallas_quant.int8_matmul_lora``, which adds
    the LoRA term per output tile in the epilogue (one [bm, r]×[r, bn] MXU op,
    never touching HBM). Numerics match the XLA spelling exactly on-chip
    (scripts/dev/check_pallas_ffn_parity.py); CPU interpret mode may differ by
    isolated 1-bf16-ulp flips (tests/test_quant.py ``_assert_bf16_ulp_close``).
    """
    return _knobs.get().int8_pallas_ffn and jax.default_backend() == "tpu"


def _rowquant_pallas_enabled() -> bool:
    """One-pass Pallas row quantization (``KAI0_INT8_ROWQUANT=pallas``).

    The XLA lowering of ``_row_quant`` sweeps the tensor twice (abs+row-max
    reduce fusion, then a round/convert fusion re-reading x) — ~150 ms/step of
    the batch-14 train step at the [rows, mlp_dim] FFN sites (PERF.md round 2).
    The kernel (``pallas_rowquant.row_quant``) does amax/scale/round in VMEM in
    one HBM sweep, bit-identical numerics. Measured end-to-end NEGATIVE on the
    batch-14 train step (10.70 vs 11.74, PERF.md round 3: the XLA abs_reduce
    fusions it replaces were also producing the recompute values) — off by
    default, kept for inference/other shapes.
    """
    return _knobs.get().int8_rowquant == "pallas" and jax.default_backend() == "tpu"


def _row_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row dynamic quantization: x ≈ xq * sx, sx f32 [rows, 1]."""
    if x.ndim == 2 and x.shape[-1] >= 1024 and _rowquant_pallas_enabled():
        from kai0_tpu.ops import pallas_rowquant

        return pallas_rowquant.row_quant(x)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32), 1e-30) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    return xq, sx


# TPU dots don't fuse their epilogue: the int32 accumulator and the f32 scaling
# copy are materialized in HBM. At batch 12 the FFN gate/up sites produce ~800 MB
# int32 temporaries — enough to OOM a 16 GB chip that runs fine in bf16. Row-chunk
# any qmm whose per-buffer temporaries exceed this budget; lax.map serializes the
# chunks so only one chunk's temporaries are live at a time.
# Tests may pin an exact byte budget via this module attribute; None defers to
# the KAI0_INT8_CHUNK_MB knob (kai0_tpu.knobs).
_CHUNK_BYTES: int | None = None


def _chunk_bytes() -> int:
    return _CHUNK_BYTES if _CHUNK_BYTES is not None else _knobs.get().int8_chunk_mb * 2**20


def _row_chunks(m: int, width: int) -> int:
    """Smallest divisor of m (≤8) bounding an [m/c, width] f32 buffer to the budget."""
    best = 1
    for c in (1, 2, 3, 4, 6, 8):
        if m % c == 0:
            best = c
            if (m // c) * width * 4 <= _chunk_bytes():
                return c
    return best


def _bwd_dx(q, s, dy, bwd_int8: bool):
    """dL/dx of a quantized matmul: dx = (dy * s) @ q^T, straight-through.

    With ``bwd_int8`` the incoming gradient is row-quantized so the backward
    matmul rides the int8 MXU path: dx = q_row(dy * s) @ q^T * s_row.
    """
    if bwd_int8 and _pallas_enabled():
        from kai0_tpu.ops import pallas_quant

        g = dy.astype(jnp.float32) * s
        gq, sg = _row_quant(g)
        return pallas_quant.int8_matmul(gq, q, sg, None, nt=True, out_dtype=dy.dtype)

    def bwd_chunk(dyc):
        g = dyc.astype(jnp.float32) * s
        if bwd_int8:
            gq, sg = _row_quant(g)
            dxi = jax.lax.dot_general(gq, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
            return (dxi.astype(jnp.float32) * sg).astype(dy.dtype)
        return jax.lax.dot_general(g.astype(dy.dtype), q.astype(dy.dtype), (((1,), (1,)), ((), ())))

    return _row_chunked(bwd_chunk, dy, max(q.shape))


@functools.lru_cache(maxsize=None)
def _make_qmm(bwd_int8: bool, has_add: bool):
    """Rank-2 quantized matmul y = q_row(x) @ (q * s) [+ add], straight-through d/dx.

    With ``has_add``, an extra operand of y's shape (e.g. a LoRA correction) is
    summed inside the chunk epilogue: the scaling copy already reads/writes the
    output there, so folding the add in saves a full extra read+write of the base
    output per call site (~760 MB per FFN site at batch 12, xprof ~1.9 ms each).
    The add's cotangent is dy unchanged.

    bwd computes only dL/dx (the weight is frozen — its cotangent is float0/zero).
    """

    _zero_w = lambda q, s: (
        np.zeros(q.shape, jax.dtypes.float0),
        np.zeros(s.shape, jax.dtypes.float0),
    )

    if has_add:

        @jax.custom_vjp
        def qmm_add(x, add, q, s):
            return _qmm_fwd_impl(x, add, q, s)

        def fwd_a(x, add, q, s):
            return _qmm_fwd_impl(x, add, q, s), (q, s)

        def bwd_a(res, dy):
            q, s = res
            return (_bwd_dx(q, s, dy, bwd_int8), dy, *_zero_w(q, s))

        qmm_add.defvjp(fwd_a, bwd_a)
        return qmm_add

    @jax.custom_vjp
    def qmm(x, q, s):
        return _qmm_fwd_impl(x, None, q, s)

    def fwd(x, q, s):
        return _qmm_fwd_impl(x, None, q, s), (q, s)

    def bwd(res, dy):
        q, s = res
        return (_bwd_dx(q, s, dy, bwd_int8), *_zero_w(q, s))

    qmm.defvjp(fwd, bwd)
    return qmm


def _row_chunked(f, x, width: int, extra=None):
    """Apply f (rows -> rows) over row chunks of x (zipped with ``extra`` when
    given), one chunk's temporaries live at a time."""
    m = x.shape[0]
    c = _row_chunks(m, width)
    if c == 1:
        return f(x) if extra is None else f(x, extra)
    xs = x.reshape(c, m // c, *x.shape[1:])
    es = None if extra is None else extra.reshape(c, m // c, *extra.shape[1:])
    if _knobs.get().int8_unroll:
        # Unrolled chunks + concatenate instead of lax.map: the map's stacked-output
        # while-loop carry is zero-initialized with a materialized [m, width] write
        # (~0.6 ms per 380 MB buffer, ~54 ms/step across the gate/up/down sites at
        # batch 12) even though every element is overwritten. Unrolled, buffer
        # assignment writes each chunk's dot straight into its concat slice. The
        # optimization_barrier chains chunk i's input to chunk i-1's output so the
        # scheduler cannot interleave chunks (which would triple the live int32/f32
        # dot temporaries that chunking exists to bound).
        ys = []
        for i in range(c):
            xi = xs[i]
            if ys and _knobs.get().int8_unroll_barrier:
                xi, _ = jax.lax.optimization_barrier((xi, ys[-1]))
            ys.append(f(xi) if es is None else f(xi, es[i]))
        return jnp.concatenate(ys, axis=0)
    if es is None:
        ys = jax.lax.map(f, xs)
    else:
        ys = jax.lax.map(lambda xe: f(*xe), (xs, es))
    return ys.reshape(m, *ys.shape[2:])


def weight_only_enabled() -> bool:
    """Weight-only int8 (``KAI0_INT8_WO=1``): int8 weights stream at half the HBM
    bytes but dequantize *into* the matmul (bf16 multiply, f32 accumulate, column
    scale on the output) instead of row-quantizing activations for an int8×int8
    dot. Serving-oriented: drops the dynamic abs-max/round passes over the
    activations (which grow with batch — xprof: ~36 ms/chunk at serve batch 4,
    PERF.md) and removes activation rounding error entirely; gives up the int8
    MXU rate, which only matters on the compute-bound training path."""
    return _knobs.get().int8_weight_only


def _qmm_fwd_impl(x, add, q, s):
    if weight_only_enabled():

        def wo_chunk(xc, *addc):
            # |q| <= 127 is exact in bf16; s stays f32 on the f32 dot output.
            yf = (
                jax.lax.dot_general(
                    xc, q.astype(xc.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                * s
            )
            if addc:
                yf = yf + addc[0].astype(jnp.float32)
            return yf.astype(xc.dtype)

        return _row_chunked(wo_chunk, x, max(q.shape), extra=add)

    if _pallas_enabled():
        from kai0_tpu.ops import pallas_quant

        xq, sx = _row_quant(x)
        y = pallas_quant.int8_matmul(xq, q, sx, s, out_dtype=x.dtype)
        return y if add is None else y + add

    def fwd_chunk(xc, *addc):
        xq, sx = _row_quant(xc)
        yi = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        yf = yi.astype(jnp.float32) * sx * s
        if addc:
            yf = yf + addc[0].astype(jnp.float32)
        return yf.astype(xc.dtype)

    return _row_chunked(fwd_chunk, x, max(q.shape), extra=add)


def qmm(x2d: jax.Array, qa_q: jax.Array, qa_s: jax.Array, add: jax.Array | None = None) -> jax.Array:
    if add is not None:
        return _make_qmm(_bwd_int8_enabled(), True)(x2d, add, qa_q, qa_s)
    return _make_qmm(_bwd_int8_enabled(), False)(x2d, qa_q, qa_s)


def can_fuse_add(eqn: str) -> bool:
    """True when the equation's output needs no transpose after the rank-2 matmul,
    i.e. ``apply_quant_einsum`` can fold an additive term into the epilogue."""
    lhs, _, out, contracted, w_other = _parse(eqn)
    return lhs[: len(lhs) - len(contracted)] + w_other == out


def apply_quant_einsum(qa: QuantArray, eqn: str, x: jax.Array, add: jax.Array | None = None) -> jax.Array:
    """Quantized counterpart of ``jnp.einsum(eqn, x, w)`` for 2-operand equations.

    ``add`` (in the *output* shape, only for equations whose output needs no
    transpose) is folded into the matmul epilogue — see ``_make_qmm``.
    """
    if eqn != qa.eqn:
        raise ValueError(f"QuantArray was built for eqn {qa.eqn!r}, applied with {eqn!r}")
    lhs, rhs, out, contracted, w_other = _parse(eqn)
    batch_labels = lhs[: len(lhs) - len(contracted)]
    batch_shape = x.shape[: len(batch_labels)]
    x2 = x.reshape(int(np.prod(batch_shape)), -1)
    if add is not None and batch_labels + w_other != out:
        raise ValueError(f"add requires a transpose-free output for eqn {eqn!r}")
    y2 = qmm(x2, qa.q, qa.s, None if add is None else add.reshape(x2.shape[0], -1))
    n_labels = batch_labels + w_other
    other_shape = [qa.orig_shape[rhs.index(l)] for l in w_other]
    y = y2.reshape(*batch_shape, *other_shape)
    if n_labels != out:
        y = jnp.transpose(y, [n_labels.index(l) for l in out])
    return y


def apply_quant_split(qa: QuantArray, x: jax.Array, adds=None) -> tuple[jax.Array, ...]:
    """Apply a stacked-weight QuantArray (w_other led by a numeric label, e.g.
    ``BTD,2DF->2BTF``) as per-slice rank-2 matmuls, returning the slices separately.

    ``apply_quant_einsum`` on these equations materializes the full stacked output
    in (batch, n, ...) order and then transposes it to the einsum output order —
    at the FFN gate+up site that is a [B,T,2,F] copy plus a [B*T, 2F] int32
    accumulator (~2.4 GB at batch 12), which OOMs a 16 GB v5e chip that runs fine
    in bf16. Column-slicing the int8 weight instead keeps every temporary at the
    single-projection size and skips the transpose entirely.
    """
    lhs, rhs, _, contracted, w_other = _parse(qa.eqn)
    n = int(w_other[0])
    batch_labels = lhs[: len(lhs) - len(contracted)]
    batch_shape = x.shape[: len(batch_labels)]
    x2 = x.reshape(int(np.prod(batch_shape)), -1)
    rest_shape = [qa.orig_shape[rhs.index(l)] for l in w_other[1:]]
    cols = int(np.prod(rest_shape))
    if _knobs.get().int8_splitdot:
        # One qmm per slice on a column-sliced weight: the stacked axis is outermost
        # in the quantized column layout, so slice i of (q, s) is a contiguous column
        # block. Slicing the *weight* copies ≤q_bytes/n per layer (int8, cheap);
        # slicing the *output* of a single full-width dot materializes the full
        # [rows, n*cols] activation twice (xprof: ~42 ms/step each for the fwd slice,
        # the remat recompute slice, and the backward pad+add at the batch-12 gate/up
        # site — ~10% of the train step in pure HBM traffic).
        ys = []
        for i in range(n):
            qi = jax.lax.slice_in_dim(qa.q, i * cols, (i + 1) * cols, axis=-1)
            si = jax.lax.slice_in_dim(qa.s, i * cols, (i + 1) * cols, axis=-1)
            add = None if adds is None or adds[i] is None else adds[i].reshape(x2.shape[0], -1)
            ys.append(qmm(x2, qi, si, add).reshape(*batch_shape, *rest_shape))
        return tuple(ys)
    # Fallback (KAI0_INT8_SPLITDOT=0): one full-width dot, then column slices.
    y2 = qmm(x2, qa.q, qa.s)
    out = tuple(y2[:, i * cols : (i + 1) * cols].reshape(*batch_shape, *rest_shape) for i in range(n))
    if adds is not None:
        out = tuple(y if a is None else y + a for y, a in zip(out, adds, strict=True))
    return out


# --------------------------------------------------------------------------------------
# Fused gated FFN (gate|up -> gelu*mul -> down) over row chunks
# --------------------------------------------------------------------------------------


def fused_ffn_enabled() -> bool:
    """``KAI0_INT8_FFN`` ∈ {``fused`` (default), ``split``}.

    The composed FFN path (``apply_quant_split`` + gelu·mul + down ``qmm``)
    materializes every [rows, mlp_dim] intermediate in HBM: gate, up, their LoRA
    corrections (the epilogue-``add`` operands), the gelu·up product, plus a
    zero-init per stacked map output — xprof at batch 12 shows ~250 ms/step of
    pure HBM traffic on [12·968, 16384] bf16 tensors across fwd + remat recompute
    + backward (PERF.md round-2 trace table). ``fused`` runs the whole FFN as ONE
    row-chunked op with a hand-written VJP: per chunk the gate/up dots, the LoRA
    rank-16 corrections, the gelu·mul, and the down dot happen back-to-back, so
    only chunk-sized intermediates exist and nothing full-size hits HBM except
    the op output. Forward numerics are bit-identical to the split path when
    unchunked (c=1: same op order/dtypes); when row-chunked the two
    compilations can differ by one int8 rounding step
    (tests/test_quant.py ``test_fused_forward_matches_split_when_row_chunked``,
    PARITY.md) — not an exact-parity guarantee."""
    return _knobs.get().int8_ffn == "fused" and not (
        weight_only_enabled() or _pallas_enabled()
    )


def _ffn_gate_up(x_c, xq, sx, qg, sg, qu, su, lora):
    """One chunk's gate/up projections (+LoRA), matching the split path bitwise."""
    dtype = x_c.dtype
    if lora is not None and _pallas_ffn_enabled():
        from kai0_tpu.ops import pallas_quant

        ag, bg, au, bu = lora[:4]
        gate = pallas_quant.int8_matmul_lora(xq, qg, sx, sg, jnp.dot(x_c, ag), bg, out_dtype=dtype)
        up = pallas_quant.int8_matmul_lora(xq, qu, sx, su, jnp.dot(x_c, au), bu, out_dtype=dtype)
        return gate, up

    def base(qw, sw):
        yi = jax.lax.dot_general(xq, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return yi.astype(jnp.float32) * sx * sw

    gate, up = base(qg, sg), base(qu, su)
    if lora is not None:
        ag, bg, au, bu = lora[:4]
        gate = gate + jnp.dot(jnp.dot(x_c, ag), bg).astype(jnp.float32)
        up = up + jnp.dot(jnp.dot(x_c, au), bu).astype(jnp.float32)
    return gate.astype(dtype), up.astype(dtype)


def _ffn_down(act, qd, sd, lora):
    """One chunk's down projection (+LoRA), matching ``_qmm_fwd_impl`` bitwise."""
    aq, sa = _row_quant(act)
    if lora is not None and _pallas_ffn_enabled():
        from kai0_tpu.ops import pallas_quant

        ad, bd = lora[4:]
        return pallas_quant.int8_matmul_lora(aq, qd, sa, sd, jnp.dot(act, ad), bd, out_dtype=act.dtype)
    yi = jax.lax.dot_general(aq, qd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    yf = yi.astype(jnp.float32) * sa * sd
    if lora is not None:
        ad, bd = lora[4:]
        yf = yf + jnp.dot(jnp.dot(act, ad), bd).astype(jnp.float32)
    return yf.astype(act.dtype)


def _qbwd_col(g, qw, sw, bwd_int8: bool, out_dtype):
    """dx of a col-quantized dot: straight-through (g * s) @ q^T (see _bwd_dx).

    Shared by the fused-FFN backward passes (frozen-base ``_make_fused_ffn``
    and trainable ``_make_sb_fused_ffn``) so their dgrad numerics cannot drift.
    """
    g = g.astype(jnp.float32) * sw
    if bwd_int8:
        gq, sgr = _row_quant(g)
        di = jax.lax.dot_general(gq, qw, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        return (di.astype(jnp.float32) * sgr).astype(out_dtype)
    return jax.lax.dot_general(g.astype(out_dtype), qw.astype(out_dtype), (((1,), (1,)), ((), ())))


@functools.lru_cache(maxsize=None)
def _make_fused_ffn(has_lora: bool, bwd_int8: bool, c: int):
    """Build the fused FFN with a custom VJP for a given chunk count ``c``.

    Forward saves only the op input; the backward re-derives gate/up/act chunk by
    chunk (same FLOPs as the split path's remat recompute + dx dots, a fraction of
    its HBM traffic) inside a ``lax.scan`` that accumulates the six LoRA factor
    gradients in f32 carries and emits dx chunks.
    """

    def chunks(t):
        return t.reshape(c, t.shape[0] // c, *t.shape[1:])

    def fwd_impl(x2, qg, sg, qu, su, qd, sd, lora):
        lora = lora if has_lora else None

        def one(x_c):
            xq, sx = _row_quant(x_c)
            gate, up = _ffn_gate_up(x_c, xq, sx, qg, sg, qu, su, lora)
            act = jax.nn.gelu(gate) * up
            return _ffn_down(act, qd, sd, lora)

        if c == 1:
            return one(x2)
        return jax.lax.map(one, chunks(x2)).reshape(x2.shape[0], -1)

    @jax.custom_vjp
    def fused(x2, qg, sg, qu, su, qd, sd, lora):
        return fwd_impl(x2, qg, sg, qu, su, qd, sd, lora)

    def fwd(x2, qg, sg, qu, su, qd, sd, lora):
        return fwd_impl(x2, qg, sg, qu, su, qd, sd, lora), (x2, qg, sg, qu, su, qd, sd, lora)

    def bwd(res, dy):
        x2, qg, sg, qu, su, qd, sd, lora = res
        lora = lora if has_lora else None
        f32 = jnp.float32

        def qbwd(g, qw, sw):
            return _qbwd_col(g, qw, sw, bwd_int8, dy.dtype)

        def one(carry, xd):
            x_c, dy_c = xd
            xq, sx = _row_quant(x_c)
            gate, up = _ffn_gate_up(x_c, xq, sx, qg, sg, qu, su, lora)
            gel, gelu_vjp = jax.vjp(jax.nn.gelu, gate)
            act = gel * up
            # down backward (row-quant of act is straight-through, like qmm's).
            dact = qbwd(dy_c, qd, sd)
            if lora is not None:
                ag, bg, au, bu, ad, bd = lora
                pd_back = jnp.dot(dy_c, bd.T)  # [rows, r]
                dact = dact + jnp.dot(pd_back, ad.T)
            dup = dact * gel
            (dgate,) = gelu_vjp(dact * up)
            dx_c = qbwd(dgate, qg, sg) + qbwd(dup, qu, su)
            if lora is not None:
                pg = jnp.dot(dgate, bg.T)
                pu = jnp.dot(dup, bu.T)
                dx_c = dx_c + jnp.dot(pg, ag.T) + jnp.dot(pu, au.T)
                dag, dbg, dau, dbu, dad, dbd = carry
                dot_f32 = functools.partial(jax.lax.dot_general, preferred_element_type=f32)
                carry = (
                    dag + dot_f32(x_c.T, pg, (((1,), (0,)), ((), ()))),
                    dbg + dot_f32(jnp.dot(x_c, ag).T, dgate, (((1,), (0,)), ((), ()))),
                    dau + dot_f32(x_c.T, pu, (((1,), (0,)), ((), ()))),
                    dbu + dot_f32(jnp.dot(x_c, au).T, dup, (((1,), (0,)), ((), ()))),
                    dad + dot_f32(act.T, pd_back, (((1,), (0,)), ((), ()))),
                    dbd + dot_f32(jnp.dot(act, ad).T, dy_c, (((1,), (0,)), ((), ()))),
                )
            return carry, dx_c

        if has_lora:
            ag, bg, au, bu, ad, bd = lora
            acc0 = tuple(jnp.zeros(p.shape, f32) for p in (ag, bg, au, bu, ad, bd))
        else:
            acc0 = ()
        if c == 1:
            acc, dx = one(acc0, (x2, dy))
        else:
            acc, dxs = jax.lax.scan(one, acc0, (chunks(x2), chunks(dy)))
            dx = dxs.reshape(x2.shape[0], -1)
        zeros_w = tuple(np.zeros(t.shape, jax.dtypes.float0) for t in (qg, sg, qu, su, qd, sd))
        lora_grads = tuple(g.astype(dy.dtype) for g in acc) if has_lora else ()
        return (dx, *zeros_w, lora_grads)

    fused.defvjp(fwd, bwd)
    return fused


def apply_fused_ffn(gating_qa: QuantArray, linear_qa: QuantArray, x: jax.Array, lora_params=None) -> jax.Array:
    """Gated-GELU FFN on quantized weights as one fused row-chunked op.

    ``gating_qa`` is the stacked gate|up QuantArray (eqn ``BTF,2FD->2BTD``-style,
    columns [gate | up]); ``linear_qa`` the down projection; ``lora_params`` the
    (unscaled, reference-parity) factors ``(a_gate, b_gate, a_up, b_up, a_down,
    b_down)`` or None. See ``fused_ffn_enabled`` for why this exists.
    """
    batch_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    cols = gating_qa.q.shape[-1] // 2
    qg = jax.lax.slice_in_dim(gating_qa.q, 0, cols, axis=-1)
    sg = jax.lax.slice_in_dim(gating_qa.s, 0, cols, axis=-1)
    qu = jax.lax.slice_in_dim(gating_qa.q, cols, 2 * cols, axis=-1)
    su = jax.lax.slice_in_dim(gating_qa.s, cols, 2 * cols, axis=-1)
    c = _row_chunks(x2.shape[0], max(linear_qa.q.shape))
    lora = ()
    if lora_params is not None:
        lora = tuple(p.astype(x.dtype) for p in lora_params)
    fused = _make_fused_ffn(lora_params is not None, _bwd_int8_enabled(), c)
    y2 = fused(x2, qg, sg, qu, su, linear_qa.q, linear_qa.s, lora)
    return y2.reshape(*batch_shape, -1)


@functools.lru_cache(maxsize=None)
def _make_sb_fused_ffn(bwd_int8: bool, c: int):
    """Fused gated FFN over TRAINABLE weights (the full-fine-tune SwitchBack path).

    Same row-chunked custom-VJP shape as :func:`_make_fused_ffn` — forward saves
    the op input plus the per-call col-quantized weights (int8 + scales, half the
    bf16 weight bytes), nothing [rows, mlp_dim]-sized touches HBM — but here the
    base weights themselves train: the backward's ``lax.scan`` accumulates
    dWgate/dWup/dWdown in f32 carries (bf16 wgrad per the SwitchBack recipe:
    the weight-gradient matmuls contract over tokens and stay full-precision,
    only fwd + dgrad run int8).
    """

    def chunks(t):
        return t.reshape(c, t.shape[0] // c, *t.shape[1:])

    def fwd_impl(x2, qg, sg, qu, su, qd, sd):
        def one(x_c):
            xq, sx = _row_quant(x_c)
            gate, up = _ffn_gate_up(x_c, xq, sx, qg, sg, qu, su, None)
            act = jax.nn.gelu(gate) * up
            return _ffn_down(act, qd, sd, None)

        if c == 1:
            return one(x2)
        return jax.lax.map(one, chunks(x2)).reshape(x2.shape[0], -1)

    @jax.custom_vjp
    def fused(x2, wg, wu, wd):
        qg, sg = _col_quant(wg)
        qu, su = _col_quant(wu)
        qd, sd = _col_quant(wd)
        return fwd_impl(x2, qg, sg, qu, su, qd, sd)

    def fwd(x2, wg, wu, wd):
        qg, sg = _col_quant(wg)
        qu, su = _col_quant(wu)
        qd, sd = _col_quant(wd)
        return fwd_impl(x2, qg, sg, qu, su, qd, sd), (x2, qg, sg, qu, su, qd, sd)

    def bwd(res, dy):
        x2, qg, sg, qu, su, qd, sd = res
        f32 = jnp.float32
        dot_f32 = functools.partial(jax.lax.dot_general, preferred_element_type=f32)

        def qbwd(g, qw, sw):
            return _qbwd_col(g, qw, sw, bwd_int8, dy.dtype)

        def one(carry, xd):
            x_c, dy_c = xd
            xq, sx = _row_quant(x_c)
            gate, up = _ffn_gate_up(x_c, xq, sx, qg, sg, qu, su, None)
            gel, gelu_vjp = jax.vjp(jax.nn.gelu, gate)
            act = gel * up
            dact = qbwd(dy_c, qd, sd)
            dup = dact * gel
            (dgate,) = gelu_vjp(dact * up)
            dx_c = qbwd(dgate, qg, sg) + qbwd(dup, qu, su)
            dwg, dwu, dwd = carry
            carry = (
                dwg + dot_f32(x_c, dgate, (((0,), (0,)), ((), ()))),
                dwu + dot_f32(x_c, dup, (((0,), (0,)), ((), ()))),
                dwd + dot_f32(act, dy_c, (((0,), (0,)), ((), ()))),
            )
            return carry, dx_c

        acc0 = (
            jnp.zeros((qg.shape[0], qg.shape[1]), f32),
            jnp.zeros((qu.shape[0], qu.shape[1]), f32),
            jnp.zeros((qd.shape[0], qd.shape[1]), f32),
        )
        if c == 1:
            acc, dx = one(acc0, (x2, dy))
        else:
            acc, dxs = jax.lax.scan(one, acc0, (chunks(x2), chunks(dy)))
            dx = dxs.reshape(x2.shape[0], -1)
        dwg, dwu, dwd = (g.astype(dy.dtype) for g in acc)
        return dx, dwg, dwu, dwd

    fused.defvjp(fwd, bwd)
    return fused


def sb_fused_ffn(x: jax.Array, wg: jax.Array, wu: jax.Array, wd: jax.Array) -> jax.Array:
    """Gated-GELU FFN on trainable weights as one fused row-chunked SwitchBack op.

    The full-fine-tune counterpart of :func:`apply_fused_ffn`: forward + dgrad
    int8 (per-call weight col-quant), wgrad bf16 accumulated chunk-by-chunk in
    f32 — and none of the [rows, mlp_dim] intermediates (gate, up, gelu·up,
    their gradients) are ever materialized in HBM across fwd/remat/bwd.
    """
    batch_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    c = _row_chunks(x2.shape[0], max(wd.shape))
    fused = _make_sb_fused_ffn(_bwd_int8_enabled(), c)
    y2 = fused(x2, wg.astype(x.dtype), wu.astype(x.dtype), wd.astype(x.dtype))
    return y2.reshape(*batch_shape, -1)


# --------------------------------------------------------------------------------------
# SwitchBack: dynamic int8 for *trainable* matmuls (SigLIP tower)
# --------------------------------------------------------------------------------------


def switchback_enabled(site: str = "") -> bool:
    """Dynamic int8 for the trainable SigLIP matmuls (``KAI0_INT8_SB``).

    SwitchBack (arXiv:2304.13013, validated on ViT/CLIP training): forward and the
    activation-gradient matmul run int8 (weights per-output-channel quantized *each
    call* since they change every step; activations/gradients per-row), while the
    weight-gradient matmul stays bf16 — wgrad contracts over tokens, where int8
    row-quantization noise correlates across the batch and hurts convergence.
    Off by default: it perturbs training numerics (bf16 parity tests require it off).

    ``KAI0_INT8_SB`` is ``0``/``1``/``all`` or a comma-separated site list
    (``mlp``, ``attn``, ``head``) so the sites can be A/B'd independently —
    their int8 economics differ (K=1152/4304 MLP dots vs lane-padded head-dim-72
    attention projections).
    """
    spec = _knobs.get().int8_switchback
    if spec.lower() in ("0", "false", "off", "no", ""):
        return False
    if spec.lower() in ("1", "true", "on", "yes", "all"):
        return True
    return site in spec.split(",")


def switchback_gemma_enabled(site: str) -> bool:
    """Dynamic int8 for the *trainable* gemma matmuls (``KAI0_INT8_SB_GEMMA``).

    The full fine-tune trains every gemma weight, so the frozen-base static
    quantization (``KAI0_INT8``) cannot apply — but the SwitchBack recipe can:
    these are exactly the K≥2048 trainable matmuls where PERF.md round 2
    predicted its economics flip (the SigLIP K=1152/4304 sites measured
    negative; the gemma gate/up K=2048 N=16384 dots run 1.4-1.7× faster int8).
    Sites: ``ffn`` (gate/up/down projections), ``attn`` (q/kv/out einsums —
    smaller K·N, weaker int8 economics; A/B independently). Off by default —
    LoRA mode quantizes the frozen base statically instead, and bf16 parity
    tests require exact reference numerics.
    """
    spec = _knobs.get().int8_sb_gemma
    if spec.lower() in ("0", "false", "off", "no", ""):
        return False
    if spec.lower() in ("1", "true", "on", "yes", "all"):
        return True
    return site in spec.split(",")


def _col_quant(w2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel dynamic quantization: w2 ≈ q * s, s f32 [N]."""
    s = jnp.maximum(jnp.max(jnp.abs(w2), axis=0).astype(jnp.float32), 1e-30) / 127.0
    q = jnp.round(w2.astype(jnp.float32) / s).astype(jnp.int8)
    return q, s


@functools.lru_cache(maxsize=None)
def _make_switchback(bwd_int8: bool):
    """Rank-2 y = q_row(x) @ (q_col(w)) with straight-through d/dx and bf16 d/dw."""

    @jax.custom_vjp
    def sb(x2, w2):
        q, s = _col_quant(w2)
        return _qmm_fwd_impl(x2, None, q, s)

    def fwd(x2, w2):
        q, s = _col_quant(w2)
        # Residuals keep the quantized weight (int8 + scales, half the bf16 bytes)
        # for dgrad and the bf16 activations for wgrad.
        return _qmm_fwd_impl(x2, None, q, s), (x2, q, s)

    def bwd(res, dy):
        x2, q, s = res
        dx = _bwd_dx(q, s, dy, bwd_int8)
        dw = jax.lax.dot_general(x2, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dx, dw.astype(x2.dtype)

    sb.defvjp(fwd, bwd)
    return sb


def switchback_einsum(eqn: str, x: jax.Array, w: jax.Array) -> jax.Array:
    """Drop-in for ``jnp.einsum(eqn, x, w)`` with SwitchBack dynamic int8.

    Unlike ``apply_quant_einsum`` this accepts any 2-operand contraction (the
    contracted labels need not be trailing): operands are transposed/reshaped to a
    single rank-2 dot *outside* the custom-vjp core, so autodiff routes the weight
    cotangent back through the layout ops for free. The rank-2 form also sidesteps
    the head-dim-72 lane padding that holds the SigLIP attention-projection einsums
    at ~52% of MXU peak in bf16 (see PERF.md).
    """
    # Digits are valid jnp.einsum labels (a JAX extension numpy lacks) — gemma's
    # stacked qkv/kv eqns use them ("BSD,2KDH->2BSKH").
    m = re.match(r"^([a-zA-Z0-9]+),([a-zA-Z0-9]+)->([a-zA-Z0-9]+)$", eqn)
    if not m:
        raise ValueError(f"Unsupported einsum eqn: {eqn}")
    lhs, rhs, out = m.groups()
    contracted = [l for l in lhs if l in rhs]
    batch = [l for l in lhs if l not in contracted]
    w_other = [l for l in rhs if l not in contracted]
    if set(out) != set(batch + w_other):
        raise ValueError(f"Unsupported einsum eqn (batched/diagonal labels): {eqn}")

    xperm = [lhs.index(l) for l in batch + contracted]
    if xperm != list(range(len(lhs))):
        x = jnp.transpose(x, xperm)
    batch_shape = x.shape[: len(batch)]
    x2 = x.reshape(int(np.prod(batch_shape)), -1)

    wperm = [rhs.index(l) for l in contracted + w_other]
    if wperm != list(range(len(rhs))):
        w = jnp.transpose(w, wperm)
    other_shape = w.shape[len(contracted) :]
    w2 = w.reshape(-1, int(np.prod(other_shape)))

    y2 = _make_switchback(_bwd_int8_enabled())(x2, w2.astype(x2.dtype))
    y = y2.reshape(*batch_shape, *other_shape)
    n_labels = "".join(batch + w_other)
    if n_labels != out:
        y = jnp.transpose(y, [n_labels.index(l) for l in out])
    return y


# --------------------------------------------------------------------------------------
# Tree-level transform: quantize the frozen matmul weights of a params tree
# --------------------------------------------------------------------------------------

# path-suffix regex -> (einsum eqn used at the call site, stacked over a leading
# scan depth axis). Gemma sites (gemma.py / lora.py apply paths) all live under
# params["layers"] with a depth axis.
_GEMMA_QUANT_SITES: tuple[tuple[re.Pattern, str, bool], ...] = (
    (re.compile(r"attn/qkv_einsum(_\d+)?/w$"), "BSD,3KDH->3BSKH", True),
    (re.compile(r"attn/q_einsum(_\d+)?/w$"), "BTD,NDH->BTNH", True),
    (re.compile(r"attn/kv_einsum(_\d+)?/w$"), "BSD,2KDH->2BSKH", True),
    (re.compile(r"attn/attn_vec_einsum(_\d+)?/w$"), "BTNH,NHD->BTD", True),
    (re.compile(r"mlp(_\d+)?/gating_einsum$"), "BTD,2DF->2BTF", True),
    (re.compile(r"mlp(_\d+)?/linear$"), "BTF,FD->BTD", True),
)

# SigLIP tower matmul sites (siglip.py apply paths). Only used by the inference
# quantizer: the tower *trains* in every reference fine-tune mode (freeze filter
# matches .*llm.* only), so the training path never converts these. k/v share the
# query eqn (labels are positional); the out-projection eqn is the transposed
# [B,T,N,H] form because the quantized rank-2 layout needs trailing contracted
# labels — siglip._mhsa feeds it a swapaxes view when the weight is quantized.
_SIGLIP_QUANT_SITES: tuple[tuple[re.Pattern, str, bool], ...] = (
    (re.compile(r"img/Transformer/encoderblock/MultiHeadDotProductAttention_0/(query|key|value)/kernel$"), "btd,dnh->bnth", True),
    (re.compile(r"img/Transformer/encoderblock/MultiHeadDotProductAttention_0/out/kernel$"), "btnh,nhd->btd", True),
    (re.compile(r"img/Transformer/encoderblock/MlpBlock_0/Dense_0/kernel$"), "btd,df->btf", True),
    (re.compile(r"img/Transformer/encoderblock/MlpBlock_0/Dense_1/kernel$"), "btf,fd->btd", True),
    (re.compile(r"img/head/kernel$"), "btd,dc->btc", False),
)


def _active_sites(default_spec: str = "all") -> tuple[tuple[re.Pattern, str, bool], ...]:
    """Gemma quant sites filtered by KAI0_INT8_SITES (comma-separated substrings of
    the site patterns; a leading ``-`` excludes, e.g. ``-gating`` keeps the FFN
    gate/up projections in bf16; ``all`` — the default — selects everything)."""
    spec = _knobs.get().int8_sites or default_spec
    if not spec or spec == "all":
        return _GEMMA_QUANT_SITES
    keys = [k.strip() for k in spec.split(",") if k.strip()]
    neg = [k[1:] for k in keys if k.startswith("-")]
    pos = [k for k in keys if not k.startswith("-")]
    # A token that selects/excludes nothing is a misconfiguration — fail loudly.
    for k in pos + neg:
        if not any(k in p.pattern for (p, _, _) in _GEMMA_QUANT_SITES):
            raise ValueError(
                f"KAI0_INT8_SITES token {k!r} matches no gemma quant site pattern"
            )
    return tuple(
        (p, e, st)
        for (p, e, st) in _GEMMA_QUANT_SITES
        if (not pos or any(k in p.pattern for k in pos)) and not any(k in p.pattern for k in neg)
    )


def _siglip_inference_sites() -> tuple[tuple[re.Pattern, str, bool], ...]:
    """SigLIP quant sites for inference, selected by ``KAI0_INT8_SIGLIP``
    (``0``/``1``/``all`` or a comma list of ``attn``, ``mlp``, ``head``).

    Default OFF — measured a net loss on v5e serving (batch 4, --int8: 80.9 ms
    gemma-only vs 81.7 all-sites vs 84.9 mlp+head only, PERF.md): at the tower's
    K=1152/4304 shapes the dynamic activation row-quant passes (plus the
    head-major transposes on the attention projections) cost more than the
    2x int8 MXU rate returns — the same economics that sank SwitchBack for the
    *training* tower. Kept env-gated for bigger vision variants/batches."""
    spec = _knobs.get().int8_siglip.strip().lower()
    if spec in ("0", "false", "off", "no", ""):
        return ()
    if spec in ("1", "true", "on", "yes", "all"):
        return _SIGLIP_QUANT_SITES
    words = {"attn": "Attention", "mlp": "Mlp", "head": "head/kernel"}
    want = []
    for token in (t.strip() for t in spec.split(",")):
        if not token:
            continue
        pattern_text = words.get(token, token)
        if not any(pattern_text in s[0].pattern for s in _SIGLIP_QUANT_SITES):
            raise ValueError(
                f"KAI0_INT8_SIGLIP token {token!r} selects no SigLIP quant site "
                f"(expected one of {sorted(words)}, 'all', or '0')"
            )
        want.append(pattern_text)
    return tuple(s for s in _SIGLIP_QUANT_SITES if any(w in s[0].pattern for w in want))


def quantize_frozen_tree(params: dict, trainable_mask: dict, sites=None) -> dict:
    """Replace frozen matmul weights with ``QuantArray`` leaves.

    Only leaves whose mask entry is False and whose path matches a known matmul call
    site are converted; everything else (norms, embedder, LoRA factors, any trainable
    tower such as SigLIP) is untouched. ``sites`` defaults to the gemma call sites
    (the trainable-LoRA fine-tune configuration).
    """
    from kai0_tpu.transforms import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    flat_mask = flatten_dict(trainable_mask)
    sites = _active_sites() if sites is None else sites
    out = {}
    for key, value in flat.items():
        if not flat_mask.get(key, True) and hasattr(value, "ndim"):
            for pattern, eqn, stacked in sites:
                if pattern.search(key):
                    out[key] = quantize_einsum_weight(value, eqn, stacked=stacked)
                    break
            else:
                out[key] = value
        else:
            out[key] = value
    return unflatten_dict(out)


def quantize_inference_tree(params: dict) -> dict:
    """Quantize the gemma matmul sites for inference (whole model frozen).

    Serving at batch 1 is HBM-bandwidth-bound: the int8 weights halve the bytes
    streamed per matmul, which is the dominant cost of the 968-token prefix pass
    and the 10-step denoise loop. Opt-in (``serve_policy.py --int8``) because it
    perturbs actions beyond the 1e-3 bf16 parity tolerance.

    ``KAI0_INT8_SIGLIP`` additionally quantizes the (inference-frozen) SigLIP
    tower — measured slower on v5e at serve shapes, so off by default (see
    ``_siglip_inference_sites``).
    """
    all_frozen = jax.tree.map(lambda _: False, params)
    sites = _active_sites() + _siglip_inference_sites()
    return quantize_frozen_tree(params, all_frozen, sites=sites)


def dequantize_tree(params: dict) -> dict:
    """Inverse of ``quantize_frozen_tree`` — restores the openpi params layout."""
    return jax.tree.map(lambda x: dequantize(x) if is_quant(x) else x, params, is_leaf=is_quant)


def has_quant(tree) -> bool:
    return any(is_quant(x) for x in jax.tree.leaves(tree, is_leaf=is_quant))
