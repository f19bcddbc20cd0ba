"""One-pass Pallas row quantization for the dynamic int8 activation path.

``quant._row_quant`` lowers to two XLA passes over the tensor: an ``abs`` +
row-max reduce fusion, then a ``round``/``convert`` fusion that re-reads the
input — at the π₀.₅ FFN sites that is three full HBM sweeps of a
[rows, mlp_dim] activation per quantize (read for amax, read for round, int8
write), repeated in the forward, the backward's gate/up re-derivation, and the
dgrad row-quantizes. xprof on the batch-14 train step attributes ~150 ms/step
to these fusions (``abs_reduce_fusion`` + ``round-nearest-even_convert``,
PERF.md round 2).

This kernel does the whole quantize in one HBM sweep: a row block lives in
VMEM, the amax / scale / round all happen on-chip, and HBM sees one read of x
plus the int8 + scale writes. Rows are independent, so the grid only tiles the
row dimension and boundary blocks are safe (out-of-bounds rows produce garbage
scales that are masked on store).

Numerics use the same op order and dtypes as ``quant._row_quant`` (amax in the
input dtype, ``max(amax, 1e-30)/127`` in f32, ``round(x_f32 / s)`` to int8) and
are bit-identical in interpret mode (tests/test_quant.py, which executes via
XLA). Under real Mosaic lowering the f32 divide/round chain may differ by 1 ulp
and flip individual int8 codes — treat parity as "within one int8 step" on
hardware, and run ``scripts/dev/check_rowquant_parity.py`` on-chip before
relying on ``KAI0_INT8_ROWQUANT=pallas`` for convergence-parity runs.

Dispatch lives in ``quant._row_quant`` (``KAI0_INT8_ROWQUANT=pallas`` on a TPU
backend); CPU tests run this in interpret mode (tests/test_quant.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xq_ref, sx_ref):
    x = x_ref[...]
    # amax in the input dtype (bit-identical to the XLA path), scale math in f32.
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(amax, 1e-30) / 127.0
    xq_ref[...] = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    sx_ref[...] = s


def _pick_bm(m: int, k: int, itemsize: int) -> int:
    """Largest row block ≤512 keeping the input block ≤4 MB (the f32 divide
    temporary doubles/quadruples it in VMEM; the 64 MB scoped limit below leaves
    room for double-buffered windows)."""
    budget = 4 * 2**20
    bm = max(32, min(512, budget // max(1, k * itemsize) // 32 * 32))
    return min(bm, max(32, m))


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_quant(x: jax.Array, *, interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row dynamic quantization of a 2-D array: x ≈ xq * sx.

    Returns ``(xq int8 [M, K], sx f32 [M, 1])``, matching ``quant._row_quant``
    bit for bit.
    """
    m, k = x.shape
    bm = _pick_bm(m, k, x.dtype.itemsize)
    grid = (pl.cdiv(m, bm),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=64 * 2**20
        ),
        interpret=interpret,
    )(x)
