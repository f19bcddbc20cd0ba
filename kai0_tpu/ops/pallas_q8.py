"""Fused Pallas TPU kernel for the 8-bit blockwise AdamW update.

One VMEM pass per [rows, _QBLOCK] tile: decode both log-grid moments →
f32 Adam recurrence → bias-corrected update out → stochastic re-encode —
nothing f32-sized ever touches HBM. The XLA leaf-layout path
(``optimizer._scale_by_adam_q8``) measured 126 ms / 600 M params on v5e with
~40% of the time in standalone reshape/abs/select ops between fusion islands
(PERF.md round 4); the fused kernel's traffic floor is ~8.4 bytes/param
(int8 moments r+w, bf16 grad r, bf16 update w) ≈ 7 ms at HBM roof.

Numerics contract vs the XLA path:
- the update output is the same recurrence evaluated as ``a·m/(sqrt(v)+b)``
  with ``a = sqrt(c2)/c1``, ``b = eps·sqrt(c2)`` — algebraically identical to
  ``(m/c1)/(sqrt(v/c2)+eps)``, ulp-level fp differences only;
- re-encoded moments land on the same log grid with the same block scales;
  only the stochastic-rounding draw differs (Pallas per-core PRNG instead of
  jax.random) — same unbiased-in-log-space distribution, different stream.

Default ON for single-device TPU meshes (``KAI0_Q8_PALLAS=0`` reverts to the
XLA path); CPU backends, multi-device meshes (GSPMD cannot partition Mosaic
custom calls), and sub-block leaves fall back — see
``optimizer._q8_pallas_enabled``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QBLOCK = 2048  # must match optimizer._QBLOCK (asserted at the optimizer call site)
_ROWS = 128  # block-rows per kernel program (VMEM budget ~4.5 MB of operands)

_LEVELS_S = 127.0  # signed mu codes
_LEVELS_U = 255.0  # unsigned nu codes
_DECADES = 7.0


def _step(levels: float) -> float:
    return _DECADES * float(np.log(10.0)) / levels


def _decode(qf: jax.Array, scale: jax.Array, levels: float, *, signed: bool) -> jax.Array:
    mag = jnp.exp((jnp.abs(qf) - levels) * _step(levels)) * scale
    val = jnp.sign(qf) * mag if signed else mag
    return jnp.where(qf == 0, 0.0, val)


def _encode(x: jax.Array, u: jax.Array, levels: float, *, signed: bool):
    absx = jnp.abs(x)
    scale = jnp.max(absx, axis=1, keepdims=True)
    safe = jnp.where(scale > 0, scale, 1.0)
    logmag = jnp.log(jnp.maximum(absx / safe, 1e-38)) / _step(levels) + levels
    code = jnp.where(absx > 0, jnp.clip(jnp.floor(logmag + u), 0.0, levels), 0.0)
    if signed:
        q = (jnp.sign(x) * code).astype(jnp.int32).astype(jnp.int8)
    else:
        # f32 [0,255] → int32 → sign-extended low byte → int8 bits → uint8 view.
        i = code.astype(jnp.int32)
        q = pltpu.bitcast(((i << 24) >> 24).astype(jnp.int8), jnp.uint8)
    return q, scale


def _uniform(shape) -> jax.Array:
    # 24 bits of the per-core PRNG → U[0,1) with 2^-24 resolution. Mosaic has no
    # uint32→f32 cast either: view as int32 and mask to a non-negative 24-bit int.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (2.0**-24)


def _kernel(scal_ref, seed_ref, g_ref, mq_ref, ms_ref, vq_ref, vs_ref,
            out_ref, nmq_ref, nms_ref, nvq_ref, nvs_ref,
            *, b1: float, b2: float, deterministic: bool):
    if not deterministic:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    g = g_ref[:].astype(jnp.float32)
    # Mosaic has no uint8↔f32 casts: go through int32 (sign-extended) and mask
    # the unsigned codes back to [0, 255].
    mqf = mq_ref[:].astype(jnp.int32).astype(jnp.float32)
    vqf = (pltpu.bitcast(vq_ref[:], jnp.int8).astype(jnp.int32) & 0xFF).astype(jnp.float32)
    m = b1 * _decode(mqf, ms_ref[:], _LEVELS_S, signed=True) + (1 - b1) * g
    v = b2 * _decode(vqf, vs_ref[:], _LEVELS_U, signed=False) + (1 - b2) * (g * g)
    a, b = scal_ref[0], scal_ref[1]
    out_ref[:] = (a * m / (jnp.sqrt(v) + b)).astype(out_ref.dtype)

    def u(shape):
        # deterministic: round-to-nearest in the log-index domain (u = 0.5); used
        # in CPU interpret tests — prng_seed has no interpret lowering.
        return jnp.full(shape, 0.5, jnp.float32) if deterministic else _uniform(shape)

    nmq, nms = _encode(m, u(m.shape), _LEVELS_S, signed=True)
    nvq, nvs = _encode(v, u(v.shape), _LEVELS_U, signed=False)
    nmq_ref[:] = nmq
    nms_ref[:] = nms
    nvq_ref[:] = nvq
    nvs_ref[:] = nvs


@functools.partial(jax.jit, static_argnames=("b1", "b2", "interpret", "deterministic"))
def adam_q8_leaf(g, mq, ms, vq, vs, scalars, seed, *, b1: float, b2: float,
                 interpret: bool = False, deterministic: bool | None = None):
    """One parameter leaf: (grad, packed mu, packed nu, scalars, seed) → (update, new packs).

    ``g``/``mq``/``vq`` are leaf-shaped; ``ms``/``vs`` are the per-block scale
    vectors ``[n_blocks]``; ``scalars`` is f32[2] = [sqrt(c2)/c1, eps·sqrt(c2)]
    (the folded bias-correction factors); ``seed`` is int32[1].
    """
    shape, n = g.shape, g.size
    nb = -(-n // _QBLOCK)
    nbp = -(-nb // _ROWS) * _ROWS
    pad = nbp * _QBLOCK - n

    def blocks(x, fill=0):
        x = x.reshape(-1)
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nbp, _QBLOCK)

    gb = blocks(g)
    sc = jnp.pad(ms, (0, nbp - nb)).reshape(nbp, 1)
    vc = jnp.pad(vs, (0, nbp - nb)).reshape(nbp, 1)

    grid = (nbp // _ROWS,)
    row_spec = pl.BlockSpec((_ROWS, _QBLOCK), lambda i: (i, 0))
    scale_spec = pl.BlockSpec((_ROWS, 1), lambda i: (i, 0))
    if deterministic is None:
        deterministic = interpret
    out, nmq, nms, nvq, nvs = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, deterministic=deterministic),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [a, b] f32, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed int32, whole array
            row_spec, row_spec, scale_spec, row_spec, scale_spec,
        ],
        out_specs=[row_spec, row_spec, scale_spec, row_spec, scale_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nbp, _QBLOCK), g.dtype),
            jax.ShapeDtypeStruct((nbp, _QBLOCK), jnp.int8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.float32),
            jax.ShapeDtypeStruct((nbp, _QBLOCK), jnp.uint8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, seed, gb, blocks(mq), sc, blocks(vq), vc)

    def unleaf(x):
        return x.reshape(-1)[:n].reshape(shape)

    return (
        unleaf(out),
        {"q": unleaf(nmq), "s": nms.reshape(-1)[:nb]},
        {"q": unleaf(nvq), "s": nvs.reshape(-1)[:nb]},
    )
