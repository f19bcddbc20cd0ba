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

Default ON for TPU meshes (``KAI0_Q8_PALLAS=0`` reverts to the XLA path).
GSPMD cannot partition Mosaic custom calls, so on >1-device meshes the block
grid runs under ``shard_map`` (``adam_q8_leaf_sharded``): blocks are cut
globally by XLA (identical codec bytes to the single-device path), the padded
block-row axis is sharded over ALL mesh axes (the update is embarrassingly
parallel per block), and each device runs the kernel on its contiguous row
slice with a disjoint PRNG-stream offset. CPU backends and sub-block leaves
fall back — see ``optimizer._q8_pallas_mode``.
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


def _pallas_blocks(scalars, seed, gb, mqb, msb, vqb, vsb, *, b1: float, b2: float,
                   deterministic: bool, interpret: bool):
    """Run the kernel over already-blocked arrays.

    ``gb``/``mqb``/``vqb`` are ``[rows, _QBLOCK]`` with ``rows % _ROWS == 0``;
    ``msb``/``vsb`` are ``[rows, 1]`` block scales. This is the shard-local body
    of ``adam_q8_leaf_sharded`` and the core of ``adam_q8_leaf``.
    """
    rows = gb.shape[0]
    grid = (rows // _ROWS,)
    row_spec = pl.BlockSpec((_ROWS, _QBLOCK), lambda i: (i, 0))
    scale_spec = pl.BlockSpec((_ROWS, 1), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, deterministic=deterministic),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [a, b] f32, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed int32, whole array
            row_spec, row_spec, scale_spec, row_spec, scale_spec,
        ],
        out_specs=[row_spec, row_spec, scale_spec, row_spec, scale_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _QBLOCK), gb.dtype),
            jax.ShapeDtypeStruct((rows, _QBLOCK), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, _QBLOCK), jnp.uint8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, seed, gb, mqb, msb, vqb, vsb)


def _block_layout(g, mq, ms, vq, vs, *, row_align: int):
    """Flatten + pad a leaf and its packed moments to the kernel's block layout.

    Returns ``(gb, mqb, msb, vqb, vsb, nb, nbp)`` with ``nbp`` (padded block
    rows) a multiple of ``row_align``. Padding only ever ADDS zero blocks past
    the leaf's ``nb`` real blocks — the stored codec bytes (``[:nb]`` scales,
    leaf-shaped q) are invariant to ``row_align``, which is what keeps the
    sharded path checkpoint-compatible with the single-device one.
    """
    n = g.size
    nb = -(-n // _QBLOCK)
    nbp = -(-nb // row_align) * row_align
    pad = nbp * _QBLOCK - n

    def blocks(x):
        x = x.reshape(-1)
        return jnp.pad(x, (0, pad)).reshape(nbp, _QBLOCK)

    sc = jnp.pad(ms, (0, nbp - nb)).reshape(nbp, 1)
    vc = jnp.pad(vs, (0, nbp - nb)).reshape(nbp, 1)
    return blocks(g), blocks(mq), sc, blocks(vq), vc, nb, nbp


def _unleaf_outputs(out, nmq, nms, nvq, nvs, *, shape, n, nb):
    def unleaf(x):
        return x.reshape(-1)[:n].reshape(shape)

    return (
        unleaf(out),
        {"q": unleaf(nmq), "s": nms.reshape(-1)[:nb]},
        {"q": unleaf(nvq), "s": nvs.reshape(-1)[:nb]},
    )


@functools.partial(jax.jit, static_argnames=("b1", "b2", "interpret", "deterministic"))
def adam_q8_leaf(g, mq, ms, vq, vs, scalars, seed, *, b1: float, b2: float,
                 interpret: bool = False, deterministic: bool | None = None):
    """One parameter leaf: (grad, packed mu, packed nu, scalars, seed) → (update, new packs).

    ``g``/``mq``/``vq`` are leaf-shaped; ``ms``/``vs`` are the per-block scale
    vectors ``[n_blocks]``; ``scalars`` is f32[2] = [sqrt(c2)/c1, eps·sqrt(c2)]
    (the folded bias-correction factors); ``seed`` is int32[1].
    """
    if deterministic is None:
        deterministic = interpret
    gb, mqb, msb, vqb, vsb, nb, _ = _block_layout(g, mq, ms, vq, vs, row_align=_ROWS)
    out, nmq, nms, nvq, nvs = _pallas_blocks(
        scalars, seed, gb, mqb, msb, vqb, vsb,
        b1=b1, b2=b2, deterministic=deterministic, interpret=interpret,
    )
    return _unleaf_outputs(out, nmq, nms, nvq, nvs, shape=g.shape, n=g.size, nb=nb)


def adam_q8_leaf_sharded(g, mq, ms, vq, vs, scalars, seed, *, b1: float, b2: float,
                         mesh, interpret: bool = False, deterministic: bool | None = None):
    """``adam_q8_leaf`` with the block grid shard_mapped over ``mesh``.

    GSPMD cannot partition Mosaic custom calls, and the codec's 2048-element
    blocks are defined over the leaf's GLOBAL row-major flattening — no
    leaf-shaped axis sharding is block-aligned in general (e.g. gemma's stacked
    ``[18, 2, 2048, 16384]`` FFN weights shard their largest axis). So the
    block cut happens OUTSIDE the kernel, in XLA: flatten + pad to block rows
    divisible by ``_ROWS · mesh.size`` (GSPMD relayouts the operands — cheap
    int8/bf16 traffic vs the f32 transient pool it buys off, PERF.md round 4),
    then shard_map the kernel over the contiguous row slices, every mesh axis
    flattened together (the update is block-parallel — there is no reason to
    leave the ``batch``/``tp`` axes idle). Each shard offsets the PRNG seed by
    its linearized mesh index × local grid size, so SR streams are disjoint
    exactly like the single-device kernel's per-program streams. Codec bytes
    (scales, q layout) are IDENTICAL to the single-device path — pinned by
    tests/test_optimizer.py::test_pallas_q8_sharded_matches_leaf.

    Must be called under a jit tracing with ``mesh`` (the train step); called
    eagerly it would materialize the global block layout on one device.
    """
    if mesh.size == 1:
        return adam_q8_leaf(g, mq, ms, vq, vs, scalars, seed, b1=b1, b2=b2,
                            interpret=interpret, deterministic=deterministic)
    if deterministic is None:
        deterministic = interpret
    k = mesh.size
    gb, mqb, msb, vqb, vsb, nb, nbp = _block_layout(g, mq, ms, vq, vs, row_align=_ROWS * k)
    local_grid = nbp // k // _ROWS
    axes = tuple(mesh.axis_names)

    def local_fn(scalars, seed, gb, mqb, msb, vqb, vsb):
        idx = jnp.int32(0)
        for a in axes:  # linearized mesh index, row-major over axis_names
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        return _pallas_blocks(
            scalars, seed + idx * local_grid, gb, mqb, msb, vqb, vsb,
            b1=b1, b2=b2, deterministic=deterministic, interpret=interpret,
        )

    from jax.sharding import PartitionSpec as P

    row = P(axes, None)
    rep = P()
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    kwargs = dict(
        mesh=mesh,
        in_specs=(rep, rep, row, row, row, row, row),
        out_specs=(row, row, row, row, row),
    )
    try:
        # check_vma cannot infer varying-axes for Pallas custom calls (same
        # constraint as ops/attention.py:_shard_map_batch).
        mapped = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # older jax: the flag was named check_rep
        mapped = shard_map(local_fn, check_rep=False, **kwargs)
    out, nmq, nms, nvq, nvs = mapped(scalars, seed, gb, mqb, msb, vqb, vsb)
    return _unleaf_outputs(out, nmq, nms, nvq, nvs, shape=g.shape, n=g.size, nb=nb)
