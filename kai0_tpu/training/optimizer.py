"""Learning-rate schedules and optimizers.

Semantics parity with reference ``src/openpi/training/optimizer.py`` (the numbers
are the contract, not the code): linear-warmup cosine decay (1k warmup → peak
2.5e-5 → 2.5e-6 at 30k), warmup + inverse-sqrt decay, AdamW with b2=0.95,
weight_decay=1e-10 and a global-norm clip of 1.0, plain SGD.

Schedules here are written as explicit step functions (pure jnp) rather than
through optax's schedule builders; optimizers are assembled from optax
primitives (``scale_by_adam`` + ``add_decayed_weights`` + lr scaling), which is
the decomposed form of AdamW. ``tests/test_optimizer.py`` pins both against
their optax-builder equivalents.

Dataclass/field names are public config surface (referenced by
``training/config.py`` and the named robot configs) and must stay stable; all
call sites instantiate by keyword.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import optax


def _warmup(step, peak: float, steps: int):
    """The reference's warmup ramp: peak/(steps+1) at step 0, peak at ``steps``."""
    f = jnp.clip(step / max(steps, 1), 0.0, 1.0)
    lo = peak / (steps + 1)
    return lo + f * (peak - lo)


@runtime_checkable
class LRScheduleConfig(Protocol):
    def create(self) -> optax.Schedule: ...


@runtime_checkable
class OptimizerConfig(Protocol):
    def create(self, lr, weight_decay_mask=None) -> optax.GradientTransformation: ...


@dataclass(frozen=True)
class CosineDecaySchedule:
    """Linear warmup to ``peak_lr``, then half-cosine down to ``decay_lr``.

    The cosine phase spans steps [warmup_steps, decay_steps] and holds
    ``decay_lr`` afterwards.
    """

    peak_lr: float = 2.5e-5
    decay_lr: float = 2.5e-6
    warmup_steps: int = 1000
    decay_steps: int = 30000

    def create(self) -> optax.Schedule:
        span = max(self.decay_steps - self.warmup_steps, 1)
        lo, hi = self.decay_lr, self.peak_lr

        def at_step(step):
            t = jnp.clip((step - self.warmup_steps) / span, 0.0, 1.0)
            cos = lo + (hi - lo) * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(
                step < self.warmup_steps, _warmup(step, hi, self.warmup_steps), cos
            )

        return at_step


@dataclass(frozen=True)
class RsqrtDecaySchedule:
    """Linear warmup, then peak_lr · sqrt(timescale / (timescale + step − warmup))."""

    peak_lr: float = 5e-5
    warmup_steps: int = 1000
    timescale: float = 10000

    def create(self) -> optax.Schedule:
        def at_step(step):
            since = jnp.maximum(step - self.warmup_steps, 0)
            decay = self.peak_lr * jnp.sqrt(self.timescale / (self.timescale + since))
            return jnp.where(
                step < self.warmup_steps,
                _warmup(step, self.peak_lr, self.warmup_steps),
                decay,
            )

        return at_step


def _stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """f32 → bf16 stochastic rounding: add 16 uniform low bits, truncate.

    bf16's bit pattern is the top 16 bits of f32, so ``trunc(bits(x) + U[0,2^16))``
    rounds up with probability equal to the discarded fraction — an *unbiased*
    downcast (E[sr(x)] = x). NaN/±inf pass through untouched (their mantissa
    perturbation stays within the NaN space or is masked below).
    """
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    rounded = jax.lax.bitcast_convert_type(
        ((bits + rnd) >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    return jnp.where(jnp.isfinite(xf), rounded, xf.astype(jnp.bfloat16))


# --------------------------------------------------------------------------------------
# 8-bit blockwise moment storage (state_dtype="int8")
#
# Each moment leaf is stored as {"q": int8, "s": f32 per block of _QBLOCK} with a
# LOG-spaced magnitude code (7 bits of magnitude + sign for mu; 8 bits for the
# non-negative nu): code k represents s · RATIO^(k - K) — i.e. a blockwise dynamic
# range of RATIO^K ≈ 1e-7..1 relative to the block absmax, with ~±6% relative
# resolution at every magnitude. This is what makes 8-bit *moments* safe where
# linear int8 is not: a v element 10^-6 of its block's absmax still gets a faithful
# code instead of quantizing to zero (update ≈ m/eps blow-up). Rounding to the log
# grid is *stochastic* (unbiased in the log domain), so sub-resolution EMA
# increments survive in expectation exactly like the bf16-SR path below.
# Convergence A/B: tests/test_optimizer.py long-horizon harness + on-chip
# check (PERF.md round 4). HBM: 3.2B-param full fine-tune state drops from
# 25.6 GB (f32) / 12.8 GB (bf16) to 6.4 GB + 0.2% scales — what makes single-chip
# full-FT of π₀.₅ possible at all on a 16 GB v5e.
# --------------------------------------------------------------------------------------

_QBLOCK = 2048  # elements per scale block (bitsandbytes-style blockwise quantization)
_QDECADES = 7.0  # magnitude span below the block absmax, in decades


def _q8_encode(x: jax.Array, key: jax.Array, *, signed: bool) -> dict:
    """Blockwise log-domain 8-bit quantization with stochastic rounding.

    Returns ``{"q": int8|uint8 [x.shape], "s": f32 [n_blocks]}``. Code 0 encodes
    exact zero (and anything below the scale·10^-7 dynamic-range floor); code k>0
    encodes magnitude ``s · exp((k - levels) · step)``.
    """
    orig_shape = x.shape
    xf = x.astype(jnp.float32).reshape(-1)
    pad = (-xf.size) % _QBLOCK
    blocks = jnp.pad(xf, (0, pad)).reshape(-1, _QBLOCK)
    absx = jnp.abs(blocks)
    scale = jnp.max(absx, axis=1, keepdims=True)  # block absmax, f32
    levels = 127.0 if signed else 255.0
    step = _QDECADES * jnp.log(10.0) / levels  # log distance between adjacent codes
    safe_scale = jnp.where(scale > 0, scale, 1.0)
    logmag = jnp.log(jnp.maximum(absx / safe_scale, 1e-38)) / step + levels
    # Stochastic rounding in the log-index domain: floor(idx + U[0,1)) rounds up
    # with probability equal to the fractional part — unbiased in log space.
    u = jax.random.uniform(key, blocks.shape, jnp.float32)
    code = jnp.where(absx > 0, jnp.clip(jnp.floor(logmag + u), 0.0, levels), 0.0)
    q = (jnp.sign(blocks) * code).astype(jnp.int8) if signed else code.astype(jnp.uint8)
    return {"q": q.reshape(-1)[: xf.size].reshape(orig_shape), "s": scale[:, 0]}


def _q8_decode(packed: dict, dtype=jnp.float32) -> jax.Array:
    q, scale = packed["q"], packed["s"]
    signed = q.dtype == jnp.int8
    levels = 127.0 if signed else 255.0
    step = _QDECADES * jnp.log(10.0) / levels
    qf = q.astype(jnp.float32).reshape(-1)
    pad = (-qf.size) % _QBLOCK
    qb = jnp.pad(qf, (0, pad)).reshape(-1, _QBLOCK)
    mag = jnp.exp((jnp.abs(qb) - levels) * step) * scale[:, None]
    val = jnp.where(qb == 0, 0.0, jnp.sign(qb) * mag if signed else mag)
    return val.reshape(-1)[: q.size].reshape(q.shape).astype(dtype)


def _scale_by_adam_compact(b1: float, b2: float, eps: float, state_dtype) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with both moments *stored* in ``state_dtype``.

    The moment math runs in the gradient dtype (f32): each step upcasts m/v,
    applies the standard Adam recurrences + bias correction, and downcasts the
    new moments for storage. With bf16 storage the represented m/v carry 8
    mantissa bits, and bf16's f32-range exponent avoids the underflow cliff that
    makes *linear-int8* moment storage unsafe (tiny v quantized to 0 → update ~
    m/eps).

    The downcast differs per moment. ``mu`` rounds to nearest: with 1−b1 = 0.1
    its per-step increment is ~10% of its magnitude — far above bf16's half-ulp
    (~0.2%) — so nearest rounding loses nothing. ``nu`` CANNOT use nearest
    rounding: with 1−b2 = 0.05 (or the reference's long-horizon 1e-3 regimes)
    the increment (1−b2)·(g²−v) drops below half-ulp whenever g² is within a
    few × of v, the store discards it every step, and nu stagnates — silently
    acting like a much larger b2. It uses *stochastic* rounding instead
    (``_stochastic_round_bf16``): unbiased per step, so sub-ulp increments
    survive in expectation and the EMA tracks its f32 trajectory (long-horizon
    A/B in tests/test_optimizer.py). The SR key is derived from (count, leaf
    index) — fully deterministic given the step.

    Why it exists: the π₀.₅ LoRA fine-tune trains the full SigLIP tower
    (reference freeze filter only matches ``.*llm.*``), so a 16 GB v5e carries
    ~3.2 GB of f32 AdamW state for it. Storing moments in bf16 frees ~1.6 GB —
    enough to fit the remat save-sets that measured OOM-by-<700 MB (PERF.md
    "knob sweep") at batch 12.
    """
    if str(state_dtype) == "int8":
        return _scale_by_adam_q8(b1, b2, eps)
    state_dtype = jnp.dtype(state_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=state_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        mu = jax.tree.map(lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * (g * g), state.nu, updates)
        # Match optax.scale_by_adam: bias-correct with the *incremented* count.
        c1 = 1 - b1**count
        c2 = 1 - b2**count
        out = jax.tree.map(lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        mu_c = jax.tree.map(lambda x: x.astype(state_dtype), mu)
        if state_dtype == jnp.bfloat16:
            leaves, treedef = jax.tree.flatten(nu)
            # rbg: the TPU-native counter RNG — ~4× cheaper than threefry for the
            # ~400M nu elements of a full-size tower, and fold_in-deterministic.
            base = jax.random.fold_in(jax.random.key(0x6B61, impl="rbg"), count)
            nu_c = treedef.unflatten(
                [_stochastic_round_bf16(v, jax.random.fold_in(base, i)) for i, v in enumerate(leaves)]
            )
        else:
            nu_c = jax.tree.map(lambda x: x.astype(state_dtype), nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu_c, nu=nu_c)

    return optax.GradientTransformation(init, update)


def _q8_pallas_mode() -> tuple[str | None, "jax.sharding.Mesh | None", bool]:
    """Route the q8 AdamW phase (``KAI0_Q8_PALLAS``, default ON).

    Returns ``(mode, mesh, interpret)`` resolved at trace time:

    - ``("leaf", None, _)`` — per-leaf fused Pallas kernel
      (kai0_tpu/ops/pallas_q8.py): one VMEM pass per block tile instead of the
      XLA per-leaf fusion islands — 1.94× measured, and it removes the XLA
      path's f32 transient pool (PERF.md round 4).
    - ``("sharded", mesh, _)`` — the same kernel shard_mapped over the active
      mesh (``pallas_q8.adam_q8_leaf_sharded``): GSPMD cannot partition Mosaic
      custom calls (the round-3 flash-attention lesson), so on >1-device
      meshes the block grid is cut by XLA and sharded explicitly. This is what
      lets the bf16-param + int8-moment bundle compile for v5e-8 (the XLA q8
      phase AOT-OOMed it at 18.2-18.3 GiB batch-independently, PERF.md
      round 4).
    - ``(None, None, _)`` — XLA path: knob off, non-TPU backend (unless the
      test-only ``KAI0_Q8_PALLAS_INTERPRET=1`` forces interpret mode for the
      virtual CPU mesh), or — per ADVICE round 4 — a multi-device host traced
      with NO active mesh: rather than guess ambient state and bake an
      unpartitionable Mosaic call into a GSPMD program, fall back to the
      always-partitionable XLA path.
    """
    from kai0_tpu import knobs as _knobs
    from kai0_tpu.parallel import sharding as _sharding

    if not _knobs.get().q8_pallas:
        return None, None, False
    interpret = jax.default_backend() != "tpu"
    if interpret and not _knobs.env_flag("KAI0_Q8_PALLAS_INTERPRET"):
        return None, None, False
    mesh = _sharding.active_mesh()
    if mesh is None:
        if jax.device_count() == 1:
            return "leaf", None, interpret
        return None, None, False
    if mesh.size == 1:
        return "leaf", None, interpret
    return "sharded", mesh, interpret


def _scale_by_adam_q8(b1: float, b2: float, eps: float) -> optax.GradientTransformation:
    """``scale_by_adam`` with both moments stored 8-bit blockwise (see _q8_encode).

    Moment math runs in f32 per leaf: decode → EMA recurrence → bias-corrected
    update → re-encode with step-deterministic SR keys. ``mu`` is signed int8,
    ``nu`` unsigned uint8 (one extra magnitude bit).
    """

    def _zeros_packed(p, qdtype):
        n_blocks = -(-p.size // _QBLOCK)
        return {"q": jnp.zeros(p.shape, qdtype), "s": jnp.zeros((n_blocks,), jnp.float32)}

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: _zeros_packed(p, jnp.int8), params),
            nu=jax.tree.map(lambda p: _zeros_packed(p, jnp.uint8), params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        c1 = 1 - b1**count
        c2 = 1 - b2**count
        g_leaves, treedef = jax.tree.flatten(updates)
        mu_packed = treedef.flatten_up_to(state.mu)
        nu_packed = treedef.flatten_up_to(state.nu)
        base = jax.random.fold_in(jax.random.key(0x6B62, impl="rbg"), count)
        mode, mesh, interpret = _q8_pallas_mode()
        if mode is not None:
            from kai0_tpu.ops import pallas_q8

            assert pallas_q8._QBLOCK == _QBLOCK, "kernel/codec block size drift"

            # a·m/(sqrt(v)+b) ≡ (m/c1)/(sqrt(v/c2)+eps), folded outside the kernel.
            scalars = jnp.stack([jnp.sqrt(c2) / c1, eps * jnp.sqrt(c2)]).astype(jnp.float32)
            # Sharded routing only pays for leaves big enough that every shard
            # gets at least one full [_ROWS, _QBLOCK] tile; smaller leaves'
            # XLA-path transients are proportionally small.
            min_sharded = mesh.size * pallas_q8._ROWS * _QBLOCK if mode == "sharded" else 0
        out, new_mu, new_nu = [], [], []
        for i, (g, mp, vp) in enumerate(zip(g_leaves, mu_packed, nu_packed, strict=True)):
            use_leaf = mode == "leaf" and g.size >= _QBLOCK
            use_sharded = mode == "sharded" and g.size >= min_sharded
            if use_leaf or use_sharded:
                seed = jax.random.randint(
                    jax.random.fold_in(base, i), (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                )
                args = (g, mp["q"], mp["s"], vp["q"], vp["s"], scalars, seed)
                if use_sharded:
                    o, nm, nv = pallas_q8.adam_q8_leaf_sharded(
                        *args, b1=b1, b2=b2, mesh=mesh, interpret=interpret
                    )
                else:
                    o, nm, nv = pallas_q8.adam_q8_leaf(
                        *args, b1=b1, b2=b2, interpret=interpret
                    )
                out.append(o)
                new_mu.append(nm)
                new_nu.append(nv)
                continue
            gf = g.astype(jnp.float32)
            m = b1 * _q8_decode(mp) + (1 - b1) * gf
            v = b2 * _q8_decode(vp) + (1 - b2) * (gf * gf)
            out.append(((m / c1) / (jnp.sqrt(v / c2) + eps)).astype(g.dtype))
            new_mu.append(_q8_encode(m, jax.random.fold_in(base, 2 * i), signed=True))
            new_nu.append(_q8_encode(v, jax.random.fold_in(base, 2 * i + 1), signed=False))
        return treedef.unflatten(out), optax.ScaleByAdamState(
            count=count, mu=treedef.unflatten(new_mu), nu=treedef.unflatten(new_nu)
        )

    return optax.GradientTransformation(init, update)


def global_norm_f32(tree) -> jax.Array:
    """``optax.global_norm`` with f32 accumulation (sane for bf16 gradient trees)."""
    return jnp.sqrt(sum(jnp.sum(jnp.square(u.astype(jnp.float32))) for u in jax.tree.leaves(tree)))


def _clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` with the norm accumulated in f32.

    With bf16 gradients (the ``param_dtype="bfloat16"`` full-FT configuration —
    regardless of the optimizer state dtype) optax's ``global_norm`` would sum
    billions of bf16 squares in bf16 — 8 mantissa bits of accumulator — and
    return noise. Dtypes are static at trace time, so all-f32 gradient trees
    delegate to the optax transform itself (bit parity with the reference
    update rule); anything narrower takes the f32-accumulated path, whose cast
    fuses into the per-leaf reduction (no f32 copy is materialized).
    """
    inner = optax.clip_by_global_norm(max_norm)

    def update(updates, state, params=None):
        if all(u.dtype == jnp.float32 for u in jax.tree.leaves(updates)):
            return inner.update(updates, state, params)
        del params
        norm = global_norm_f32(updates)
        # optax semantics: scale only when norm exceeds max_norm.
        scale = jnp.where(norm < max_norm, 1.0, max_norm / norm)
        return jax.tree.map(lambda u: (u.astype(jnp.float32) * scale).astype(u.dtype), updates), state

    return optax.GradientTransformation(inner.init, update)


def apply_updates_sr(params, updates, key: jax.Array):
    """``optax.apply_updates`` that stochastically rounds into bf16 parameters.

    Plain ``p + u.astype(p.dtype)`` silently drops updates smaller than half a
    bf16 ulp (~0.4% of |p| — AdamW steps at lr 2.5e-5 are far below that), which
    stalls bf16-parameter training. Here bf16 leaves are updated in f32 and
    stochastically rounded back (unbiased, so sub-ulp steps accumulate in
    expectation — the standard recipe for bf16-weight training); non-bf16 leaves
    get the plain optax update.
    """
    leaves, treedef = jax.tree.flatten(params)
    up_leaves = treedef.flatten_up_to(updates)
    new = []
    for i, (p, u) in enumerate(zip(leaves, up_leaves, strict=True)):
        if u is None:
            new.append(p)
        elif p.dtype == jnp.bfloat16:
            new.append(_stochastic_round_bf16(p.astype(jnp.float32) + u.astype(jnp.float32), jax.random.fold_in(key, i)))
        else:
            new.append((p + u.astype(p.dtype)).astype(p.dtype))
    return treedef.unflatten(new)


@dataclass(frozen=True)
class AdamW:
    """Global-norm-clipped AdamW, built from optax primitives.

    ``weight_decay`` defaults to the reference's negligible-but-nonzero 1e-10
    (kept for exact update-rule parity; see its OOM-workaround note).

    ``state_dtype`` selects the *storage* dtype of the two Adam moments
    (``None`` → f32, exact reference parity; ``"bfloat16"`` halves optimizer
    HBM — see ``_scale_by_adam_compact`` for the numerics argument and the
    convergence A/B protocol in PERF.md; ``"int8"`` stores both moments 8-bit
    blockwise log-quantized — quarter HBM, the single-chip full-FT enabler, see
    ``_scale_by_adam_q8``).
    """

    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 1e-10
    clip_gradient_norm: float = 1.0
    state_dtype: str | None = None

    def create(self, lr, weight_decay_mask=None) -> optax.GradientTransformation:
        if self.state_dtype is None:
            scale_by_adam = optax.scale_by_adam(b1=self.b1, b2=self.b2, eps=self.eps)
        else:
            scale_by_adam = _scale_by_adam_compact(self.b1, self.b2, self.eps, self.state_dtype)
        # The f32-accumulating clip delegates to the optax transform for all-f32
        # gradient trees (bit parity with the reference update rule) and only
        # takes the f32-accumulation path for narrower gradients — the hazard
        # follows the GRADIENT dtype (param_dtype="bfloat16"), not state_dtype.
        clip = _clip_by_global_norm_f32(self.clip_gradient_norm)
        return optax.chain(
            clip,
            scale_by_adam,
            optax.add_decayed_weights(self.weight_decay, mask=weight_decay_mask),
            optax.scale_by_learning_rate(lr),  # includes the sign flip
        )


@dataclass(frozen=True)
class SGD:
    lr: float = 5e-5
    momentum: float = 0.9
    nesterov: bool = False

    def create(self, lr, weight_decay_mask=None) -> optax.GradientTransformation:
        if weight_decay_mask is not None:
            raise ValueError("SGD does not support a weight-decay mask")
        return optax.chain(
            optax.trace(decay=self.momentum, nesterov=self.nesterov),
            optax.scale_by_learning_rate(lr),
        )


@dataclass(frozen=True)
class ClipSGD:
    """Stateless update: f32 global-norm clip + lr scale — NO param-shaped state.

    ``optax.trace`` (plain SGD above) allocates a full momentum tree even at
    decay 0; this transform is what keeps the full-size single-chip full-FT
    step inside HBM (scripts/bench_full_finetune.py) and gives the on-chip
    convergence A/B an optimizer both precision arms can afford
    (scripts/check_convergence_onchip.py --full-ft).
    """

    clip_gradient_norm: float = 1.0

    def create(self, lr, weight_decay_mask=None) -> optax.GradientTransformation:
        del weight_decay_mask
        return optax.chain(
            _clip_by_global_norm_f32(self.clip_gradient_norm),
            optax.scale_by_learning_rate(lr),
        )


def create_optimizer(
    optimizer: OptimizerConfig, lr_schedule: LRScheduleConfig, weight_decay_mask=None
) -> optax.GradientTransformation:
    return optimizer.create(lr_schedule.create(), weight_decay_mask=weight_decay_mask)
