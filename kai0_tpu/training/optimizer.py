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


@dataclass(frozen=True)
class AdamW:
    """Global-norm-clipped AdamW, built from optax primitives.

    ``weight_decay`` defaults to the reference's negligible-but-nonzero 1e-10
    (kept for exact update-rule parity; see its OOM-workaround note).

    ``state_dtype`` selects the *storage* dtype of the two Adam moments
    (``None`` → f32, exact reference parity; ``"bfloat16"`` halves optimizer
    HBM — see ``_scale_by_adam_compact`` for the numerics argument and the
    convergence A/B protocol in PERF.md).
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
        return optax.chain(
            optax.clip_by_global_norm(self.clip_gradient_norm),
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


def create_optimizer(
    optimizer: OptimizerConfig, lr_schedule: LRScheduleConfig, weight_decay_mask=None
) -> optax.GradientTransformation:
    return optimizer.create(lr_schedule.create(), weight_decay_mask=weight_decay_mask)
