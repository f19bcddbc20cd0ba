"""LoRA: low-rank adaptation for einsum weights and the Gemma gated FFN.

Functional counterpart of reference ``src/openpi/models/lora.py``: parameters live in
plain dicts next to the base weight (keys ``lora_a``/``lora_b``,
``gating_einsum_lora_{a,b}``, ``linear_lora_{a,b}`` — same names, so path-regex freeze
filters and checkpoint merging behave identically). The einsum equations for the
low-rank factors are derived from the base equation exactly as in the reference
(:67-85). Note the reference quirk kept for parity: the FFN LoRA path applies *no*
alpha/rank scaling (lora.py:144-148), only ``Einsum`` does (:59-63).
"""

from __future__ import annotations

import dataclasses
import math
import re

import jax
import jax.numpy as jnp

from kai0_tpu.ops import quant as _quant


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int
    alpha: float = 1.0
    # stddev of the normal init for lora params.
    init_stddev: float = 0.01
    # Rank-stabilized LoRA (https://arxiv.org/pdf/2312.03732).
    rslora: bool = False
    # Axes of the base weight to factorize (typically the last two).
    axes: tuple[int, int] = (-2, -1)
    # Einsum label for the rank axis; must not appear in the base equation.
    label: str = "L"

    @property
    def scaling_value(self) -> float:
        return self.alpha / math.sqrt(self.rank) if self.rslora else self.alpha / self.rank


def init_einsum(rng: jax.Array, shape: tuple[int, ...], init_fn, lora_config: LoRAConfig | None) -> dict:
    """Init an einsum weight dict: ``{"w": ...}`` plus LoRA factors when configured."""
    params = {"w": init_fn(rng, shape)}
    if config := lora_config:
        shape_a, shape_b = list(shape), list(shape)
        shape_a[config.axes[1]] = config.rank
        shape_b[config.axes[0]] = config.rank
        ra, rb = jax.random.split(jax.random.fold_in(rng, 1))
        params["lora_a"] = config.init_stddev * jax.random.normal(ra, shape_a)
        params["lora_b"] = config.init_stddev * jax.random.normal(rb, shape_b)
    return params


def apply_einsum(params: dict, eqn: str, x: jax.Array, lora_config: LoRAConfig | None) -> jax.Array:
    """``einsum(eqn, x, w)`` plus the scaled low-rank term when LoRA params are present.

    (Folding lora_a columns into the base matmul was tried and rejected: the weight
    concat materializes a full copy of each base matrix per step, +140 MB over the
    v5e HBM budget, for a ≤4% matmul-time win.)
    """
    dtype = x.dtype
    w = params["w"]
    if _quant.is_quant(w):
        # Frozen int8 base (KAI0_INT8 LoRA fast path) — one rank-2 MXU int8 matmul.
        # Negative result: folding the LoRA correction into the epilogue here (as
        # the FFN sites do via apply_quant_split) measured 10.16 vs 10.33
        # samples/s — the attention adds already overlap well, and the fused form
        # trades that for serialization. Keep the plain add (base dot first: even
        # the trace-order swap of lora-before-base costs ~0.6% in XLA's schedule).
        result = _quant.apply_quant_einsum(w, eqn, x)
    elif _quant.switchback_gemma_enabled("attn"):
        # Trainable base (full fine-tune): SwitchBack dynamic int8 — fwd + dgrad
        # int8, wgrad bf16 (quant.switchback_einsum; KAI0_INT8_SB_GEMMA=attn).
        result = _quant.switchback_einsum(eqn, x, w)
    else:
        result = jnp.einsum(eqn, x, w.astype(dtype))
    if (config := lora_config) and "lora_a" in params:
        eqn_a, eqn_b = _make_lora_eqns(eqn, config)
        lora = jnp.einsum(eqn_a, x, params["lora_a"].astype(dtype))
        lora = jnp.einsum(eqn_b, lora, params["lora_b"].astype(dtype))
        result = result + lora * config.scaling_value
    return result


def _make_lora_eqns(eqn: str, config: LoRAConfig) -> tuple[str, str]:
    if config.label in eqn:
        raise ValueError(f"{config.label} already in eqn: {eqn}")
    if not (m := re.match("(.*),(.*)->(.*)", eqn)):
        raise ValueError(f"Unsupported einsum eqn: {eqn}")
    lhs, rhs, out = m.groups()
    a_label, b_label = (rhs[x] for x in config.axes)
    label = config.label
    a_rhs = rhs.replace(b_label, label)
    a_out = out.replace(b_label, label)
    eqn_a = f"{lhs},{a_rhs}->{a_out}"
    b_rhs = rhs.replace(a_label, label)
    eqn_b = f"{a_out},{b_rhs}->{out}"
    return eqn_a, eqn_b


def init_ffn(rng: jax.Array, features: int, hidden_dim: int, lora_config: LoRAConfig | None) -> dict:
    """Init the Gemma gated-FFN weight dict (names match reference FeedForward params)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = {
        "gating_einsum": _lecun_normal_batched(k1, (2, features, hidden_dim), in_axis=-2, out_axis=-1),
        "linear": _lecun_normal(k2, (hidden_dim, features)),
    }
    if config := lora_config:
        params["gating_einsum_lora_a"] = config.init_stddev * jax.random.normal(k3, (2, features, config.rank))
        params["gating_einsum_lora_b"] = config.init_stddev * jax.random.normal(
            jax.random.fold_in(k3, 1), (2, config.rank, hidden_dim)
        )
        params["linear_lora_a"] = config.init_stddev * jax.random.normal(k4, (hidden_dim, config.rank))
        params["linear_lora_b"] = config.init_stddev * jax.random.normal(
            jax.random.fold_in(k4, 1), (config.rank, features)
        )
    return params


def apply_ffn(params: dict, x: jax.Array) -> jax.Array:
    """Gated-GELU FFN with optional (unscaled, reference-parity) LoRA terms."""

    def lora_term(x, lora_ab):
        if lora_ab is None:
            return 0
        a, b = lora_ab
        return jnp.dot(jnp.dot(x, a.astype(x.dtype)), b.astype(x.dtype))

    def dot(x, w, lora_ab):
        if _quant.is_quant(w):
            # The LoRA correction rides the int8 matmul's chunk epilogue (one less
            # full read+write of the [B,T,F] base output per site — see _make_qmm).
            add = None if lora_ab is None else lora_term(x, lora_ab)
            return _quant.apply_quant_einsum(w, "BTF,FD->BTD", x, add=add)
        if _quant.switchback_gemma_enabled("ffn"):
            # Trainable base (full fine-tune): dynamic int8 fwd + dgrad, bf16
            # wgrad (KAI0_INT8_SB_GEMMA=ffn). These K≥2048 gated-FFN dots are
            # where the SwitchBack economics flip positive — see quant.py.
            return _quant.switchback_einsum("BTD,DF->BTF", x, w) + lora_term(x, lora_ab)
        return jnp.dot(x, w.astype(x.dtype)) + lora_term(x, lora_ab)

    has_lora = "gating_einsum_lora_a" in params
    if (
        _quant.switchback_gemma_enabled("ffn")
        and not _quant.is_quant(params["gating_einsum"])
        and _quant.fused_ffn_enabled()
        and not has_lora
        and "linear_lora_a" not in params
    ):
        # Full fine-tune fast path: the whole FFN as one fused row-chunked
        # SwitchBack op with in-scan weight-grad accumulation (KAI0_INT8_FFN=split
        # reverts to the per-dot switchback path below for A/B).
        gating = params["gating_einsum"]
        return _quant.sb_fused_ffn(x, gating[0], gating[1], params["linear"])
    # The fused path threads one 6-factor LoRA tuple (gate, up, down); with
    # gate-only or down-only LoRA the split path below handles each projection
    # independently (fused would KeyError on the missing set — or worse,
    # silently drop a down-only adapter).
    mixed_lora = has_lora != ("linear_lora_a" in params)
    gating = params["gating_einsum"]
    if (
        _quant.is_quant(gating)
        and _quant.is_quant(params["linear"])
        and _quant.fused_ffn_enabled()
        and not mixed_lora
    ):
        # Whole FFN as one row-chunked op: nothing [B,T,mlp_dim]-sized hits HBM
        # except chunk-local fusion intermediates (see quant.apply_fused_ffn).
        lora_params = None
        if has_lora:
            lora_params = (
                params["gating_einsum_lora_a"][0],
                params["gating_einsum_lora_b"][0],
                params["gating_einsum_lora_a"][1],
                params["gating_einsum_lora_b"][1],
                params["linear_lora_a"],
                params["linear_lora_b"],
            )
        return _quant.apply_fused_ffn(gating, params["linear"], x, lora_params)
    if _quant.is_quant(gating):
        # Int8 gate+up as two column-sliced matmuls (one stacked QuantArray leaf);
        # the fused 2BTF einsum form OOMs 16 GB chips — see apply_quant_split.
        adds = None
        if has_lora:
            adds = tuple(
                lora_term(x, (params["gating_einsum_lora_a"][i], params["gating_einsum_lora_b"][i]))
                for i in range(2)
            )
        ff_gate, ff1 = _quant.apply_quant_split(gating, x, adds=adds)
    else:
        ff_gate = dot(
            x,
            gating[0],
            (params["gating_einsum_lora_a"][0], params["gating_einsum_lora_b"][0]) if has_lora else None,
        )
        ff1 = dot(
            x,
            gating[1],
            (params["gating_einsum_lora_a"][1], params["gating_einsum_lora_b"][1]) if has_lora else None,
        )
    gate_value = jax.nn.gelu(ff_gate)
    activations = gate_value * ff1
    return dot(
        activations,
        params["linear"],
        (params["linear_lora_a"], params["linear_lora_b"]) if "linear_lora_a" in params else None,
    )


# --------------------------------------------------------------------------------------
# Initializers (lecun_normal with explicit in/out axes, as flax nn.initializers)
# --------------------------------------------------------------------------------------


def _lecun_normal(rng, shape, in_axis=-2, out_axis=-1):
    import flax.linen as nn

    return nn.initializers.lecun_normal(in_axis=in_axis, out_axis=out_axis)(rng, shape)


def _lecun_normal_batched(rng, shape, in_axis=-2, out_axis=-1, batch_axis=(0,)):
    import flax.linen as nn

    return nn.initializers.lecun_normal(in_axis=in_axis, out_axis=out_axis, batch_axis=batch_axis)(rng, shape)
